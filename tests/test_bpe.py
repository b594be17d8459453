"""BPE training semantics on a hand-computable vocabulary."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.text.bpe import bpe_train


def _wf(spark, items):
    rows = [(" " + " ".join(word) + " ", freq) for word, freq in items]
    return spark.createDataFrame(rows, "w string, freq long")


def test_bpe_learns_hand_computed_merges(spark):
    """hello*10 + hell*5 + help*3: the greedy merge sequence is
    (e,l) -> (h,el) -> (hel,l) -> (hell,o) -> (hel,p), with the first
    round's 18-18 tie between (h,e) and (e,l) broken lexicographically."""
    wf = _wf(spark, [("hello", 10), ("hell", 5), ("help", 3)])
    got = [
        (r["step"], r["sym_a"], r["sym_b"], r["n_occurrences"])
        for r in bpe_train(wf, 5).orderBy("step").collect()
    ]
    assert got == [
        (1, "e", "l", 18),
        (2, "h", "el", 18),
        (3, "hel", "l", 15),
        (4, "hell", "o", 10),
        (5, "hel", "p", 3),
    ]


def test_bpe_same_symbol_chain(spark):
    """'aaaa' (run of 4): round 1 counts 3 overlapping (a,a) pairs and
    the two-pass rewrite merges greedily left-to-right: 'aa aa'."""
    wf = _wf(spark, [("aaaa", 2)])
    got = [
        (r["step"], r["sym_a"], r["sym_b"], r["n_occurrences"])
        for r in bpe_train(wf, 2).orderBy("step").collect()
    ]
    assert got[0] == (1, "a", "a", 6)
    assert got[1] == (2, "aa", "aa", 2)
