"""r10 row-local repetition metrics: the explode-free form must compute
the exact integers of the grouped form it replaced (oracle parity covers
the corpus; these pin the degenerate shapes a random corpus may miss).
"""

from __future__ import annotations

import pytest

from data_ingestion_system_spark.text.repetition import repetition_metrics


@pytest.fixture(scope="module")
def metrics(spark):
    docs = spark.createDataFrame(
        [
            (1, "src", ""),                      # split('') = [''] -> 1 token
            (2, "src", "a"),                     # 1 token, no grams
            (3, "src", "a b"),                   # 2 tokens, 1 bigram, no trigram
            (4, "src", "x x x x"),               # all-identical: every gram repeats
            (5, "src", "a b a b a"),             # 'a b'x2 + 'b a'x2 bigram tie
            (6, "src", "p q r s t u"),           # all distinct
        ],
        "doc_id long, source string, text string",
    )
    return {
        r.doc_id: r for r in repetition_metrics(docs).collect()
    }


def test_single_token_docs_have_null_gram_fracs(metrics):
    for d in (1, 2):
        r = metrics[d]
        assert r.n_words == 1
        assert r.top_word_frac == 1.0
        assert r.top_bigram_frac is None and r.dup_trigram_frac is None


def test_two_tokens_form_one_bigram_no_trigram(metrics):
    r = metrics[3]
    assert (r.n_words, r.top_word_frac, r.top_bigram_frac) == (2, 0.5, 1.0)
    assert r.dup_trigram_frac is None


def test_all_identical_tokens_max_out_every_metric(metrics):
    r = metrics[4]
    # 4 tokens of 'x'; 3 bigrams all 'x x'; 2 trigrams both 'x x x'
    assert (r.n_words, r.top_word_frac, r.top_bigram_frac) == (4, 1.0, 1.0)
    assert r.dup_trigram_frac == 0.5  # 2 occurrences - 1 distinct = 1 of 2


def test_tied_runs_report_the_max_multiplicity(metrics):
    r = metrics[5]
    # words: a=3 of 5; bigrams: 'a b'x2, 'b a'x2 of 4; trigrams:
    # 'a b a' x2 + 'b a b' -> 1 repeat of 3
    assert r.n_words == 5
    assert r.top_word_frac == 3 / 5
    assert r.top_bigram_frac == 2 / 4
    assert r.dup_trigram_frac == 1 / 3


def test_all_distinct_tokens_floor_every_metric(metrics):
    r = metrics[6]
    assert r.top_word_frac == 1 / 6
    assert r.top_bigram_frac == 1 / 5
    assert r.dup_trigram_frac == 0.0
