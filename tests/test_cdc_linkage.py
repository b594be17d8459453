"""Semantic tests for CDC apply and fuzzy linkage — properties the
SQL oracle can't express: arrival-order invariance for CDC, and
known-pair recall / blocking behavior for edit-distance linkage."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import assert_df_matches_oracle


def _collapse(feed):
    """The cdc_apply_state collapse, applied to an arbitrary feed df."""
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("key", "seq", "payload")
    )


def test_cdc_collapse_is_arrival_order_invariant(spark):
    """Same feed in three arrival orders (sorted, reversed, hash-shuffled
    across partitions) must collapse to the identical state — ordering is
    by the source sequence number, never arrival."""
    rows = [
        (1, 10, "U", "a"),
        (1, 30, "U", "c"),  # winner for key 1
        (1, 20, "U", "b"),  # late-arriving middle change
        (2, 5, "U", "x"),
        (2, 9, "D", None),  # key 2 ends tombstoned
        (3, 7, "D", None),
        (3, 8, "U", "y"),  # un-delete after tombstone: U wins by seq
    ]
    base = spark.createDataFrame(rows, "key int, seq int, op string, payload string")
    expected = {(1, 30, "c"), (3, 8, "y")}
    for variant in (
        base.orderBy("seq"),
        base.orderBy(F.desc("seq")),
        base.repartition(7, "payload"),
    ):
        got = {tuple(r) for r in _collapse(variant).collect()}
        assert got == expected, got


def test_cdc_collapse_is_replay_idempotent(spark):
    """Replaying the feed (union with itself) yields the same state:
    duplicated records tie on seq but carry identical payloads, so the
    winner row's content is unchanged."""
    rows = [(1, 10, "U", "a"), (1, 30, "U", "c"), (2, 9, "D", None)]
    base = spark.createDataFrame(rows, "key int, seq int, op string, payload string")
    once = {tuple(r) for r in _collapse(base).collect()}
    twice = {tuple(r) for r in _collapse(base.unionAll(base)).collect()}
    assert once == twice == {(1, 30, "c")}


def test_linkage_catches_typo_pair_within_block(spark, sf_dir, monkeypatch):
    """Two docs whose normalized 80-char keys differ by one character in
    the tail share the 8-char block prefix and must link; a doc whose
    FIRST characters differ falls in another block and must not (the
    documented single-pass blocking recall trade-off)."""
    from data_ingestion_system_spark.operators import linkage
    from data_ingestion_system_spark import tables

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s", 64),
            (2, "the quick brown fox jumps over the lazy dot near the river bank", "en", "s", 64),
            (3, "a completely different opening that shares no prefix at all here", "en", "s", 64),
            # same block as 1/2 but beyond edit distance 8
            (4, "the quicksand swallowed every letter of this very different text entirely", "en", "s", 74),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        linkage, "load_table", lambda _spark, _sf, name: docs
    )
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in linkage.fuzzy_linkage_pairs(spark, sf_dir).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1
    assert all(3 not in pair for pair in got), got
    assert (1, 4) not in got and (2, 4) not in got


def test_linkage_block_cap_drops_degenerate_block(spark, sf_dir, monkeypatch):
    """A block larger than BLOCK_CAP generates NO pairs (the skew guard),
    and the profile counts the dropped records instead of hiding them."""
    from data_ingestion_system_spark.operators import linkage

    n = linkage.BLOCK_CAP + 5
    docs = spark.createDataFrame(
        [(i, "identical prefix boilerplate row", "en", "s", 32) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(linkage, "load_table", lambda _spark, _sf, name: docs)
    assert linkage.fuzzy_linkage_pairs(spark, sf_dir).count() == 0
    prof = linkage.linkage_block_profile(spark, sf_dir).collect()[0]
    assert prof.capped_blocks == 1
    assert prof.capped_records == n
    assert prof.candidate_pairs == 0


_feed_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),      # key
        st.integers(min_value=1, max_value=40),     # seq
        st.sampled_from(["U", "D"]),                # op
        st.text(alphabet="abc", min_size=0, max_size=3),  # payload
    ),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_feed_rows)
def test_cdc_collapse_matches_python_replay(spark, rows):
    """∀ feeds: the windowed collapse equals a pure-Python replay that
    sorts by seq and keeps the last op per key (ties on seq broken the
    same way row_number breaks them: by the later-sorted duplicate, so
    we drop exact (key, seq) duplicates first to keep the property
    well-defined — duplicated (key, seq) with different payloads is a
    source-corruption case the audit query counts, not a collapse
    guarantee)."""
    seen = {}
    for k, s, op, p in rows:
        seen[(k, s)] = (k, s, op, p)  # last writer wins for dup (key, seq)
    rows = list(seen.values())

    state = {}
    for k, s, op, p in sorted(rows, key=lambda r: r[1]):
        state[k] = (s, op, p)
    expected = {
        (k, s, p) for k, (s, op, p) in state.items() if op != "D"
    }

    if not rows:
        return
    feed = spark.createDataFrame(
        rows, "key int, seq int, op string, payload string"
    )
    got = {tuple(r) for r in _collapse(feed).collect()}
    assert got == expected, (got, expected)


@pytest.mark.parametrize("cap,max_dist", [(4, 2), (16, 5), (256, 12)])
def test_linkage_param_family_matches_oracle(spark, duck, sf_dir, cap, max_dist, monkeypatch):
    """The linkage query is a parameter FAMILY (block cap, distance
    threshold); the registered query pins one point. Sweep other points
    and regenerate the SQL for each — ∀ params, Spark(params) ≡
    SQL(params), the same differential property the dynamic-filter
    family gets in test_property_fuzz."""
    from data_ingestion_system_spark.operators import linkage

    monkeypatch.setattr(linkage, "BLOCK_CAP", cap)
    monkeypatch.setattr(linkage, "MAX_DIST", max_dist)
    df = linkage.fuzzy_linkage_pairs(spark, sf_dir)
    sql = f"""
WITH keyed AS ({linkage._KEYED_SQL}),
blocks AS (
  SELECT lang, block_key FROM keyed
  GROUP BY lang, block_key
  HAVING COUNT(*) BETWEEN 2 AND {cap}
),
pairs AS (
  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
         levenshtein(a.link_key, b.link_key) AS edit_dist
  FROM keyed a
  JOIN keyed b ON a.lang = b.lang AND a.block_key = b.block_key
              AND a.doc_id < b.doc_id
  JOIN blocks bl ON bl.lang = a.lang AND bl.block_key = a.block_key
)
SELECT lang, CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(edit_dist AS BIGINT) AS edit_dist
FROM pairs WHERE edit_dist <= {max_dist}
ORDER BY edit_dist, doc_a, doc_b
LIMIT 200
"""
    assert_df_matches_oracle(df, duck, sql)
