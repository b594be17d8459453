"""Streaming CDC mirror: sequence-guarded merge semantics across
micro-batches — late cross-batch records skipped, replay a no-op,
mirror equals the batch collapse of the full feed."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.streaming.cdc import (
    FEED_SCHEMA,
    cdc_apply_batch,
    run_cdc_stream,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, FEED_SCHEMA)


def _state(spark, state_dir):
    return {
        tuple(r) for r in spark.read.parquet(state_dir).collect()
    }


def test_batch_apply_guards_and_collapses(spark, tmp_path):
    state = str(tmp_path / "state")

    # bootstrap batch: key 1 arrives twice (seq 10 superseded by 12) —
    # the collapsed-away row counts as skipped_stale, so
    # fetched(3) == upserted(2) + deleted(0) + skipped_stale(1)
    r1 = cdc_apply_batch(
        spark,
        _df(spark, [(1, 10, "U", "a", 1.0), (1, 12, "U", "b", 2.0), (2, 5, "U", "x", 3.0)]),
        state,
    )
    assert r1 == {"upserted": 2, "deleted": 0, "skipped_stale": 1}
    assert _state(spark, state) == {(1, 12, "b", 2.0), (2, 5, "x", 3.0)}

    # batch 2: stale update for key 1 (seq 11 < applied 12) skipped;
    # delete for key 2; new key 3; key 3 also carries a within-batch
    # duplicate (seq 0 loses to seq 1) that must count as skipped
    r2 = cdc_apply_batch(
        spark,
        _df(
            spark,
            [
                (1, 11, "U", "zz", 9.0),
                (2, 6, "D", None, None),
                (3, 0, "U", "old", 0.0),
                (3, 1, "U", "c", 4.0),
            ],
        ),
        state,
    )
    assert r2 == {"upserted": 1, "deleted": 1, "skipped_stale": 2}
    assert _state(spark, state) == {(1, 12, "b", 2.0), (3, 1, "c", 4.0)}

    # replay batch 2 verbatim: everything stale or delete-of-absent;
    # the delete re-applies harmlessly (key 2 already gone), the rest skip
    r3 = cdc_apply_batch(
        spark,
        _df(spark, [(1, 11, "U", "zz", 9.0), (2, 6, "D", None, None), (3, 1, "U", "c", 4.0)]),
        state,
    )
    assert r3["upserted"] == 0
    assert r3["skipped_stale"] == 2  # keys 1 and 3; delete of absent key 2 passes through
    assert r3["deleted"] == 1  # delete-of-absent counts as applied
    assert _state(spark, state) == {(1, 12, "b", 2.0), (3, 1, "c", 4.0)}


def test_bootstrap_delete_winner_counts_as_deleted(spark, tmp_path):
    """First-batch 'D' winners are deletes-of-absent — counted as
    deleted (matching the steady-state path), never skipped_stale."""
    state = str(tmp_path / "state")
    r = cdc_apply_batch(
        spark,
        _df(spark, [(1, 5, "U", "a", 1.0), (2, 7, "D", None, None)]),
        state,
    )
    assert r == {"upserted": 1, "deleted": 1, "skipped_stale": 0}
    assert _state(spark, state) == {(1, 5, "a", 1.0)}


def test_stream_mirror_equals_batch_collapse(spark, tmp_path):
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    audit = str(tmp_path / "audit")
    os.makedirs(feed)

    b1 = [(1, 10, "U", "a", 1.0), (2, 20, "U", "b", 2.0), (3, 5, "U", "c", 3.0)]
    b2 = [(1, 9, "U", "stale", 0.0), (2, 21, "D", None, None), (4, 1, "U", "d", 4.0)]
    _df(spark, b1).write.mode("append").parquet(feed)
    q = run_cdc_stream(spark, feed, state, ckpt, audit_dir=audit)
    q.awaitTermination(120)
    _df(spark, b2).write.mode("append").parquet(feed)
    q2 = run_cdc_stream(spark, feed, state, ckpt, audit_dir=audit)
    q2.awaitTermination(120)

    # expected: batch collapse of the full feed with seq ordering
    full = _df(spark, b1 + b2)
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    expected = {
        tuple(r)
        for r in full.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("key", F.col("seq").alias("last_seq"), "payload_type", "payload_value")
        .collect()
    }
    assert _state(spark, state) == expected

    # audit invariant: fetched == upserted + deleted + skipped_stale
    # (delete-of-absent keys count as applied deletes)
    for r in spark.read.parquet(audit).collect():
        assert r.fetched == r.upserted + r.deleted + r.skipped_stale, r
