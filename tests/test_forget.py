"""Right-to-be-forgotten: physical erasure beats time travel, and
suppression beats re-ingestion."""

from __future__ import annotations

import os

from data_ingestion_system_spark.streaming.forget import (
    forget_keys,
    suppressed,
    tombstones_dir,
)
from data_ingestion_system_spark.streaming.ingest import (
    IngestPaths,
    dedup_insert_batch,
)
from data_ingestion_system_spark.streaming.timetravel import change_feed, store_as_of

SCHEMA = "event_id long, payload string"


def _paths(tmp_path) -> IngestPaths:
    return IngestPaths(
        source_dir=str(tmp_path / "src"),
        target_dir=str(tmp_path / "target"),
        audit_dir=str(tmp_path / "audit"),
        provenance_dir=str(tmp_path / "prov"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def _ingest(spark, paths):
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    b1 = spark.createDataFrame([(3, "c"), (4, "d")], SCHEMA)
    dedup_insert_batch(spark, b0, 0, "event_id", paths)
    dedup_insert_batch(spark, b1, 1, "event_id", paths)


def test_erasure_wins_over_time_travel(spark, tmp_path):
    paths = _paths(tmp_path)
    _ingest(spark, paths)

    stats = forget_keys(spark, paths, "event_id", [2])
    assert stats == {"target_rows_removed": 1, "provenance_rows_removed": 1}

    # current store: gone
    assert sorted(
        r.event_id for r in spark.read.parquet(paths.target_dir).collect()
    ) == [1, 3, 4]
    # HISTORICAL reads: gone from every snapshot, including ones where
    # it existed — erasure must not be resurrectable
    assert sorted(r.event_id for r in store_as_of(spark, paths, 0).collect()) == [1]
    assert sorted(r.event_id for r in store_as_of(spark, paths, 1).collect()) == [1, 3, 4]
    assert 2 not in {r.event_id for r in change_feed(spark, paths, -1, 1).collect()}
    # the only trace is the suppression list
    assert os.path.isdir(tombstones_dir(paths))


def test_suppression_blocks_reingestion(spark, tmp_path):
    paths = _paths(tmp_path)
    _ingest(spark, paths)
    forget_keys(spark, paths, "event_id", [2])

    # the source re-delivers key 2: the suppression gate drops it before
    # the insert path ever sees it
    redelivery = spark.createDataFrame([(2, "b-again"), (5, "e")], SCHEMA)
    gated = suppressed(spark, paths, redelivery, "event_id")
    assert sorted(r.event_id for r in gated.collect()) == [5]
    dedup_insert_batch(spark, gated, 2, "event_id", paths)
    assert sorted(
        r.event_id for r in spark.read.parquet(paths.target_dir).collect()
    ) == [1, 3, 4, 5]

    # an untouched pipeline (no gate) would re-insert — the gate is the
    # documented enforcement point
    assert sorted(r.event_id for r in redelivery.collect()) == [2, 5]


def test_forget_leaves_no_scratch_dirs(spark, tmp_path):
    paths = _paths(tmp_path)
    _ingest(spark, paths)
    forget_keys(spark, paths, "event_id", [1, 3])
    leftovers = {p.name for p in tmp_path.iterdir()}
    assert not any(n.endswith((".forget-tmp", ".forget-bak")) for n in leftovers)
