"""store_as_of / change_feed over the ingest provenance log: snapshots
reconstruct exactly, re-fetched keys don't move their insert batch, and
the feed between two snapshots is their set difference."""

from __future__ import annotations

from data_ingestion_system_spark.operators.integrity import enum_check
from data_ingestion_system_spark.streaming.ingest import (
    IngestPaths,
    dedup_insert_batch,
)
from data_ingestion_system_spark.streaming.timetravel import (
    change_feed,
    store_as_of,
)

SCHEMA = "event_id long, payload string"


def _paths(tmp_path) -> IngestPaths:
    return IngestPaths(
        source_dir=str(tmp_path / "src"),
        target_dir=str(tmp_path / "target"),
        audit_dir=str(tmp_path / "audit"),
        provenance_dir=str(tmp_path / "prov"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def test_snapshots_and_feed(spark, tmp_path):
    paths = _paths(tmp_path)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    b1 = spark.createDataFrame([(2, "b-refetch"), (3, "c")], SCHEMA)
    b2 = spark.createDataFrame([(4, "d"), (1, "a-refetch")], SCHEMA)
    dedup_insert_batch(spark, b0, 0, "event_id", paths)
    dedup_insert_batch(spark, b1, 1, "event_id", paths)
    dedup_insert_batch(spark, b2, 2, "event_id", paths)

    # current store: first-writer-wins per key
    assert sorted(
        (r.event_id, r.payload) for r in spark.read.parquet(paths.target_dir).collect()
    ) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]

    as_of = {
        n: sorted(r.event_id for r in store_as_of(spark, paths, n).collect())
        for n in (0, 1, 2)
    }
    assert as_of == {0: [1, 2], 1: [1, 2, 3], 2: [1, 2, 3, 4]}
    # re-fetch of key 2 in batch 1 (and 1 in batch 2) must not backdate
    # or duplicate anything
    snap0 = {(r.event_id, r.payload) for r in store_as_of(spark, paths, 0).collect()}
    assert snap0 == {(1, "a"), (2, "b")}

    feed = {
        (r.event_id, r.insert_batch)
        for r in change_feed(spark, paths, 0, 2).collect()
    }
    assert feed == {(3, 1), (4, 2)}
    # feed(a, b) == as_of(b) minus as_of(a)
    assert {e for e, _ in feed} == set(as_of[2]) - set(as_of[0])


def test_quarantined_fetch_does_not_backdate(spark, tmp_path):
    """A key quarantined in batch 0 and validly inserted in batch 1 must
    be dated to batch 1: absent from store_as_of(0), present in
    change_feed(0, 1) with insert_batch=1."""
    paths = _paths(tmp_path)
    paths.quarantine_dir = str(tmp_path / "quar")
    schema = "event_id long, event_type string"
    rules = [enum_check("event_type", ["click", "view"])]
    b0 = spark.createDataFrame([(1, "click"), (7, "error")], schema)
    b1 = spark.createDataFrame([(7, "view"), (8, "click")], schema)
    dedup_insert_batch(spark, b0, 0, "event_id", paths, rules=rules)
    dedup_insert_batch(spark, b1, 1, "event_id", paths, rules=rules)

    assert sorted(r.event_id for r in store_as_of(spark, paths, 0).collect()) == [1]
    assert sorted(r.event_id for r in store_as_of(spark, paths, 1).collect()) == [1, 7, 8]
    feed = {
        (r.event_id, r.insert_batch)
        for r in change_feed(spark, paths, 0, 1).collect()
    }
    assert feed == {(7, 1), (8, 1)}
