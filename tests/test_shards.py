"""Training-shard export (sources/shards.py): stability, size bounds,
and lossless round-trip."""

from __future__ import annotations

from data_ingestion_system_spark.sources.shards import (
    read_training_shards,
    shard_manifest,
    write_training_shards,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, n=200):
    rows = [(i, f"doc number {i}") for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def test_roundtrip_is_lossless_and_sharding_stable(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _docs(spark)
    write_training_shards(df, out, n_shards=4)
    back = read_training_shards(spark, out, SCHEMA)
    assert back.count() == 200
    assert {r.doc_id for r in back.collect()} == set(range(200))
    assert {r.shard for r in back.select("shard").distinct().collect()} <= set(range(4))

    # content-stable: a second write of a half-corpus assigns every doc
    # to the same shard it got in the full write
    out2 = str(tmp_path / "shards2")
    write_training_shards(_docs(spark, 100), out2, n_shards=4)
    full = {(r.doc_id, r.shard) for r in back.collect() if r.doc_id < 100}
    half = {
        (r.doc_id, r.shard)
        for r in read_training_shards(spark, out2, SCHEMA).collect()
    }
    assert full == half


def test_max_records_splits_files(spark, tmp_path):
    out = str(tmp_path / "tiny")
    write_training_shards(_docs(spark, 200), out, n_shards=2, max_records_per_file=30)
    manifest = shard_manifest(spark, out)
    assert len(manifest) == 2
    # ~100 rows per shard at 30 records/file → ≥4 files each
    assert all(m["n_files"] >= 3 for m in manifest)
