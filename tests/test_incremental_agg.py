"""Incremental materialized aggregate: view == full recompute after
every batch, and replays never double-count."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructType, TimestampType

from data_ingestion_system_spark.streaming.incremental_agg import (
    read_view,
    run_incremental_daily_stats,
    write_partial,
)

SCHEMA = (
    StructType()
    .add("event_id", LongType())
    .add("ts", TimestampType())
    .add("value", DoubleType())
)


def _batch(spark, lo, hi):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(hours=(i * 7) % 96), float(i % 50) + 0.25)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _full_recompute(df):
    return sorted(
        tuple(r)
        for r in df.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_v"),
            (F.sum("value") / F.count("*")).alias("avg_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .collect()
    )


def test_view_tracks_full_recompute_and_replay_is_idempotent(spark, tmp_path):
    partials = str(tmp_path / "partials")
    b0, b1 = _batch(spark, 0, 400), _batch(spark, 400, 1000)

    write_partial(b0, 0, "ts", "value", partials)
    assert sorted(tuple(r) for r in read_view(spark, partials).collect()) == _full_recompute(b0)

    write_partial(b1, 1, "ts", "value", partials)
    both = b0.unionByName(b1)
    assert sorted(tuple(r) for r in read_view(spark, partials).collect()) == _full_recompute(both)

    # replay of batch 1 overwrites its own partition — no double count
    write_partial(b1, 1, "ts", "value", partials)
    assert sorted(tuple(r) for r in read_view(spark, partials).collect()) == _full_recompute(both)


def test_streaming_maintenance_over_file_source(spark, tmp_path):
    src = str(tmp_path / "landing")
    os.makedirs(src)
    parts = [(0, 300), (300, 700), (700, 1200)]
    for i, (lo, hi) in enumerate(parts):
        staging = tmp_path / f"s{i}"
        _batch(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        os.rename(staging / part, tmp_path / "landing" / f"b{i}.parquet")
    partials = str(tmp_path / "partials")
    run_incremental_daily_stats(spark, src, SCHEMA, partials)
    assert sorted(
        tuple(r) for r in read_view(spark, partials).collect()
    ) == _full_recompute(_batch(spark, 0, 1200))
