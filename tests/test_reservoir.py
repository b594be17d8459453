"""Streaming reservoir: prefix-equivalence to batch top-k, bounded
state, replay determinism."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructType

from data_ingestion_system_spark.functions.scalar import det_rank_key
from data_ingestion_system_spark.streaming.reservoir import (
    RESERVOIR_SEED,
    run_stream_reservoir,
    update_reservoir,
)

SCHEMA = StructType().add("event_id", LongType()).add("payload", StringType())
K = 25


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )


def _expected(spark, df):
    return [
        r.event_id
        for r in df.withColumn("_p", det_rank_key(F.col("event_id"), seed=RESERVOIR_SEED))
        .orderBy(F.asc("_p"), F.asc("event_id"))
        .limit(K)
        .collect()
    ]


def test_reservoir_equals_batch_topk_over_any_prefix(spark, tmp_path):
    res = str(tmp_path / "res")
    update_reservoir(spark, _rows(spark, 0, 1000), res, "event_id", K)
    got1 = sorted(r.event_id for r in spark.read.parquet(res).collect())
    assert got1 == sorted(_expected(spark, _rows(spark, 0, 1000)))

    update_reservoir(spark, _rows(spark, 1000, 2500), res, "event_id", K)
    got2 = sorted(r.event_id for r in spark.read.parquet(res).collect())
    assert got2 == sorted(_expected(spark, _rows(spark, 0, 2500)))
    assert len(got2) == K

    # replaying an already-folded batch must not change the sample
    update_reservoir(spark, _rows(spark, 1000, 2500), res, "event_id", K)
    got3 = sorted(r.event_id for r in spark.read.parquet(res).collect())
    assert got3 == got2


def test_streaming_reservoir_over_file_source(spark, tmp_path):
    src = str(tmp_path / "landing")
    os.makedirs(src)
    for i, (lo, hi) in enumerate([(0, 600), (600, 1200), (1200, 2000)]):
        staging = tmp_path / f"s{i}"
        _rows(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        os.rename(staging / part, tmp_path / "landing" / f"b{i}.parquet")
    res = str(tmp_path / "res")
    run_stream_reservoir(spark, src, SCHEMA, res, "event_id", K)
    got = sorted(r.event_id for r in spark.read.parquet(res).collect())
    assert got == sorted(_expected(spark, _rows(spark, 0, 2000)))
