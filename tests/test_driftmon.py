"""Streaming PSI drift monitor: in-distribution batches stay quiet, a
shifted batch raises the alert."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructType

from data_ingestion_system_spark.streaming.driftmon import (
    batch_psi,
    freeze_reference,
    run_drift_monitor,
)

SCHEMA = StructType().add("id", LongType()).add("value", DoubleType())


def _uniformish(spark, n, lo=0.0, hi=100.0, seed_off=0):
    # deterministic pseudo-uniform values from a hash of id
    return spark.range(n).select(
        (F.col("id") + seed_off).alias("id"),
        (
            F.pmod(F.xxhash64((F.col("id") + seed_off).cast("string")), 10000)
            / 10000.0
            * (hi - lo)
            + lo
        ).alias("value"),
    )


def test_freeze_and_batch_psi_scores(spark):
    ref = _uniformish(spark, 4000)
    cuts, shares = freeze_reference(ref)
    assert len(cuts) == 9 and len(shares) == 10
    assert abs(sum(shares) - 1.0) < 1e-9
    # same distribution -> tiny PSI; shifted distribution -> large PSI
    same = batch_psi(_uniformish(spark, 1000, seed_off=7777), cuts, shares)
    shifted = batch_psi(_uniformish(spark, 1000, lo=200.0, hi=300.0), cuts, shares)
    assert same < 0.1, same
    assert shifted > 1.0, shifted


def test_streaming_monitor_flags_the_shifted_batch(spark, tmp_path):
    src = str(tmp_path / "landing")
    os.makedirs(src)
    batches = [
        _uniformish(spark, 800, seed_off=1),
        _uniformish(spark, 800, seed_off=2),
        _uniformish(spark, 800, lo=500.0, hi=600.0),  # off-distribution
    ]
    for i, b in enumerate(batches):
        staging = tmp_path / f"s{i}"
        b.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        os.rename(staging / part, tmp_path / "landing" / f"batch_{i}.parquet")

    audit_dir = str(tmp_path / "psi_audit")
    run_drift_monitor(
        spark, src, SCHEMA, _uniformish(spark, 4000, seed_off=99), audit_dir
    )
    rows = {r.batch_id: r for r in spark.read.parquet(audit_dir).collect()}
    assert len(rows) == 3
    alerts = [b for b, r in rows.items() if r.alert]
    quiet = [b for b, r in rows.items() if not r.alert]
    assert len(alerts) == 1 and len(quiet) == 2
    assert rows[alerts[0]].psi > max(rows[b].psi for b in quiet)
