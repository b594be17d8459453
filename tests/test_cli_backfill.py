"""CLI surface (subprocess, §3 entry-point parity) + audit backfill (T7)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

from data_ingestion_system_spark.schemas import TESTDATA_SCHEMAS
from data_ingestion_system_spark.streaming.backfill import backfill_missing_audit
from data_ingestion_system_spark.streaming.ingest import IngestPaths, run_file_ingestion
from data_ingestion_system_spark.tables import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_run_query():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "data_ingestion_system_spark.cli",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "run",
            "--name",
            "group_frequency",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
        check=True,
    )
    rows = [json.loads(line) for line in out.stdout.strip().splitlines() if line.startswith("{")]
    assert len(rows) == 5
    assert {r["event_type"] for r in rows} == {"click", "view", "signup", "purchase", "error"}
    assert sum(r["n"] for r in rows) == 1000


def test_cli_unknown_query_exits_2():
    out = subprocess.run(
        [sys.executable, "-m", "data_ingestion_system_spark.cli", "run", "--name", "nope"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert out.returncode == 2
    assert "unknown query" in out.stderr


def test_backfill_reconstructs_deleted_audit(spark, sf_dir, tmp_path):
    """Delete one audit batch row; backfill must reconstruct identical
    counts from provenance (monitor.py:510-611 semantics)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").limit(1000).cache()
    landing = tmp_path / "landing"
    os.makedirs(landing)
    for i, (lo, hi) in enumerate([(0, 400), (300, 700), (600, 1000)]):
        staging = tmp_path / f"st{i}"
        events.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(str(staging))
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(staging / part, landing / f"b{i}.parquet")

    paths = IngestPaths(
        source_dir=str(landing),
        target_dir=str(tmp_path / "target"),
        audit_dir=str(tmp_path / "audit"),
        provenance_dir=str(tmp_path / "prov"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    run_file_ingestion(spark, paths, TESTDATA_SCHEMAS["events"], key_col="event_id")
    original = {
        r.batch_id: (r.fetched, r.inserted, r.skipped)
        for r in spark.read.parquet(paths.audit_dir).collect()
    }

    # drop batch 1's audit row by rewriting the audit dir without it
    audit = spark.read.parquet(paths.audit_dir)
    kept = audit.filter(F.col("batch_id") != 1).cache()
    kept.count()
    shutil.rmtree(paths.audit_dir)
    kept.write.parquet(paths.audit_dir)

    n = backfill_missing_audit(spark, paths, "event_id")
    assert n == 1
    restored = {
        r.batch_id: (r.fetched, r.inserted, r.skipped)
        for r in spark.read.parquet(paths.audit_dir).collect()
    }
    assert restored[1] == original[1]
    # idempotent: second run backfills nothing
    assert backfill_missing_audit(spark, paths, "event_id") == 0


def test_backfill_respects_quarantine_and_total_loss(spark, sf_dir, tmp_path):
    """Two review fixes pinned: (1) reconstructed inserts must run
    MIN(batch_id) over quarantined=false provenance rows only — a key
    quarantined in batch 0 and inserted clean in batch 1 belongs to
    batch 1 — and the reconstructed rows carry the full live audit
    schema including `quarantined` (no mixed-schema dir); (2) a
    wholesale-deleted audit dir (the total-loss scenario) backfills
    every batch instead of crashing on the unguarded read."""
    from pyspark.sql import functions as F

    from data_ingestion_system_spark.operators.integrity import Rule
    from data_ingestion_system_spark.streaming.ingest import dedup_insert_batch

    events = load_table(spark, sf_dir, "events").limit(200).cache()
    paths = IngestPaths(
        source_dir=str(tmp_path / "landing"),
        target_dir=str(tmp_path / "target"),
        audit_dir=str(tmp_path / "audit"),
        provenance_dir=str(tmp_path / "prov"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        quarantine_dir=str(tmp_path / "quar"),
    )
    # batch 0: value<=0 rule quarantines some rows; batch 1: no rules,
    # so batch 0's quarantined keys are inserted clean here
    rules = [Rule("value_floor", F.col("value") > 50)]  # sf0.001 values span 0.03-327
    dedup_insert_batch(spark, events, 0, "event_id", paths, rules=rules)
    dedup_insert_batch(spark, events, 1, "event_id", paths)
    original = {
        r.batch_id: (r.fetched, r.inserted, r.skipped, r.quarantined)
        for r in spark.read.parquet(paths.audit_dir).collect()
    }
    assert original[0][3] > 0, "fixture must actually quarantine rows"
    # total loss: delete the audit dir outright
    shutil.rmtree(paths.audit_dir)
    assert backfill_missing_audit(spark, paths, "event_id") == 2
    restored = spark.read.parquet(paths.audit_dir)
    assert "quarantined" in restored.columns
    got = {
        r.batch_id: (r.fetched, r.inserted, r.skipped, r.quarantined)
        for r in restored.collect()
    }
    assert got == original
