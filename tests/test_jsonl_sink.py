"""Transactional JSONL training sink: shard writes, manifest-as-commit-
marker, abort cleanup."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from data_ingestion_system_spark.sources import jsonl_sink


@pytest.fixture(scope="module")
def registered(spark):
    jsonl_sink.register(spark)
    return spark


def test_write_commits_shards_and_manifest(registered, tmp_path):
    out = str(tmp_path / "export")
    df = registered.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    ).repartition(4)
    df.write.format("jsonl_training").option("path", out).mode("append").save()

    manifest = jsonl_sink.read_manifest(out)
    assert manifest["total_rows"] == 100
    assert manifest["n_shards"] == 4
    assert manifest["columns"] == ["doc_id", "text"]
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert sorted(files) == sorted(s["file"] for s in manifest["shards"])
    assert not os.path.exists(os.path.join(out, "_staging"))

    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["doc_id"] for r in rows) == list(range(100))
    assert all(r["text"] == f"text-{r['doc_id']}" for r in rows)
    # per-shard rows in the manifest match the actual files
    by_file = {s["file"]: s["rows"] for s in manifest["shards"]}
    for f in files:
        with open(os.path.join(out, f)) as fh:
            assert sum(1 for _ in fh) == by_file[f]


def test_abort_leaves_no_partial_export(tmp_path):
    out = str(tmp_path / "aborted")
    os.makedirs(out)
    writer = jsonl_sink.JsonlTrainingWriter(
        {"path": out}, schema=None, overwrite=False
    )
    msg = writer.write(iter([Row(doc_id=1, text="a"), Row(doc_id=2, text="b")]))
    assert os.path.exists(msg.staged_path) and msg.rows == 2
    writer.abort([msg])
    assert not os.path.exists(os.path.join(out, "_staging"))
    assert os.listdir(out) == []  # no shards, no manifest — nothing visible


def _export(spark, out, n, mode):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    ).repartition(2)
    df.write.format("jsonl_training").option("path", out).mode(mode).save()


def test_overwrite_replaces_prior_shards(registered, tmp_path):
    out = str(tmp_path / "export")
    _export(registered, out, 10, "overwrite")
    _export(registered, out, 6, "overwrite")
    manifest = jsonl_sink.read_manifest(out)
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    # the manifest describes exactly what is on disk — no stale shards
    assert sorted(files) == sorted(s["file"] for s in manifest["shards"])
    assert manifest["total_rows"] == 6 and manifest["n_shards"] == 2


def test_append_merges_manifest(registered, tmp_path):
    out = str(tmp_path / "export")
    _export(registered, out, 10, "append")
    _export(registered, out, 6, "append")
    manifest = jsonl_sink.read_manifest(out)
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert sorted(files) == sorted(s["file"] for s in manifest["shards"])
    assert manifest["total_rows"] == 16 and manifest["n_shards"] == 4
