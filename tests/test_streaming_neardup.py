"""Incremental MinHash-LSH near-dup ingestion (streaming/neardup.py).

Crafted corpus: documents are 12-token sentences, so two docs sharing
all but one token have 3-word-shingle Jaccard well above 0.5, while
distinct sentences share nothing. Batches arrive in order and each is
deduped against everything ACCEPTED so far plus itself.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.streaming.neardup import (
    NearDupPaths,
    neardup_insert_batch,
    run_neardup_ingestion,
)

DOC_SCHEMA = "doc_id long, text string"

BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
VARIANT = BASE.replace("echo", "zulu")  # near-dup of BASE (1 of 12 words)
OTHER = "one two three four five six seven eight nine ten eleven twelve"
THIRD = "red orange yellow green blue indigo violet cyan magenta teal maroon navy"


def _paths(tmp_path) -> NearDupPaths:
    return NearDupPaths(
        source_dir=str(tmp_path / "landing"),
        target_dir=str(tmp_path / "target"),
        bands_dir=str(tmp_path / "bands"),
        tokens_dir=str(tmp_path / "tokens"),
        audit_dir=str(tmp_path / "audit"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_batch_rejects_near_dups_of_store_and_within_batch(spark, tmp_path):
    paths = _paths(tmp_path)
    # batch 0: two distinct docs, plus an intra-batch near-dup of doc 1
    neardup_insert_batch(
        spark, _df(spark, [(1, BASE), (2, OTHER), (3, VARIANT)]), 0, paths
    )
    target = spark.read.parquet(paths.target_dir)
    assert sorted(r.doc_id for r in target.collect()) == [1, 2]

    # batch 1: near-dup of stored doc 1 (different id), an exact
    # re-delivery of doc 2, and one genuinely new doc
    neardup_insert_batch(
        spark, _df(spark, [(10, VARIANT), (2, OTHER), (20, THIRD)]), 1, paths
    )
    target = spark.read.parquet(paths.target_dir)
    assert sorted(r.doc_id for r in target.collect()) == [1, 2, 20]

    audit = {r.batch_id: r for r in spark.read.parquet(paths.audit_dir).collect()}
    assert audit[0].fetched == 3
    assert audit[0].dup_within_batch == 1 and audit[0].inserted == 2
    assert audit[1].fetched == 3
    assert audit[1].dup_vs_store == 2  # VARIANT~stored BASE, re-delivered doc 2
    assert audit[1].inserted == 1
    for r in audit.values():
        assert r.fetched == r.dup_vs_store + r.dup_within_batch + r.inserted


def test_replayed_batch_is_skipped(spark, tmp_path):
    paths = _paths(tmp_path)
    neardup_insert_batch(spark, _df(spark, [(1, BASE), (2, OTHER)]), 0, paths)
    before = spark.read.parquet(paths.target_dir).count()
    # same batch_id replayed (crash-after-commit scenario): no-op
    neardup_insert_batch(spark, _df(spark, [(1, BASE), (2, OTHER)]), 0, paths)
    assert spark.read.parquet(paths.target_dir).count() == before
    assert spark.read.parquet(paths.audit_dir).count() == 1


def test_streaming_drain_end_to_end(spark, tmp_path):
    paths = _paths(tmp_path)
    os.makedirs(paths.source_dir)
    batches = [
        [(1, BASE), (2, OTHER)],
        [(10, VARIANT), (20, THIRD)],
        [(30, THIRD + " extra"), (40, BASE)],
    ]
    for i, rows in enumerate(batches):
        staging = tmp_path / f"staging{i}"
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        os.rename(staging / part, os.path.join(paths.source_dir, f"batch_{i}.parquet"))

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    run_neardup_ingestion(spark, paths, schema)

    target = spark.read.parquet(paths.target_dir)
    got = sorted(r.doc_id for r in target.collect())
    # 10 ~ 1 (VARIANT of BASE), 40 == 1's text exactly, 30 ~ 20
    # (12 of 13 tokens shared -> 10 of 11 shingles); the rest survive
    assert got == [1, 2, 20]

    # accepted-state index covers exactly the accepted docs
    bands = spark.read.parquet(paths.bands_dir)
    toks = spark.read.parquet(paths.tokens_dir)
    assert sorted(r.doc_id for r in bands.select("doc_id").distinct().collect()) == got
    assert sorted(r.doc_id for r in toks.select("doc_id").distinct().collect()) == got

    # audit invariant holds per batch
    for r in spark.read.parquet(paths.audit_dir).collect():
        assert r.fetched == r.dup_vs_store + r.dup_within_batch + r.inserted
