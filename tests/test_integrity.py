"""Integrity operators: CHECK-rule validation splits, FK orphan counts
(injected orphans must be counted), and the ingest-time quarantine gate.

Reference semantics under test: schema.sql FK edges (74,116-117,305-306)
and CHECK constraints (58, 89-90, 293-299) — enforced set-based here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_ingestion_system_spark.operators.integrity import (
    enum_check,
    event_rules,
    not_null_check,
    orphan_count,
    range_check,
    validate,
)


@pytest.fixture()
def small_events(spark):
    rows = [
        # (event_id, user_id, event_type, value)
        (1, 10, "click", 5.0),          # valid
        (2, 11, "error", 5.0),          # enum violation
        (3, 12, "view", 999.0),         # range violation
        (4, None, "purchase", 1.0),     # null user_id
        (5, 13, "error", 999.0),        # two violations
        (6, 14, "signup", None),        # NULL value -> range rule PASSES (SQL CHECK)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )


def test_validate_splits_and_reasons(small_events):
    rules = [
        enum_check("event_type", ["click", "view", "purchase", "signup"]),
        range_check("value", 0.0, 400.0),
        not_null_check("user_id"),
    ]
    valid, quar = validate(small_events, rules)
    assert sorted(r.event_id for r in valid.collect()) == [1, 6]
    q = {r.event_id: sorted(r._violations) for r in quar.collect()}
    assert q == {
        2: ["event_type_enum"],
        3: ["value_range"],
        4: ["user_id_not_null"],
        5: ["event_type_enum", "value_range"],
    }


def test_null_check_semantics(small_events):
    """SQL CHECK: NULL predicate result is not a violation — a NULL value
    passes the range rule; rejecting NULLs needs an explicit NOT NULL."""
    valid, quar = validate(small_events, [range_check("value", 0.0, 400.0)])
    assert sorted(r.event_id for r in valid.collect()) == [1, 2, 4, 6]
    assert sorted(r.event_id for r in quar.collect()) == [3, 5]


def test_orphan_injection_is_counted(spark):
    parent = spark.createDataFrame([(i,) for i in range(10)], "pk long")
    child = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 99), (4, 42), (5, None)],
        "row_id long, fk long",
    )
    row = orphan_count(child, "fk", parent, "pk", broadcast_parent=True).collect()[0]
    # 99 and 42 are orphans; NULL FK is not an orphan (SQL FK semantics)
    assert row.n_rows == 5 and row.n_orphans == 2
    clean = child.filter(F.col("fk") < 10)
    row = orphan_count(clean, "fk", parent, "pk").collect()[0]
    assert row.n_orphans == 0


def test_orphan_matrix_is_clean_on_testdata(spark, sf_dir):
    from data_ingestion_system_spark.registry import load_all

    rows = load_all()["orphan_check_matrix"].spark(spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r.n_orphans == 0 for r in rows), rows
    assert all(r.n_rows > 0 for r in rows)


def test_ingest_quarantine_gate(spark, tmp_path):
    """dedup_insert_batch with rules: violators land in quarantine with
    reasons, the store gets only valid rows, and the audit record keeps
    fetched = inserted + skipped + quarantined."""
    from data_ingestion_system_spark.streaming.ingest import (
        IngestPaths,
        dedup_insert_batch,
    )

    paths = IngestPaths(
        source_dir=str(tmp_path / "src"),
        target_dir=str(tmp_path / "target"),
        audit_dir=str(tmp_path / "audit"),
        provenance_dir=str(tmp_path / "prov"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        quarantine_dir=str(tmp_path / "quar"),
    )
    batch = spark.createDataFrame(
        [
            (1, 10, "click", 5.0, "t1"),
            (2, 11, "error", 5.0, "t1"),    # quarantined (enum)
            (3, 12, "view", 999.0, "t1"),   # quarantined (range)
            (4, 13, "purchase", 1.0, "t1"),
            (4, 13, "purchase", 1.0, "t1"),  # in-batch dup of 4
        ],
        "event_id long, user_id long, event_type string, value double, ts string",
    )
    rules = [
        enum_check("event_type", ["click", "view", "purchase", "signup"]),
        range_check("value", 0.0, 400.0),
    ]
    dedup_insert_batch(spark, batch, 0, "event_id", paths, rules=rules)

    target_ids = sorted(r.event_id for r in spark.read.parquet(paths.target_dir).collect())
    assert target_ids == [1, 4]
    quar = spark.read.parquet(paths.quarantine_dir).collect()
    assert sorted(r.event_id for r in quar) == [2, 3]
    assert all(len(r._violations) == 1 for r in quar)
    audit = spark.read.parquet(paths.audit_dir).collect()[0]
    assert audit.fetched == 4  # post in-batch dedup
    assert audit.quarantined == 2 and audit.inserted == 2 and audit.skipped == 0
    assert audit.fetched == audit.inserted + audit.skipped + audit.quarantined
    # provenance logs every fetched key, including the quarantined ones
    prov_ids = sorted(
        r.event_id for r in spark.read.parquet(paths.provenance_dir).collect()
    )
    assert prov_ids == [1, 2, 3, 4]

    # second batch: cross-batch dedup still applies to valid rows only
    batch2 = spark.createDataFrame(
        [(1, 10, "click", 5.0, "t2"), (9, 14, "signup", 2.0, "t2")],
        "event_id long, user_id long, event_type string, value double, ts string",
    )
    dedup_insert_batch(spark, batch2, 1, "event_id", paths, rules=rules)
    audit2 = (
        spark.read.parquet(paths.audit_dir).filter(F.col("batch_id") == 1).collect()[0]
    )
    assert audit2.inserted == 1 and audit2.skipped == 1 and audit2.quarantined == 0


def test_event_rules_profile_matches_manual(spark, sf_dir):
    """invalid_rows_profile's `_any_rule` row equals a direct validate()
    split on the same table."""
    from data_ingestion_system_spark.registry import load_all
    from data_ingestion_system_spark.tables import load_table

    prof = {
        r.rule: r.n_violations
        for r in load_all()["invalid_rows_profile"].spark(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    _, quar = validate(ev, event_rules())
    assert prof["_any_rule"] == quar.count()


def test_streaming_ingestion_with_rules(spark, tmp_path):
    """End-to-end: run_file_ingestion with CHECK rules quarantines
    violators across streamed batches (not just the direct batch API)."""
    import os

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_ingestion_system_spark.streaming.ingest import (
        IngestPaths,
        run_file_ingestion,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    paths = IngestPaths(
        source_dir=str(tmp_path / "src"),
        target_dir=str(tmp_path / "target"),
        audit_dir=str(tmp_path / "audit"),
        provenance_dir=str(tmp_path / "prov"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        quarantine_dir=str(tmp_path / "quar"),
    )
    os.makedirs(paths.source_dir, exist_ok=True)
    spark.createDataFrame(
        [(1, 10, "click", 5.0), (2, 11, "error", 5.0), (3, 12, "view", 2.0)],
        schema,
    ).write.mode("append").parquet(paths.source_dir)
    rules = [enum_check("event_type", ["click", "view", "purchase", "signup"])]
    run_file_ingestion(
        spark, paths, schema, key_col="event_id",
        max_files_per_trigger=None, rules=rules,
    )
    assert sorted(
        r.event_id for r in spark.read.parquet(paths.target_dir).collect()
    ) == [1, 3]
    assert [r.event_id for r in spark.read.parquet(paths.quarantine_dir).collect()] == [2]
