"""Schema-evolution convention (SURVEY §1.3; reference
docs/database_schema.md:436-441 ALTER TABLE ADD COLUMN): managed parquet
tables evolve by appending wider-schema file generations; mergeSchema
reads mixed generations; new columns are nullable with view-layer
COALESCE defaults; backfill may re-append narrow-schema files later.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestion_system_spark.sources.evolution import (
    add_column_generation,
    read_evolved,
)


def _gen1(spark):
    return spark.createDataFrame(
        [(1, 10, 5.0), (2, 11, 6.0)], "event_id long, user_id long, value double"
    )


def _gen2(spark):
    return spark.createDataFrame(
        [(3, 12, 7.0, "click"), (4, 13, 8.0, "view")],
        "event_id long, user_id long, value double, event_type string",
    )


def test_add_column_merge_read(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _gen1(spark).write.parquet(path)
    add_column_generation(_gen2(spark), path)

    merged = read_evolved(spark, path)
    assert set(merged.columns) == {"event_id", "user_id", "value", "event_type"}
    rows = {r.event_id: r.event_type for r in merged.collect()}
    # pre-evolution rows surface NULL for the added column
    assert rows[1] is None and rows[2] is None
    assert rows[3] == "click" and rows[4] == "view"


def test_coalesce_gives_default_semantics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _gen1(spark).write.parquet(path)
    add_column_generation(_gen2(spark), path)
    out = read_evolved(spark, path).select(
        "event_id", F.coalesce("event_type", F.lit("unknown")).alias("event_type")
    )
    vals = {r.event_id: r.event_type for r in out.collect()}
    assert vals == {1: "unknown", 2: "unknown", 3: "click", 4: "view"}


def test_backfill_narrow_generation_after_evolution(spark, tmp_path):
    """A backfill replaying a pre-evolution range appends files with the
    OLD (narrow) schema after the wide generation already exists — the
    merged read must still see every row and every column."""
    path = str(tmp_path / "tbl")
    _gen1(spark).write.parquet(path)
    add_column_generation(_gen2(spark), path)
    backfill = spark.createDataFrame(
        [(5, 14, 9.0)], "event_id long, user_id long, value double"
    )
    backfill.write.mode("append").parquet(path)

    merged = read_evolved(spark, path)
    assert merged.count() == 5
    assert set(merged.columns) == {"event_id", "user_id", "value", "event_type"}
    assert merged.filter(F.col("event_type").isNull()).count() == 3


def test_plain_read_documents_the_footprint_caveat(spark, tmp_path):
    """Without mergeSchema, Spark takes one file's footer as THE schema —
    the documented reason hot paths should pass an explicit schema from
    the table's metadata sidecar instead."""
    path = str(tmp_path / "tbl")
    _gen1(spark).write.parquet(path)
    add_column_generation(_gen2(spark), path)
    plain_cols = set(spark.read.parquet(path).columns)
    # whichever footer wins, the plain read is schema-unstable by design;
    # the convention requires mergeSchema (or explicit schema) for
    # evolved tables
    assert plain_cols.issubset({"event_id", "user_id", "value", "event_type"})
