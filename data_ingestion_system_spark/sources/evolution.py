"""Schema evolution for managed parquet tables — SURVEY.md §1.3.

The reference evolves its store with `ALTER TABLE ... ADD COLUMN`
(reference: docs/database_schema.md:436-441 documents the convention:
new columns must be nullable-or-defaulted so old rows stay valid). A
parquet store has no ALTER TABLE; the equivalent convention here is:

* **writers** append new files with the WIDER schema — never rewrite
  old files (at 100 TB a table rewrite is off the table, literally);
* **new columns must be nullable** (or coalesce-defaulted at read):
  rows written before the evolution simply lack the column;
* **readers** union schemas across file generations with
  ``spark.read.option("mergeSchema", "true")`` — Spark fills the
  missing column with NULL for pre-evolution files. mergeSchema costs a
  footer read per file; for a table evolved rarely, store the current
  schema in the table's metadata sidecar and pass it explicitly
  (`.schema(...)`) to skip the merge on hot paths;
* **backfill interaction**: a backfill job (streaming/backfill.py) that
  replays a pre-evolution date range writes files with whatever schema
  its source has — mergeSchema makes mixed generations readable either
  way, and `COALESCE(new_col, default)` at the view layer gives the
  reference's DEFAULT semantics.

`evolved_table_read` exercises the full round-trip: two file
generations (pre/post ADD COLUMN) written side-by-side, read back with
mergeSchema, aggregated — hash-checked against an oracle computing the
same result from the base table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


def add_column_generation(df: DataFrame, path: str) -> None:
    """Append a new file generation carrying ``df``'s (wider) schema to a
    managed table directory — the ADD COLUMN convention: old files stay
    untouched, the new column must be nullable."""
    df.write.mode("append").parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a table whose file generations have different (compatible)
    schemas; pre-evolution rows surface NULL for later columns."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def _evolved_fixture_dir(sf_dir: str) -> str:
    """Build (once per testdata generation) a two-generation events table:
    generation 1 = (event_id, user_id, value) for even event_ids;
    generation 2 adds event_type for odd event_ids. Keyed on the source
    parquet's (mtime, size) so regenerated testdata rebuilds the fixture."""
    from data_ingestion_system_spark.tables import fingerprint_fixture_dir

    return fingerprint_fixture_dir("dis_schema_evo", sf_dir, "events")


@query(
    "schema_evolution_read",
    oracle="""
SELECT COALESCE(CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_type END,
                '_pre_evolution') AS event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value) * 1000000.0) / 1000000.0 AS total_value
FROM events
GROUP BY 1 ORDER BY event_type
""",
    survey="EXT-schema-evolution",
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD COLUMN round-trip, hash-checked: generation 1 of the managed
    table predates the `event_type` column (even event_ids, 3-column
    schema); generation 2 was written after the evolution (odd
    event_ids, 4 columns). The mergeSchema read surfaces NULL
    event_type for generation-1 rows; the view-layer COALESCE gives
    them the reference's DEFAULT value. The oracle recomputes the same
    relation from the base table without any files, so the whole
    write→merge→read path is value-verified."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _evolved_fixture_dir(sf_dir)
    marker = os.path.join(path, "_DIS_EVOLVED")
    if not os.path.exists(marker):
        gen1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", "value")
        gen1.write.mode("overwrite").parquet(path)
        gen2 = ev.filter(F.col("event_id") % 2 == 1)
        add_column_generation(gen2, path)
        with open(marker, "w") as fh:
            fh.write("ok")
    merged = read_evolved(spark, path)
    return (
        merged.groupBy(
            F.coalesce(F.col("event_type"), F.lit("_pre_evolution")).alias("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("round(sum(value) * 1000000.0) / 1000000.0").alias("total_value"),
        )
        .orderBy("event_type")
    )
