"""Exact deduplication (SURVEY.md §7 Stage 6; reference semantics §2.1 S9).

The reference dedups by primary key with INSERT OR IGNORE
(reference: src/database/db_manager.py:141-230) and detects duplicate
*content* post-hoc (src/analysis/data_quality_analyzer.py:345-386). The
engine's batch content-dedup: group by a content fingerprint (16-byte md5,
not the document itself — the shuffle carries keys, not bodies) and keep
the smallest id. Deterministic keeper choice makes the operation
idempotent and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


def dedup_exact_keep_min(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Return df with exact-duplicate content removed, keeping the row
    with the smallest id per fingerprint. Library form used by the
    streaming ingest path as well."""
    fp = F.md5(F.col(content_col))
    w_min = (
        df.select(fp.alias("_fp"), F.col(id_col).alias("_keep_id"))
        .groupBy("_fp")
        .agg(F.min("_keep_id").alias("_keep_id"))
    )
    return (
        df.withColumn("_fp", fp)
        .join(w_min, ["_fp"])
        .filter(F.col(id_col) == F.col("_keep_id"))
        .drop("_fp", "_keep_id")
    )


@query(
    "dedup_exact_stats",
    oracle="""
WITH fp AS (
  SELECT doc_id, md5(text) AS fingerprint FROM documents
), keepers AS (
  SELECT fingerprint, MIN(doc_id) AS keeper_id, COUNT(*) AS group_size
  FROM fp GROUP BY fingerprint
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(group_size) - COUNT(*) AS BIGINT) AS n_removed,
       ROUND((CAST(SUM(group_size) - COUNT(*) AS DOUBLE) / SUM(group_size)) * 1000000.0) / 1000000.0 AS dedup_rate
FROM keepers
""",
    survey="S9,A15,EXT-dedup",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with inserted/skipped accounting — the engine twin of
    `insert_reviews_bulk`'s inserted/skipped counters
    (db_manager.py:178-230)."""
    docs = load_table(spark, sf_dir, "documents")
    keepers = (
        docs.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("group_size"))
    )
    return keepers.agg(
        F.count("*").alias("n_kept"),
        (F.sum("group_size") - F.count("*")).alias("n_removed"),
        round_port(
            (F.sum("group_size") - F.count("*")).cast("double") / F.sum("group_size"), 6
        ).alias("dedup_rate"),
    )


@query(
    "dedup_exact_keepers",
    oracle="""
WITH fp AS (
  SELECT doc_id, md5(text) AS fingerprint FROM documents
)
SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS keeper_id, COUNT(*) AS group_size
FROM fp
GROUP BY fingerprint
HAVING COUNT(*) > 1
ORDER BY group_size DESC, keeper_id ASC
LIMIT 100
""",
    survey="A15,EXT-dedup",
)
def dedup_exact_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest duplicate groups with their deterministic keeper — the
    duplicate-id report (data_quality_analyzer.py:352-373)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("group_size"))
        .filter(F.col("group_size") > 1)
        .orderBy(F.desc("group_size"), F.asc("keeper_id"))
        .limit(100)
    )
