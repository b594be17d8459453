"""Grouping-set extensions — SURVEY.md §2.4 (cube/rollup).

The reference computes its tier×status matrix with two independent
GROUP BYs over the same table (reference: src/database/db_manager.py:716-748);
SURVEY §2.4 notes the one-pass `cube` equivalent. Exposed here as
first-class operators: one scan produces every marginal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


@query(
    "cube_counts",
    oracle="""
SELECT event_type, user_id % 3 AS user_band, COUNT(*) AS n
FROM events
GROUP BY CUBE (event_type, user_id % 3)
ORDER BY event_type NULLS FIRST, user_band NULLS FIRST
""",
    survey="A6-cube",
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user_band): the two independent GROUP BYs of
    db_manager.py:721-731 plus the grand total, in one pass."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.cube("event_type", (F.col("user_id") % 3).alias("user_band"))
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("user_band").asc_nulls_first()
        )
    )


@query(
    "pivot_matrix",
    oracle="""
SELECT user_id % 3 AS user_band,
  CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY user_id % 3
ORDER BY user_band
""",
    survey="A6",
)
def pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() — the tier×status matrix form
    (db_manager.py:716-748, SURVEY A6). Explicit pivot values keep the
    plan one-pass (no distinct-values pre-query) and the output schema
    stable for the oracle."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy((F.col("user_id") % 3).alias("user_band"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
        .orderBy("user_band")
    )


@query(
    "rollup_daily",
    oracle="""
SELECT strftime(o_orderdate, '%Y') AS yr, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice) * 100.0) / 100.0 AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY ROLLUP (strftime(o_orderdate, '%Y'), strftime(o_orderdate, '%Y-%m'))
ORDER BY yr NULLS FIRST, month NULLS FIRST
""",
    survey="A2-rollup",
)
def rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP year→month: the v_daily_stats hierarchy with subtotal rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        orders.rollup(
            F.date_format("o_orderdate", "yyyy").alias("yr"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count("*").alias("n"),
            round_port(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy(F.col("yr").asc_nulls_first(), F.col("month").asc_nulls_first())
    )


_UNPIVOT_ORACLE = """
WITH agg AS (
  SELECT r.r_name,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         ROUND(AVG(c.c_acctbal) * 1000000.0) / 1000000.0 AS avg_acctbal,
         ROUND(MAX(c.c_acctbal) * 100.0) / 100.0 AS max_acctbal
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name
)
SELECT r_name, metric, value FROM (
  SELECT r_name, 'n_customers' AS metric, n_customers AS value FROM agg
  UNION ALL
  SELECT r_name, 'avg_acctbal', avg_acctbal FROM agg
  UNION ALL
  SELECT r_name, 'max_acctbal', max_acctbal FROM agg
) u
ORDER BY r_name, metric
"""


@query("unpivot_metrics", oracle=_UNPIVOT_ORACLE, survey="A3-ext,EXT-reporting")
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long reshape (UNPIVOT/melt): the per-region metric block
    becomes (r_name, metric, value) rows — the shape dashboards and
    metric stores ingest, and the inverse of `pivot_matrix`. Spark's
    native `unpivot` keeps it one codegen expand (3 rows per input row,
    no shuffle beyond the feeding aggregate); the oracle's UNION-ALL is
    the portable SQL spelling of the same expansion."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    agg = (
        cust.join(
            F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]
        )
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").cast("double").alias("n_customers"),
            round_port(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
            round_port(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
    )
    return (
        agg.unpivot(
            ids=["r_name"],
            values=["n_customers", "avg_acctbal", "max_acctbal"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("r_name", "metric")
    )


@query(
    "grouping_sets_profile",
    oracle="""
SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(GROUPING(source) AS INTEGER) AS g_source,
       CAST(GROUPING(lang) AS INTEGER) AS g_lang
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang))
ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST
""",
    survey="A6-cube,A13",
)
def grouping_sets_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the generalization CUBE/ROLLUP are sugar
    for: the (source, lang), (source), (lang) margins in ONE pass with
    GROUPING() flags disambiguating real NULLs from margin rows. The
    reference computes each margin as a separate query
    (deep_analysis.py:84-130); one grouping-sets pass reads the corpus
    once for all three."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__gs_documents")
    return spark.sql(
        """
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(GROUPING(source) AS INTEGER) AS g_source,
               CAST(GROUPING(lang) AS INTEGER) AS g_lang
        FROM __gs_documents
        GROUP BY GROUPING SETS ((source, lang), (source), (lang))
        ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST
        """
    )


@query(
    "lang_listagg_by_source",
    oracle="""
SELECT source,
       string_agg(lang, ',' ORDER BY lang) AS langs,
       CAST(COUNT(*) AS BIGINT) AS n_langs
FROM (SELECT DISTINCT source, lang FROM documents) t
GROUP BY source
ORDER BY source
""",
    survey="A6,EXT-reporting",
)
def lang_listagg_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg reshape: the sorted comma-joined language list
    per source — the report-friendly denormalization every SQL surface
    ships. Deterministic by construction: collect_set is unordered, so
    the list is array_sort-ed BEFORE joining (the only portable way to
    hash-match an aggregated string)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", "lang")
        .distinct()
        .groupBy("source")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("lang"))).alias("langs"),
            F.count("*").cast("bigint").alias("n_langs"),
        )
        .orderBy("source")
    )
