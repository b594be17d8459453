"""Set operations — SURVEY.md §2.6 (O3–O7).

The reference does set algebra with Python sets over collected id lists
(reference: src/labeling/sampler.py:204-222) and list concatenation
(src/main.py:250-260). Here they're distributed set operators — union /
except / intersect shuffle on the full row as key; at scale prefer the
left_anti/left_semi forms (operators.joins) when one side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


@query(
    "union_all_concat",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM (
  SELECT event_type FROM events WHERE value > 250
  UNION ALL
  SELECT event_type FROM events WHERE user_id = 3
) t
GROUP BY event_type
ORDER BY event_type
""",
    survey="O3",
)
def union_all_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation union (main.py:250-260 extends lists per app) —
    `unionByName` of two filtered slices, duplicates kept."""
    events = load_table(spark, sf_dir, "events")
    high = events.filter(F.col("value") > 250).select("event_type")
    user3 = events.filter(F.col("user_id") == 3).select("event_type")
    return (
        high.unionByName(user3)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "union_distinct_ids",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
ORDER BY user_id
""",
    survey="O5",
)
def union_distinct_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union of two id sets — queued ∪ labeled ids
    (sampler.py:208-222)."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct().orderBy("user_id")


@query(
    "except_difference",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
ORDER BY o_custkey
""",
    survey="O4",
)
def except_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference — exclusion of already-sampled ids
    (sampler.py:147-154) as a distinct EXCEPT."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    # subtract = SQL EXCEPT (set semantics, distinct); exceptAll would be
    # bag difference and keep multiply-occurring survivors
    return y95.subtract(y96).orderBy("o_custkey")


@query(
    "intersect_ids",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
ORDER BY o_custkey
""",
    survey="O6",
)
def intersect_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect (not present in the reference; exposed for completeness,
    SURVEY §2.6 O6)."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y95.intersect(y96).orderBy("o_custkey")
