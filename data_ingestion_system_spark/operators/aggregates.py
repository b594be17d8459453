"""Aggregation operators — SURVEY.md §2.4 (A1–A7, A16).

The reference computes these either as SQLite views
(reference: src/database/schema.sql:236-261) or as row-at-a-time Python
loops (reference: src/analysis/*.py). Here every one is a single
declarative groupBy/agg that Catalyst executes as partial+final hash
aggregation — map-side combine for free, no driver-side loops.

Scale notes: group keys are low-cardinality (nation, date, status) so the
final agg is tiny; the heavy side is the scan, which prunes to only the
referenced columns. Dimension joins are explicitly broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


@query(
    "app_stats",
    oracle="""
SELECT
  n_name,
  COUNT(*) AS order_count,
  ROUND(AVG(o_totalprice) * 100.0) / 100.0 AS avg_price,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_orders,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
  MIN(o_orderdate) AS first_order,
  MAX(o_orderdate) AS last_order
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    survey="A1,J1",
)
def app_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship grouped multi-agg — the `v_app_stats` shape
    (reference: src/database/schema.sql:236-249): per group COUNT, rounded
    AVG, conditional SUMs, MIN/MAX timestamp. Nation stands in for app_id.

    Physical shape: broadcast the two dims (customer cols pruned to 2,
    nation is 25 rows), one shuffle on n_name for the final agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_count"),
            round_port(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("fulfilled_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("open_orders"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("urgent_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("n_name")
    )


@query(
    "daily_stats",
    oracle="""
SELECT
  CAST(o_orderdate AS DATE) AS order_day,
  COUNT(*) AS n_orders,
  ROUND(AVG(o_totalprice) * 100.0) / 100.0 AS avg_price,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
FROM orders
GROUP BY CAST(o_orderdate AS DATE)
ORDER BY order_day
""",
    survey="A2",
)
def daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grouped agg — `v_daily_stats` (reference: schema.sql:252-261):
    GROUP BY DATE(ts) with count/avg/conditional counts, ordered by day."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(
            F.count("*").alias("n_orders"),
            round_port(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n_urgent"),
            F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)).alias("n_low"),
        )
        .orderBy("order_day")
    )


@query(
    "sentiment_distribution",
    oracle="""
SELECT
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned,
  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS accepted,
  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS neutral
FROM lineitem
WHERE l_quantity >= 10
""",
    survey="A3",
)
def sentiment_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass conditional-sum pivot (reference: db_manager.py:408-436):
    three SUM(CASE WHEN ...) over one filtered scan, one output row."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 10)
    return li.agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("returned"),
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("accepted"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("neutral"),
    )


@query(
    "scalar_stats",
    oracle="""
SELECT
  COUNT(*) AS n_rows,
  ROUND(AVG(l_quantity) * 10000.0) / 10000.0 AS avg_qty,
  ROUND(SUM(l_extendedprice) * 100.0) / 100.0 AS total_price,
  MIN(l_shipdate) AS first_ship,
  MAX(l_shipdate) AS last_ship
FROM lineitem
""",
    survey="A4",
)
def scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table scalar aggregates (reference: db_manager.py:508-538)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        round_port(F.avg("l_quantity"), 4).alias("avg_qty"),
        round_port(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "count_distinct",
    oracle="""
SELECT
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderstatus) AS n_statuses,
  COUNT(*) AS n_orders
FROM orders
""",
    survey="A5",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT key) (reference: db_manager.py:816-818).

    Exact here for oracle parity; at 100 TB the engine offers
    `approx_count_distinct` (HLL) as the scale path — see
    `monitoring.approx_distinct_events` for the approximate twin.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


@query(
    "group_frequency",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    survey="A6",
)
def group_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by frequency (reference: db_manager.py:852-867)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(F.count("*").alias("n")).orderBy("event_type")


@query(
    "group_frequency_2key",
    oracle="""
SELECT event_type, user_id % 3 AS user_band, COUNT(*) AS n
FROM events
GROUP BY event_type, user_id % 3
ORDER BY event_type, user_band
""",
    survey="A6",
)
def group_frequency_2key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key frequency matrix (reference: db_manager.py:716-748 —
    priority_tier × status counts)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type", (F.col("user_id") % 3).alias("user_band"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "user_band")
    )


@query(
    "top_frequent",
    oracle="""
SELECT o_custkey, COUNT(*) AS n
FROM orders
GROUP BY o_custkey
ORDER BY n DESC, o_custkey ASC
LIMIT 10
""",
    survey="A7,W2",
)
def top_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter.most_common(k) (reference: data_quality_analyzer.py:352-373)
    as groupBy+count+top-k; tiebreak on key for stable LIMIT (SURVEY §4.2.4).

    Physically a TakeOrderedAndProject — no global sort materialized."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("o_custkey"))
        .limit(10)
    )


@query(
    "examples_per_group",
    oracle="""
SELECT lang,
       COUNT(*) AS n,
       array_to_string((list_sort(list(doc_id)))[1:3], ',') AS example_ids
FROM documents
GROUP BY lang
ORDER BY lang
""",
    survey="A7",
)
def examples_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group example collection — deep_analysis keeps sample reviews
    per quality bucket (reference: src/analysis/deep_analysis.py:391-406
    stores examples alongside counts). Deterministic: sorted id list,
    first 3, joined to a CSV string (the driver's canonicalizer hashes
    scalar columns; an ArrayType column is unhashable there)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 3),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("example_ids"),
        )
        .orderBy("lang")
    )


@query(
    "ratio_metrics",
    oracle="""
WITH agg AS (
  SELECT
    COUNT(*) AS n_events,
    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
    CAST(date_diff('second', MIN(ts), MAX(ts)) AS DOUBLE) AS span_seconds
  FROM events
)
SELECT
  n_events,
  n_errors,
  ROUND(CAST(n_errors AS DOUBLE) / n_events * 1000000.0) / 1000000.0 AS error_rate,
  ROUND(CAST(n_purchases AS DOUBLE) / n_events * 1000000.0) / 1000000.0 AS purchase_rate,
  ROUND(CAST(n_events AS DOUBLE) / (span_seconds / 60.0) * 10000.0) / 10000.0 AS events_per_min
FROM agg
""",
    survey="A16",
)
def ratio_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived run metrics — dedup_rate / error_rate / rate-per-minute
    (reference: src/ingestion/monitor.py:127-153) as column arithmetic on a
    one-row aggregate."""
    events = load_table(spark, sf_dir, "events")
    agg = events.agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("double")
        .alias("span_seconds"),
    )
    return agg.select(
        "n_events",
        "n_errors",
        round_port(F.col("n_errors").cast("double") / F.col("n_events"), 6).alias("error_rate"),
        round_port(F.col("n_purchases").cast("double") / F.col("n_events"), 6).alias("purchase_rate"),
        round_port(F.col("n_events").cast("double") / (F.col("span_seconds") / 60.0), 4).alias(
            "events_per_min"
        ),
    )


_ORDER_SIZE_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(n_items AS BIGINT) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM per_order GROUP BY n_items ORDER BY n_items
"""


@query("order_size_distribution", oracle=_ORDER_SIZE_ORACLE, survey="A6,A13")
def order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out distribution of the fact key: orders by line-item count —
    the two-level count-of-counts (A13) that sizes the join multiplicity
    `join_cardinality_profile` prices in aggregate. Two
    map-side-combinable groupBys, output bounded by max items/order."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    return (
        per_order.groupBy(F.col("n_items").cast("bigint").alias("n_items"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("n_items")
    )


_REPEAT_INTERVAL_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_repeat_customers,
       ROUND(AVG(CAST(gap_days AS DOUBLE)) * 1000000.0) / 1000000.0
         AS mean_gap_days,
       ROUND(quantile_cont(gap_days, 0.50) * 1000000.0) / 1000000.0 AS p50,
       ROUND(quantile_cont(gap_days, 0.90) * 1000000.0) / 1000000.0 AS p90
FROM gaps WHERE gap_days IS NOT NULL
"""


@query("repeat_purchase_interval", oracle=_REPEAT_INTERVAL_ORACLE, survey="A10,W6,EXT-temporal")
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag window, order
    key tiebreak), rolled up to mean and exact p50/p90 — the
    repurchase-cadence number retention campaigns are timed against.
    Intervals are exact integer day diffs; the window is
    customer-partitioned, key-parallel."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    out = gaps.agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_repeat_customers"),
        (F.round(F.avg(F.col("gap_days").cast("double")) * 1000000.0) / 1000000.0)
        .alias("mean_gap_days"),
        F.expr("percentile(gap_days, array(0.50, 0.90))").alias("ps"),
    )
    return out.select(
        "n_intervals",
        "n_repeat_customers",
        "mean_gap_days",
        (F.round(F.col("ps")[0] * 1000000.0) / 1000000.0).alias("p50"),
        (F.round(F.col("ps")[1] * 1000000.0) / 1000000.0).alias("p90"),
    )
