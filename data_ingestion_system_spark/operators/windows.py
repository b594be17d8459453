"""Window / ranking / top-k operators — SURVEY.md §2.5 (W1–W8).

The reference has no SQL window functions; its use-cases are ORDER BY +
LIMIT pagination, Python loops over sorted run history, and per-group
selection (SURVEY §2.5). Here they're real window functions. Scale note:
every window below partitions by a key (or is bounded by LIMIT) — no
unpartitioned global window over the full fact table ever appears; the
only global sorts are top-k, which compile to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import det_rank_key, round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


@query(
    "topk_by_sortkey",
    oracle="""
SELECT doc_id, n_chars, lang
FROM documents
ORDER BY n_chars DESC, doc_id ASC
LIMIT 15
""",
    survey="W2",
)
def topk_by_sortkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by sort key (db_manager.py:456 — ORDER BY thumbs_up DESC
    LIMIT k) with doc_id tiebreaker for stability (SURVEY §4.2.4)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars", "lang")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(15)
    )


@query(
    "priority_queue_head",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus = 'O'
ORDER BY o_orderpriority ASC, o_orderkey ASC
LIMIT 20
""",
    survey="W3",
)
def priority_queue_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key priority-queue head (db_manager.py:650-656 —
    ORDER BY priority_tier ASC, queue_id ASC LIMIT n)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(F.asc("o_orderpriority"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "rank_per_group",
    oracle="""
SELECT lang, doc_id, n_chars, rn
FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) t
WHERE rn <= 5
ORDER BY lang, rn
""",
    survey="W4",
)
def rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-first selection per stratum (sampler.py:117-135) as
    row_number over a partitioned window — one shuffle on the partition
    key instead of one query per tier."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .orderBy("lang", "rn")
    )


@query(
    "deterministic_shuffle_sample",
    oracle="""
SELECT doc_id, lang
FROM documents
ORDER BY md5(concat('42:', CAST(doc_id AS VARCHAR))) ASC, doc_id ASC
LIMIT 50
""",
    survey="W5",
)
def deterministic_shuffle_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY RANDOM() (sampler.py:139-143) replaced by the engine's
    seeded deterministic shuffle: md5(seed||key) ordering — uniform like
    a random shuffle, but reproducible in any engine (SURVEY §4.2.1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang")
        .orderBy(det_rank_key(F.col("doc_id")).asc(), F.asc("doc_id"))
        .limit(50)
    )


@query(
    "history_lag_zscore",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events
  GROUP BY CAST(ts AS DATE)
)
SELECT day, n_events,
  n_events - LAG(n_events) OVER (ORDER BY day) AS delta_vs_prev,
  ROUND(AVG(CAST(n_events AS DOUBLE)) OVER (ORDER BY day ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) * 10000.0) / 10000.0 AS avg_last5,
  ROUND(STDDEV_SAMP(CAST(n_events AS DOUBLE)) OVER (ORDER BY day ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) * 10000.0) / 10000.0 AS std_last5
FROM daily
ORDER BY day
""",
    survey="W6,A17",
)
def history_lag_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-history deltas — vs-previous (lag) and mean/stdev over the
    previous ≤5 runs (monitor.py:155-209): the reference loads the last
    10 runs into Python and loops; here it's lag + rowsBetween(-5,-1)
    window aggregates over the daily series."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("n_events"))
    w = Window.orderBy("day")
    w5 = w.rowsBetween(-5, -1)
    return daily.select(
        "day",
        "n_events",
        (F.col("n_events") - F.lag("n_events").over(w)).alias("delta_vs_prev"),
        round_port(F.avg(F.col("n_events").cast("double")).over(w5), 4).alias("avg_last5"),
        round_port(F.stddev_samp(F.col("n_events").cast("double")).over(w5), 4).alias("std_last5"),
    ).orderBy("day")


@query(
    "quota_per_group",
    oracle="""
WITH targets AS (
  SELECT c_nationkey, GREATEST(2, CAST(FLOOR(COUNT(*) * 0.2) AS BIGINT)) AS target
  FROM customer GROUP BY c_nationkey
), ranked AS (
  SELECT c_custkey, c_nationkey,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY md5(concat('42:', CAST(c_custkey AS VARCHAR))) ASC, c_custkey ASC
         ) AS rn
  FROM customer
)
SELECT r.c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_selected, MIN(t.target) AS target
FROM ranked r JOIN targets t ON r.c_nationkey = t.c_nationkey
WHERE r.rn <= t.target
GROUP BY r.c_nationkey
ORDER BY nationkey
""",
    survey="W7,M2",
)
def quota_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quota selection with computed targets — the cross-app
    balancing pass (sampler.py:156-202): proportional target with a
    min-2 floor, seeded-shuffle pick per group. One window + one
    broadcast join of the tiny per-group target table."""
    customer = load_table(spark, sf_dir, "customer")
    targets = (
        customer.groupBy("c_nationkey")
        .agg(F.greatest(F.lit(2), F.floor(F.count("*") * 0.2)).alias("target"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        det_rank_key(F.col("c_custkey")).asc(), F.asc("c_custkey")
    )
    ranked = customer.select("c_custkey", "c_nationkey", F.row_number().over(w).alias("rn"))
    return (
        ranked.join(F.broadcast(targets), "c_nationkey")
        .filter(F.col("rn") <= F.col("target"))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_selected"), F.min("target").alias("target"))
        .orderBy("nationkey")
    )


@query(
    "running_total",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01'
  GROUP BY CAST(o_orderdate AS DATE)
)
SELECT day, n_orders,
       CAST(SUM(n_orders) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_orders
FROM daily
ORDER BY day
""",
    survey="W8",
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative counter (session.py:95-161's session progress
    as an analytic): sum over unboundedPreceding→currentRow."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day", "n_orders", F.sum("n_orders").over(w).alias("cumulative_orders")
    ).orderBy("day")


_RANK_PROFILE_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER()   OVER w AS rn,
         RANK()         OVER w AS rnk,
         DENSE_RANK()   OVER w AS drnk,
         ROUND(PERCENT_RANK() OVER w * 1000000.0) / 1000000.0 AS pct_rank,
         ROUND(CUME_DIST()    OVER w * 1000000.0) / 1000000.0 AS cume,
         CAST(NTILE(4) OVER w AS INTEGER) AS quartile
  FROM lineitem
  WINDOW w AS (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)
)
SELECT l_returnflag, CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       ROUND(l_extendedprice * 1000000.0) / 1000000.0 AS price,
       CAST(rn AS BIGINT) AS rn, CAST(rnk AS BIGINT) AS rnk,
       CAST(drnk AS BIGINT) AS drnk, pct_rank, cume, quartile
FROM ranked WHERE rn <= 5
ORDER BY l_returnflag, rn
"""


@query("rank_function_profile", oracle=_RANK_PROFILE_ORACLE, survey="W1,W4")
def rank_function_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface in one per-group window — five
    priciest lineitems per return flag with row_number / rank /
    dense_rank / percent_rank / cume_dist / ntile(4) side by side
    (total order inside the partition via the (price, orderkey,
    linenumber) tiebreak, so every rank is hash-stable).

    Note percent_rank/cume_dist/ntile need the full partition ordered —
    fine per group (partitions parallelize), the same reason the
    global-order twin lives behind TakeOrdered top-k instead."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.select(
            "l_returnflag",
            F.col("l_orderkey").cast("bigint"),
            F.col("l_linenumber").cast("bigint"),
            round_port(F.col("l_extendedprice"), 6).alias("price"),
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            round_port(F.percent_rank().over(w), 6).alias("pct_rank"),
            round_port(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("l_returnflag", "rn")
    )
