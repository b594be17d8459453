"""Join operators — SURVEY.md §2.3 (J1–J10).

All reference joins are equi-joins (one with an extra theta condition);
they appear in SQLite views, in IN-list lookups chunked to 900 ids
(reference: src/database/db_manager.py:466-486), and as N+1 per-row
lookups (db_manager.py:674-691). Spark-first mapping:

- dimension joins → explicit `broadcast()` (no shuffle of the fact side)
- IN-list membership → left_semi join (no chunking, no variable limits)
- LEFT JOIN ... IS NULL → left_anti join
- N+1 loops → one set-based multi-join
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


@query(
    "join_enrich",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderstatus,
       c_name AS customer_name, c_mktsegment AS segment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 400000
ORDER BY o_orderkey
""",
    survey="J1,P8",
)
def join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join enriching facts with dimension attributes — the
    `v_reviews_with_app` join (schema.sql:209-216). Customer is broadcast:
    at 100 TB the fact side never shuffles for a dim lookup."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "o_orderkey",
            "o_totalprice",
            "o_orderstatus",
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "join_4way",
    oracle="""
SELECT n_name, c_mktsegment,
       COUNT(*) AS n_lineitems,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100.0) / 100.0 AS revenue,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
ORDER BY n_name, c_mktsegment
""",
    survey="J2",
)
def join_4way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way inner equi-join with computed columns — the
    `v_labeled_reviews` shape (schema.sql:375-404): fact ⋈ fact ⋈ dim ⋈ dim
    plus a CASE-derived flag, aggregated.

    Plan shape: lineitem⋈orders shuffles on orderkey (both large);
    customer and nation broadcast onto the result — one shuffle total
    before the final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_lineitems"),
            round_port(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


@query(
    "self_join_theta",
    oracle="""
SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b, COUNT(*) AS n_pairs
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
GROUP BY a.l_returnflag, b.l_returnflag
ORDER BY flag_a, flag_b
""",
    survey="J3",
)
def self_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with an inequality pair-dedup condition — the
    annotator-agreement pair join (db_manager.py:869-885):
    equi key hash-joined, `<` applied as a post-join filter."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .groupBy(
            F.col("a.l_returnflag").alias("flag_a"),
            F.col("b.l_returnflag").alias("flag_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("flag_a", "flag_b")
    )


@query(
    "left_join_coverage",
    oracle="""
SELECT n_name,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(DISTINCT o_custkey) AS n_customers_with_orders
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    survey="J4",
)
def left_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + COUNT(DISTINCT) coverage ratio — per-app labeling
    coverage (db_manager.py:833-842)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("o_custkey").alias("n_customers_with_orders"),
        )
        .orderBy("n_name")
    )


@query(
    "anti_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
""",
    survey="J5,J7",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the backfill LEFT-JOIN-NULL idiom (monitor.py:520-532)
    and the pipeline's Python-set dedup (pipeline.py:201-207), both as
    one `left_anti`."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "semi_join",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 40)
GROUP BY p_brand
ORDER BY p_brand
""",
    survey="J6",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join membership — `get_existing_review_ids` IN-list lookup
    (db_manager.py:466-486). The reference chunks ids ×900 around SQLite's
    variable limit; left_semi needs no chunking at any scale."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select("l_partkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


@query(
    "run_scoped_join",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_items,
       ROUND(SUM(l_quantity) * 100.0) / 100.0 AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    survey="J8,J9",
)
def run_scoped_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-scoped subset join + group (monitor.py:216-229, :558-565):
    facts joined to a filtered slice, then aggregated. The date filter is
    pushed below the join (Catalyst), pruning the orders side first."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            round_port(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "context_multi_join",
    oracle="""
SELECT p_partkey, p_name, s_name AS supplier_name, n_name AS supplier_nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100.0) / 100.0 AS revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY p_partkey, p_name, s_name, n_name
ORDER BY revenue DESC, p_partkey ASC
LIMIT 25
""",
    survey="J10,W2",
)
def context_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based replacement for the reference's N+1 one-row-at-a-time
    context lookups (db_manager.py:674-691): a single plan joining the
    fact to all its dimensions, aggregated, top-k by revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("p_partkey", "p_name", F.col("s_name").alias("supplier_name"), F.col("n_name").alias("supplier_nation"))
        .agg(round_port(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(25)
    )


_REVENUE_ROLLUP_ORACLE = """
WITH base AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
         l.l_extendedprice * (1 - l.l_discount) AS revenue
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
)
SELECT region, nation, order_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(revenue) * 100.0) / 100.0 AS revenue,
       CAST(GROUPING(nation) AS INTEGER) AS g_nation,
       CAST(GROUPING(order_year) AS INTEGER) AS g_year
FROM base
GROUP BY ROLLUP (region, nation, order_year)
HAVING GROUPING(region) = 0
ORDER BY region, g_nation, nation NULLS FIRST, g_year, order_year NULLS FIRST
"""


@query("revenue_rollup_nation_year", oracle=_REVENUE_ROLLUP_ORACLE, survey="J2,A2,A6-cube")
def revenue_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table revenue ROLLUP region -> nation -> year: the widest
    relational shape in the catalog (fact x 4 dims, all dims broadcast)
    with hierarchy subtotals from ONE pass — year rows, nation
    subtotals, region totals, GROUPING() flags separating levels.
    Revenue sums are rounded at cents (the discount product is the only
    float; its per-level sums agree across engines at 1e-2 because each
    leaf value is an exact-decimal-times-discount double).

    Scale shape: lineitem shuffles once for the rollup aggregate;
    orders joins on the fact key. nation/region carry explicit broadcast
    hints (bounded at 25/5 rows at every scale); customer deliberately
    does NOT — it is customer-count-sized, so the right physical join
    flips from broadcast (small SF: AQE still picks broadcast from
    stats) to shuffle (100 TB: a forced broadcast hint would OOM the
    executors), and the hint must not pin the small-scale choice."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )
    out = (
        base.rollup("region", "nation", "order_year")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            (F.round(F.sum("revenue") * 100.0) / 100.0).alias("revenue"),
            F.grouping("nation").cast("int").alias("g_nation"),
            F.grouping("order_year").cast("int").alias("g_year"),
        )
        .filter(F.grouping("region") == 0)
    )
    return out.select(
        "region", "nation", "order_year", "n_items", "revenue", "g_nation", "g_year"
    ).orderBy(
        "region",
        "g_nation",
        F.col("nation").asc_nulls_first(),
        "g_year",
        F.col("order_year").asc_nulls_first(),
    )


_BRAND_SHARE_ORACLE = """
WITH rev AS (
  SELECT p.p_brand AS brand,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
         COUNT(*) AS n_items
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
), tot AS (SELECT SUM(revenue) AS t FROM rev)
SELECT brand,
       CAST(n_items AS BIGINT) AS n_items,
       ROUND(revenue * 100.0) / 100.0 AS revenue,
       ROUND(revenue / t.t * 1000000.0) / 1000000.0 AS revenue_share,
       CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, brand ASC) AS BIGINT)
         AS revenue_rank
FROM rev, tot t
ORDER BY revenue_rank
"""


@query("brand_revenue_share", oracle=_BRAND_SHARE_ORACLE, survey="J1,A16")
def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share by part brand: discounted revenue, share of total,
    and rank — the part-dimension rollup (fact x part broadcast join,
    share against a 1-row broadcast total). The brand window is
    brand-count-sized, never corpus-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            (F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_raw"
            ),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )
    tot = rev.agg(F.sum("revenue_raw").alias("t"))
    w = Window.orderBy(F.desc("revenue_raw"), F.asc("brand"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(
            "brand",
            "n_items",
            (F.round(F.col("revenue_raw") * 100.0) / 100.0).alias("revenue"),
            (F.round(F.col("revenue_raw") / F.col("t") * 1000000.0) / 1000000.0)
            .alias("revenue_share"),
            F.row_number().over(w).cast("bigint").alias("revenue_rank"),
        )
        .orderBy("revenue_rank")
    )


_HHI_ORACLE = """
WITH srev AS (
  SELECT n.n_name AS nation, l.l_suppkey,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name, l.l_suppkey
), ntot AS (
  SELECT nation, SUM(revenue) AS t, COUNT(*) AS n_suppliers FROM srev
  GROUP BY nation
)
SELECT s.nation,
       CAST(MAX(t.n_suppliers) AS BIGINT) AS n_suppliers,
       ROUND(SUM(POWER(s.revenue / t.t, 2)) * 1000000.0) / 1000000.0 AS hhi,
       ROUND(MAX(s.revenue / t.t) * 1000000.0) / 1000000.0 AS top_supplier_share
FROM srev s JOIN ntot t USING (nation)
GROUP BY s.nation
ORDER BY s.nation
"""


@query("supplier_concentration_hhi", oracle=_HHI_ORACLE, survey="J2,A16")
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per nation: the Herfindahl-Hirschman index
    (sum of squared revenue shares; 1/n_suppliers = perfectly even,
    1.0 = monopoly) plus the top supplier's share — the supply-risk
    readout over the supplier dimension. One fact shuffle on
    (nation, suppkey); everything after is supplier-count-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    srev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    ntot = srev.groupBy("nation").agg(
        F.sum("revenue").alias("t"), F.count("*").alias("n_suppliers")
    )
    share = F.col("revenue") / F.col("t")
    return (
        srev.join(F.broadcast(ntot), "nation")
        .groupBy("nation")
        .agg(
            F.max("n_suppliers").cast("bigint").alias("n_suppliers"),
            (F.round(F.sum(F.pow(share, F.lit(2))) * 1000000.0) / 1000000.0)
            .alias("hhi"),
            (F.round(F.max(share) * 1000000.0) / 1000000.0).alias(
                "top_supplier_share"
            ),
        )
        .orderBy("nation")
    )


_SHIP_DELAY_ORACLE = """
WITH d AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(AVG(CAST(delay_days AS DOUBLE)) * 1000000.0) / 1000000.0
         AS mean_delay_days,
       ROUND(quantile_cont(delay_days, 0.50) * 1000000.0) / 1000000.0 AS p50,
       ROUND(quantile_cont(delay_days, 0.95) * 1000000.0) / 1000000.0 AS p95,
       CAST(SUM(CASE WHEN delay_days > 60 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_60d
FROM d GROUP BY priority ORDER BY priority
"""


@query("shipping_delay_profile", oracle=_SHIP_DELAY_ORACLE, survey="J1,A10,scalar-date")
def shipping_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency by priority: mean, exact p50/p95, and the
    over-60-day tail count — the SLA table that tells whether 'urgent'
    orders actually ship faster. Day diffs are exact integers; the
    per-priority percentile buffer holds one int per item within the
    group (the sketch-refine grouped twin is the 100-TB path, same as
    the other exact-percentile queries)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
    )
    out = d.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n_items"),
        (F.round(F.avg(F.col("delay_days").cast("double")) * 1000000.0) / 1000000.0)
        .alias("mean_delay_days"),
        F.expr("percentile(delay_days, array(0.50, 0.95))").alias("ps"),
        F.sum(F.when(F.col("delay_days") > 60, 1).otherwise(0))
        .cast("bigint")
        .alias("n_over_60d"),
    )
    return out.select(
        "priority",
        "n_items",
        "mean_delay_days",
        (F.round(F.col("ps")[0] * 1000000.0) / 1000000.0).alias("p50"),
        (F.round(F.col("ps")[1] * 1000000.0) / 1000000.0).alias("p95"),
        "n_over_60d",
    ).orderBy("priority")


_RFM_ORACLE = """
WITH anchor AS (
  SELECT MAX(o_orderdate) AS max_d FROM orders
), cust AS (
  SELECT o.o_custkey AS custkey,
         date_diff('day', MAX(o.o_orderdate), a.max_d) AS recency_days,
         COUNT(*) AS frequency,
         SUM(o.o_totalprice) AS monetary
  FROM orders o CROSS JOIN anchor a
  GROUP BY o.o_custkey, a.max_d
), scored AS (
  SELECT custkey,
         NTILE(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS r_quartile,
         NTILE(4) OVER (ORDER BY frequency DESC, custkey ASC) AS f_quartile,
         NTILE(4) OVER (ORDER BY monetary DESC, custkey ASC) AS m_quartile
  FROM cust
)
SELECT CAST(r_quartile AS INTEGER) AS r_quartile,
       CAST(f_quartile AS INTEGER) AS f_quartile,
       CAST(m_quartile AS INTEGER) AS m_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY r_quartile, f_quartile, m_quartile
ORDER BY r_quartile, f_quartile, m_quartile
"""


@query("customer_rfm_segments", oracle=_RFM_ORACLE, survey="J4,A16,W4")
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles per
    customer (custkey tiebreaks make every NTILE deterministic), rolled
    up to segment-cell counts — the 64-cell customer-value map CRM
    pipelines start from.

    Scale note: the NTILE runs over the CUSTOMER aggregate (dimension-
    sized, one row per customer), not the fact table; at 100 TB the
    equivalent scale path is quartile cut points from
    `sketch_refine_percentiles` + a bucket join, the same swap
    `equi_depth_buckets_approx` demonstrates."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("max_d"))
    cust = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("custkey"), "max_d")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count("*").alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .select(
            "custkey",
            F.datediff("max_d", "last_d").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("custkey"))
    w_m = Window.orderBy(F.desc("monetary"), F.asc("custkey"))
    scored = cust.select(
        F.ntile(4).over(w_r).alias("r_quartile"),
        F.ntile(4).over(w_f).alias("f_quartile"),
        F.ntile(4).over(w_m).alias("m_quartile"),
    )
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


_SEGMENT_MIX_ORACLE = """
WITH m AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         COUNT(*) AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
), tot AS (
  SELECT segment, SUM(n) AS t FROM m GROUP BY segment
)
SELECT m.segment, m.priority, CAST(m.n AS BIGINT) AS n_orders,
       ROUND(CAST(m.n AS DOUBLE) / t.t * 1000000.0) / 1000000.0 AS share
FROM m JOIN tot t USING (segment)
ORDER BY m.segment, m.priority
"""


@query("segment_priority_mix", oracle=_SEGMENT_MIX_ORACLE, survey="J1,A3,A16")
def segment_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix within each market segment (within-segment
    shares summing to 1): do BUILDING customers place more URGENT
    orders than MACHINERY — the normalized composition view the raw
    pivot counts don't give."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("segment")
    return (
        m.select(
            "segment",
            "priority",
            F.col("n").cast("bigint").alias("n_orders"),
            (F.round(F.col("n").cast("double") / F.sum("n").over(w) * 1000000.0)
             / 1000000.0).alias("share"),
        )
        .orderBy("segment", "priority")
    )


_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n_orders AS (
  SELECT COUNT(DISTINCT okey) AS n FROM items
), brand_n AS (
  SELECT brand, COUNT(*) AS nb FROM items GROUP BY brand
), pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_together
  FROM items a JOIN items b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT p.brand_a, p.brand_b,
       CAST(p.n_together AS BIGINT) AS n_together,
       ROUND(CAST(p.n_together AS DOUBLE) * t.n / (na.nb * nb.nb)
             * 1000000.0) / 1000000.0 AS lift
FROM pairs p
JOIN brand_n na ON na.brand = p.brand_a
JOIN brand_n nb ON nb.brand = p.brand_b
CROSS JOIN n_orders t
WHERE p.n_together >= 5
ORDER BY lift DESC, p.brand_a, p.brand_b
LIMIT 50
"""


@query("brand_basket_lift", oracle=_BASKET_ORACLE, survey="J3,A6,EXT-similarity")
def brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis over orders: brand pairs bought together
    with lift = P(a,b)/(P(a)·P(b)) — the relational twin of
    `token_cooccurrence`'s within-document pairs. Support floor (5
    co-orders) plays the Apriori prefilter role; the pair self-join is
    keyed on orderkey, so per-order work is items-per-order squared
    (single digits), never corpus-quadratic; top-50 compiles to
    TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    items = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = items.agg(F.countDistinct("okey").alias("n"))
    brand_n = items.groupBy("brand").agg(F.count("*").alias("nb"))
    b = items.select("okey", F.col("brand").alias("brand_b"))
    pairs = (
        items.join(b, "okey")
        .filter(F.col("brand") < F.col("brand_b"))
        .groupBy(F.col("brand").alias("brand_a"), "brand_b")
        .agg(F.count("*").alias("n_together"))
        .filter(F.col("n_together") >= 5)
    )
    na = brand_n.select(F.col("brand").alias("brand_a"), F.col("nb").alias("na_n"))
    nb = brand_n.select(F.col("brand").alias("brand_b"), F.col("nb").alias("nb_n"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_together").cast("bigint"),
            (
                F.round(
                    F.col("n_together").cast("double")
                    * F.col("n")
                    / (F.col("na_n") * F.col("nb_n"))
                    * 1000000.0
                )
                / 1000000.0
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(50)
    )
