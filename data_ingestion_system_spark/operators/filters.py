"""Projection / filter / predicate operators — SURVEY.md §2.2 (P1–P8, P11).

The reference's flagship read path is `get_reviews`, a dynamic conjunctive
filter builder over non-None arguments with ORDER BY + LIMIT/OFFSET
(reference: src/database/db_manager.py:331-394). Here the same shape is a
conditionally-chained `df.filter(...)` pipeline — Catalyst pushes every
predicate into the parquet scan (check `.explain`: PushedFilters) and the
sort+limit compiles to TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


def get_lineitems(
    df: DataFrame,
    *,
    returnflag: str | None = None,
    min_quantity: float | None = None,
    max_quantity: float | None = None,
    has_discount: bool | None = None,
    min_price: float | None = None,
    limit: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """Dynamic conjunctive filter builder (P1) — the engine's library
    equivalent of `DatabaseManager.get_reviews` (db_manager.py:331-394):
    each non-None argument appends one predicate; result ordered newest
    first with a total-order tiebreaker (SURVEY §4.2.4) then paginated.
    """
    conds: list[Column] = []
    if returnflag is not None:
        conds.append(F.col("l_returnflag") == returnflag)  # P2 equality
    if min_quantity is not None:
        conds.append(F.col("l_quantity") >= min_quantity)  # P2 range
    if max_quantity is not None:
        conds.append(F.col("l_quantity") <= max_quantity)
    if has_discount is not None:  # P3 tri-state presence (NULL-aware)
        d = F.nullif(F.col("l_discount"), F.lit(0.0))
        conds.append(d.isNotNull() if has_discount else d.isNull())
    if min_price is not None:  # P4 computed-expression predicate
        conds.append((F.col("l_extendedprice") * (1 - F.col("l_discount"))) >= min_price)
    for c in conds:
        df = df.filter(c)
    df = df.orderBy(
        F.desc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df


@query(
    "dynamic_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount,
       l_extendedprice, l_shipdate
FROM lineitem
WHERE l_returnflag = 'R'
  AND l_quantity >= 10
  AND l_quantity <= 45
  AND l_discount <> 0
  AND l_extendedprice * (1 - l_discount) >= 1000
ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 50 OFFSET 100
""",
    survey="P1,P2,P3,P4,W1,O2",
)
def dynamic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 builder exercised with every predicate kind + LIMIT/OFFSET
    pagination (db_manager.py:383-391)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_discount", "l_extendedprice", "l_shipdate",
    )
    return get_lineitems(
        li, returnflag="R", min_quantity=10, max_quantity=45,
        has_discount=True, min_price=1000, limit=50, offset=100,
    )


@query(
    "like_search",
    oracle="""
SELECT doc_id, n_chars
FROM documents
WHERE text LIKE '%spark join%'
ORDER BY n_chars DESC, doc_id ASC
LIMIT 20
""",
    survey="P5,W2",
)
def like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring search ordered by a popularity proxy
    (`search_reviews`, db_manager.py:438-460). LIKE '%q%' cannot use an
    index in SQLite either; at scale the engine's extension path is the
    tokenized inverted index in text.analysis."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").contains("spark join"))
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "case_projection",
    oracle="""
SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_bucket,
       COUNT(*) AS n,
       ROUND(AVG(o_totalprice) * 100.0) / 100.0 AS avg_price
FROM orders
GROUP BY 1
ORDER BY price_bucket
""",
    survey="P6",
)
def case_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column CASE ladder — the sentiment-bucket pattern
    (schema.sql:219-226) applied to order value."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return (
        orders.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count("*").alias("n"),
            round_port(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("price_bucket")
    )


@query(
    "length_buckets",
    oracle="""
SELECT CASE WHEN n_chars <= 10 THEN 'very_short'
            WHEN n_chars <= 50 THEN 'short'
            WHEN n_chars <= 200 THEN 'medium'
            ELSE 'long' END AS length_bucket,
       COUNT(*) AS n
FROM documents
GROUP BY 1
ORDER BY length_bucket
""",
    survey="P7",
)
def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketization CASE ladder (schema.sql:227-232) over document length."""
    from data_ingestion_system_spark.functions.scalar import length_bucket

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(length_bucket(F.col("n_chars")).alias("length_bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("length_bucket")
    )


@query(
    "projection_rename",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       p_name AS part_name, p_brand AS part_brand,
       o_orderpriority AS priority
FROM lineitem
JOIN part   ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey < 500
ORDER BY l_orderkey, l_linenumber
""",
    survey="P8,J1",
)
def projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide projection with renames — the `v_reviews_with_app` shape
    (schema.sql:209-216): fact columns + aliased dim columns."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("part_brand"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "ordered_enum_filter",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY event_type
ORDER BY event_type
""",
    survey="P11",
)
def ordered_enum_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-enum threshold filter (db_manager.py:887-905): the valid
    subset is derived from a rank map (high<medium<low), then applied as
    an IN-list."""
    rank = {"view": 0, "click": 1, "signup": 2, "purchase": 3, "error": -1}
    allowed = [k for k, v in rank.items() if v >= 2]
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type").isin(sorted(allowed)))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )
