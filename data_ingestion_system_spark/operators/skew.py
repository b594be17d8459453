"""Skew-handling utilities — the 100 TB posture for hot keys (SURVEY §7.2 Stage 6).

The reference's corpus is visibly skewed (app volume max/min > 2×,
reference: src/analysis/data_quality_analyzer.py:336-341; at scale a hot
app_id dominates its shuffle partition). Primary defense is AQE skew-join
splitting (enabled in session.py); these helpers cover the cases AQE
doesn't: high-cardinality aggregation on a hot key and non-broadcastable
skewed joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query


def salted_agg_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-stage salted count: stage 1 aggregates (key, salt) — spreading
    a hot key over `n_salts` reducers — stage 2 merges the partials.
    Result-identical to `df.groupBy(key).count()`.

    The salt is derived from a per-row deterministic hash (no rand():
    reproducible under retries and partition changes)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("_salt")
    stage1 = df.groupBy(F.col(key), salt).agg(F.count("*").alias("_partial"))
    return stage1.groupBy(key).agg(F.sum("_partial").alias("count"))


def salted_join_skew_side(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Salted equi-join for a skewed big side when the small side is too
    large to broadcast: big rows get a deterministic salt in [0, n_salts);
    small rows are replicated n_salts times; join on (key, salt). One
    hot key fans out over n_salts reducers.

    Inner-join semantics; result-identical to big.join(small, key)."""
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(small_replicated, [key, "_salt"])
    return joined.drop("_salt")


# ---------------------------------------------------------------------------
# Join-key skew profiling — the diagnostic that decides whether the
# salting machinery above (or AQE skew-join) is needed for a key.
# ---------------------------------------------------------------------------

_SKEW_COLUMNS = [
    ("events", "user_id"),
    ("events", "event_type"),
    ("lineitem", "l_suppkey"),
]


def _one_profile_sql(table: str, col: str) -> str:
    return f"""
  SELECT '{table}.{col}' AS join_key,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         ROUND(MAX(c) * 1.0 / SUM(c) * 1000000.0) / 1000000.0 AS top1_share,
         ROUND(SUM(CASE WHEN rn <= 5 THEN c ELSE 0 END) * 1.0 / SUM(c) * 1000000.0)
           / 1000000.0 AS top5_share,
         ROUND(SUM(p * p) * 1000000.0) / 1000000.0 AS hhi
  FROM (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, k ASC) AS rn,
           c * 1.0 / SUM(c) OVER () AS p
    FROM (SELECT CAST({col} AS VARCHAR) AS k, COUNT(*) AS c FROM {table} GROUP BY {col}) g
  ) r
"""


_SKEW_ORACLE = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(_one_profile_sql(t, c) for t, c in _SKEW_COLUMNS)
    + "\n) u ORDER BY join_key"
)


@query("join_key_skew_profile", oracle=_SKEW_ORACLE, survey="EXT-scale,A6")
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration profile of candidate join/aggregation keys:
    distinct count, top-1/top-5 key share, and the Herfindahl index of
    the key distribution — the numbers that decide between a plain
    hash join, AQE skew splitting, and explicit salting
    (`salted_join_skew_side` above). One groupBy per key column over a
    key-count relation; the share/HHI math runs on the (small) count
    table, never the fact table."""
    from data_ingestion_system_spark.functions.scalar import round_port
    from data_ingestion_system_spark.tables import load_table

    outs = []
    for table, col in _SKEW_COLUMNS:
        counts = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).cast("string").alias("k"))
            .agg(F.count("*").alias("c"))
        )
        w = Window.orderBy(F.desc("c"), F.asc("k"))
        wall = Window.partitionBy()
        r = counts.select(
            "c",
            F.row_number().over(w).alias("rn"),
            (F.col("c") * 1.0 / F.sum("c").over(wall)).alias("p"),
        )
        outs.append(
            r.agg(
                F.lit(f"{table}.{col}").alias("join_key"),
                F.count("*").cast("bigint").alias("n_distinct"),
                F.sum("c").cast("bigint").alias("n_rows"),
                round_port(F.max("c") * 1.0 / F.sum("c"), 6).alias("top1_share"),
                round_port(
                    F.sum(F.when(F.col("rn") <= 5, F.col("c")).otherwise(0))
                    * 1.0
                    / F.sum("c"),
                    6,
                ).alias("top5_share"),
                round_port(F.sum(F.col("p") * F.col("p")), 6).alias("hhi"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("join_key")
