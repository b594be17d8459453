"""Differentially-private aggregate release — the privacy tier above
PII redaction (text/pii.py) and right-to-be-forgotten erasure
(streaming/forget.py).

A corpus owner who publishes per-slice statistics (the data card,
monitoring counts) leaks membership signal; the standard fix is the
Laplace mechanism (Dwork et al. 2006): release count + Laplace(Δ/ε)
noise, with sensitivity Δ=1 for counting queries. This module releases
noised GROUP BY counts with a *seeded, engine-portable* noise draw:
u ~ (0,1) comes from the md5-derived 52-bit uniform (scalar.u52_terms_sql,
keyed per group), and Laplace noise is the inverse-CDF transform
-b·sign(u-½)·ln(1-2|u-½|). Seeded noise is how DP releases are made
reproducible for audit (the per-release seed is the secret); here it
also makes the query hash-checkable against the DuckDB oracle.

Scale shape: one aggregation (map-side combinable) then per-row noise
expressions over the tiny grouped result — the noise never touches the
fact table. No UDFs; ln/abs are the only float surface, rounded to the
repo's 6-decimal contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import (
    U52_DENOM,
    U52_SPARK_SQL,
    oracle_round,
    round_port,
    u52_terms_sql,
)
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

EPSILON = 1.0  # privacy budget per released statistic
DP_SEED = 31  # per-release seed — rotate per publication in production


def laplace_noise(u: F.Column, scale_b: float) -> F.Column:
    """Inverse-CDF Laplace(0, b) from a uniform u in (0,1)."""
    centered = u - F.lit(0.5)
    return (
        F.lit(-scale_b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def _noise_sql(scale_b: float) -> str:
    """DuckDB rendering over a column named ``u``."""
    return (
        f"(-{scale_b}) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))"
    )


_DP_ORACLE = f"""
WITH counts AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), keyed AS (
  SELECT event_type, day, n,
         md5(concat('{DP_SEED}:', event_type, ':', CAST(day AS VARCHAR))) AS h
  FROM counts
), uni AS (
  SELECT event_type, day, n,
         ({u52_terms_sql("strpos")} + 0.5) / {U52_DENOM} AS u
  FROM keyed
)
SELECT event_type, day,
       {oracle_round(f"GREATEST(n + {_noise_sql(1.0 / EPSILON)}, 0.0)", 6)}
         AS released_count
FROM uni
ORDER BY event_type, day
"""


@query("dp_daily_counts", oracle=_DP_ORACLE, survey="EXT-privacy,A2")
def dp_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 differentially-private daily event counts: exact GROUP BY
    counts plus seeded Laplace(1/ε) noise per (event_type, day) cell,
    clamped at zero — the publishable twin of `daily_stats`. True counts
    never leave the engine; only the noised column is selected."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    keyed = counts.withColumn(
        "h",
        F.md5(
            F.concat(
                F.lit(f"{DP_SEED}:"),
                F.col("event_type"),
                F.lit(":"),
                F.col("day").cast("string"),
            )
        ),
    )
    uni = keyed.withColumn(
        "u", F.expr(f"({U52_SPARK_SQL} + 0.5) / {U52_DENOM}")
    )
    released = F.greatest(
        F.col("n") + laplace_noise(F.col("u"), 1.0 / EPSILON), F.lit(0.0)
    )
    return (
        uni.select(
            "event_type",
            "day",
            round_port(released, 6).alias("released_count"),
        )
        .orderBy("event_type", "day")
    )
