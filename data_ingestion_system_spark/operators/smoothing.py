"""Exponentially-weighted smoothing over the daily event series.

The reference's monitor compares today against the trailing-5-run MEAN
(src/scheduler/monitor.py:155-209) — a boxcar that weights a 5-day-old
run the same as yesterday. The standard upgrade is the EWMA: weight
w_k = alpha * (1-alpha)^k on the k-days-ago count, which reacts faster
to level shifts while still damping noise.

The recursion y_t = alpha*x_t + (1-alpha)*y_{t-1} is deliberately
unrolled into its 20-term truncated closed form

    y_t = alpha * SUM_{k=0..19} (1-alpha)^k * x_{t-k}

because the truncated form is (a) oracle-expressible as a bounded
range self-join on the DAILY AGGREGATE (series-sized, never
event-sized), and (b) shift-invariant: the tail beyond 20 days
carries weight (1-alpha)^20 < 0.1% at alpha=0.3 — below the 1e-6
output rounding. Missing days contribute zero, matching a
calendar-aware EWMA over a gappy series.

Scale shape: one map-side-combinable groupBy(event_type, day) over
events, then a bounded (20-row-band) self-join on the tiny daily
aggregate. The smoothing cost is O(types x days x 20) regardless of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import oracle_round, round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

EPOCH_DAY = "2024-01-01"
ALPHA = 0.3
WINDOW_DAYS = 20  # (1-alpha)^20 ≈ 8e-4: below output rounding

_EWMA_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{EPOCH_DAY}', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT t.event_type,
       CAST(t.x AS BIGINT) AS day_offset,
       CAST(t.y AS BIGINT) AS daily_count,
       {oracle_round(
           f"{ALPHA} * SUM(s.y * POWER({1 - ALPHA}, t.x - s.x))", 6)} AS ewma
FROM daily t
JOIN daily s ON s.event_type = t.event_type
            AND t.x - s.x >= 0 AND t.x - s.x < {WINDOW_DAYS}
GROUP BY t.event_type, t.x, t.y
ORDER BY t.event_type, t.x
"""


@query("ewma_daily_volume", oracle=_EWMA_ORACLE, survey="EXT-monitoring,A17,W6")
def ewma_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily volume per event type (alpha=0.3, 20-day
    truncated kernel): the trailing-mean upgrade that weights recent
    days geometrically more — the series a level-shift alarm should
    threshold on instead of the raw count."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(EPOCH_DAY).cast("date")).alias("x"),
    ).agg(F.count("*").alias("y"))
    s = daily.select(
        F.col("event_type"),
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
    )
    lag = F.col("x") - F.col("sx")
    return (
        daily.join(s, "event_type")
        .filter((lag >= 0) & (lag < WINDOW_DAYS))
        .groupBy("event_type", "x", "y")
        .agg(
            round_port(
                F.lit(ALPHA) * F.sum(F.col("sy") * F.pow(F.lit(1 - ALPHA), lag)),
                6,
            ).alias("ewma")
        )
        .select(
            "event_type",
            F.col("x").cast("bigint").alias("day_offset"),
            F.col("y").cast("bigint").alias("daily_count"),
            "ewma",
        )
        .orderBy("event_type", "day_offset")
    )
