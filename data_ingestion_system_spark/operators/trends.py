"""Trend and changepoint analytics over the daily event series.

The reference's monitor compares a run against the trailing-5 mean
(monitor.py:155-209) — a point check. These queries add the two series
diagnostics a monitoring surface actually needs:

* `daily_trend_slopes` — per-event-type least-squares trend of daily
  volume (closed-form: slope/intercept/R² from Σx, Σy, Σxy, Σx², Σy²).
  x is the integer day offset and y an integer count, so every sum is
  EXACT BIGINT arithmetic in both engines; floats appear only in the
  final divisions — no summation-order surface at all.
* `cusum_changepoint` — CUSUM shift detection: running sum of
  deviations from the series mean, reporting where |CUSUM| peaks (the
  classic level-shift locator). The running sum is windowed in day
  order — the same deterministic order in both engines.

Scale shape: one groupBy(event_type, day) pass (map-side combinable),
then per-type aggregates / a window over one row per (type, day) —
series-sized, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import oracle_round, round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

EPOCH_DAY = "2024-01-01"


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(EPOCH_DAY).cast("date")).alias("x"),
    ).agg(F.count("*").alias("y"))


_TREND_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{EPOCH_DAY}', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       {oracle_round("CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)", 6)} AS slope,
       {oracle_round(
           "(sy - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)) * sx) / n", 6)}
         AS intercept,
       {oracle_round(
           "CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)"
           " / ((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS r2
FROM s
ORDER BY event_type
"""


@query("daily_trend_slopes", oracle=_TREND_ORACLE, survey="EXT-monitoring,A17")
def daily_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares volume trend per event type: slope (events/day),
    intercept, and R² over the daily series — is this source growing,
    shrinking, and how linearly. All moment sums are exact BIGINT; the
    three output ratios are the only floats."""
    daily = _daily(spark, sf_dir)
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        round_port(slope, 6).alias("slope"),
        round_port((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
        round_port(
            num * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    ).orderBy("event_type")


_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{EPOCH_DAY}', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), m AS (
  SELECT event_type, CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mu FROM daily GROUP BY event_type
), c AS (
  SELECT d.event_type, d.x,
         SUM(d.y - m.mu) OVER (PARTITION BY d.event_type ORDER BY d.x
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily d JOIN m USING (event_type)
), ranked AS (
  SELECT event_type, x, cusum,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(cusum) DESC, x ASC) AS rn
  FROM c
)
SELECT event_type,
       CAST(x AS BIGINT) AS changepoint_day,
       {oracle_round("ABS(cusum)", 6)} AS max_abs_cusum,
       CASE WHEN cusum > 0 THEN 'above-mean-run' ELSE 'below-mean-run' END AS direction
FROM ranked WHERE rn = 1
ORDER BY event_type
"""


@query("cusum_changepoint", oracle=_CUSUM_ORACLE, survey="EXT-monitoring,T6")
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift locator per event type: the day where the
    running sum of deviations from the series mean peaks in magnitude —
    the most likely changepoint a volume shift hides behind. The mean
    is an exact BIGINT-sum ratio and the running sum accumulates in the
    same day order in both engines, so the peak is hash-stable."""
    daily = _daily(spark, sf_dir)
    m = daily.groupBy("event_type").agg(
        (F.sum("y").cast("double") / F.count("*")).alias("mu")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = daily.join(m, "event_type").withColumn(
        "cusum", F.sum(F.col("y") - F.col("mu")).over(w)
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), F.asc("x")
    )
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("x").cast("bigint").alias("changepoint_day"),
            round_port(F.abs(F.col("cusum")), 6).alias("max_abs_cusum"),
            F.when(F.col("cusum") > 0, "above-mean-run")
            .otherwise("below-mean-run")
            .alias("direction"),
        )
        .orderBy("event_type")
    )


_GROWTH_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{EPOCH_DAY}', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, CAST(x AS BIGINT) AS day_offset, CAST(y AS BIGINT) AS n,
       {oracle_round(
           "CASE WHEN LAG(y, 1) OVER w IS NOT NULL"
           " THEN CAST(y - LAG(y, 1) OVER w AS DOUBLE) / LAG(y, 1) OVER w END", 6)}
         AS dod_growth,
       {oracle_round(
           "CASE WHEN LAG(y, 7) OVER w IS NOT NULL"
           " THEN CAST(y - LAG(y, 7) OVER w AS DOUBLE) / LAG(y, 7) OVER w END", 6)}
         AS wow_growth
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY x)
ORDER BY event_type, x
"""


@query("daily_growth_rates", oracle=_GROWTH_ORACLE, survey="EXT-monitoring,A17")
def daily_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day and week-over-week growth per event type — the two
    deltas a volume dashboard headlines (`daily_trend_slopes` fits the
    long-run line; these are the short-horizon derivatives). LAG(7) is
    offset-based, so a calendar gap shows as NULL rather than silently
    comparing to the wrong week.

    Scale shape: one daily aggregate, two lags in one window frame."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("x")
    lag1 = F.lag("y", 1).over(w)
    lag7 = F.lag("y", 7).over(w)
    return (
        daily.select(
            "event_type",
            F.col("x").cast("bigint").alias("day_offset"),
            F.col("y").cast("bigint").alias("n"),
            round_port((F.col("y") - lag1).cast("double") / lag1, 6).alias(
                "dod_growth"
            ),
            round_port((F.col("y") - lag7).cast("double") / lag7, 6).alias(
                "wow_growth"
            ),
        )
        .orderBy("event_type", "day_offset")
    )


_NEW_USER_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), daily AS (
  SELECT CAST(e.ts AS DATE) AS day,
         COUNT(*) AS n_events,
         SUM(CASE WHEN CAST(e.ts AS DATE) = f.first_day THEN 1 ELSE 0 END)
           AS events_from_new,
         COUNT(DISTINCT CASE WHEN CAST(e.ts AS DATE) = f.first_day
                             THEN e.user_id END) AS n_new_users
  FROM events e JOIN first_seen f USING (user_id)
  GROUP BY CAST(e.ts AS DATE)
)
SELECT day, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_new_users AS BIGINT) AS n_new_users,
       ROUND(CAST(events_from_new AS DOUBLE) / n_events * 1000000.0) / 1000000.0
         AS new_user_event_share
FROM daily ORDER BY day
"""


@query("new_user_share", oracle=_NEW_USER_ORACLE, survey="EXT-monitoring,A2")
def new_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day cold-start profile: users seen for the first time and the
    share of the day's events they generate — a growth/bot dashboard
    split (`cohort_retention` tracks them after; this is day zero).

    Scale shape: first-seen is one groupBy(user) aggregate joined back
    on user_id; everything after is a daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    joined = ev.join(first_seen, "user_id").select(
        F.to_date("ts").alias("day"),
        "user_id",
        (F.to_date("ts") == F.col("first_day")).alias("is_new"),
    )
    return (
        joined.groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct(F.when(F.col("is_new"), F.col("user_id")))
            .cast("bigint")
            .alias("n_new_users"),
            round_port(
                F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("new_user_event_share"),
        )
        .orderBy("day")
    )
