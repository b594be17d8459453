"""Monitoring analytics — SURVEY.md §2.8 T5–T7 and §2.4 A17 (batch side).

The reference's IngestionMonitor loads run history into Python and loops
to compute deltas, z-scores, and six anomaly rules
(reference: src/ingestion/monitor.py:155-209, :276-389; thresholds :72-78).
Here the run history is a (tiny) aggregate of the event stream and every
rule is a window-function predicate — the same code runs over a metrics
table with billions of run rows. The streaming half (per-batch audit
rows) lives in data_ingestion_system_spark.streaming.ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

# thresholds mirroring monitor.py:72-78
INSERT_DROP_FACTOR = 0.5  # alert if inserts < 50% of last-5 average
DURATION_SPIKE_FACTOR = 2.0
ZSCORE_ALERT = 2.0


@query(
    "anomaly_flags",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM events
  GROUP BY CAST(ts AS DATE)
), windowed AS (
  SELECT day, n_events, n_errors,
    AVG(CAST(n_events AS DOUBLE)) OVER w5 AS avg5,
    STDDEV_SAMP(CAST(n_events AS DOUBLE)) OVER w5 AS std5
  FROM daily
  WINDOW w5 AS (ORDER BY day ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
)
SELECT day, n_events, n_errors,
  COALESCE(n_events < 0.5 * avg5, FALSE) AS flag_volume_drop,
  COALESCE(std5 > 0 AND ABS((n_events - avg5) / std5) > 2.0, FALSE) AS flag_zscore,
  n_errors > 0 AS flag_any_error,
  ROUND(COALESCE((n_events - avg5) / NULLIF(std5, 0), 0.0) * 10000.0) / 10000.0 AS zscore
FROM windowed
ORDER BY day
""",
    survey="T6,A17,W6",
)
def anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The six anomaly rules (monitor.py:276-389) re-expressed as window
    predicates over the daily series: volume drop vs last-5 mean, z-score
    breach, any-error flag. No Python loop — the whole rule battery is
    one windowed projection."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
    )
    w5 = Window.orderBy("day").rowsBetween(-5, -1)
    n = F.col("n_events").cast("double")
    windowed = daily.select(
        "day",
        "n_events",
        "n_errors",
        F.avg(n).over(w5).alias("avg5"),
        F.stddev_samp(n).over(w5).alias("std5"),
    )
    z = (F.col("n_events") - F.col("avg5")) / F.nullif(F.col("std5"), F.lit(0.0))
    return windowed.select(
        "day",
        "n_events",
        "n_errors",
        F.coalesce(
            F.col("n_events") < INSERT_DROP_FACTOR * F.col("avg5"), F.lit(False)
        ).alias("flag_volume_drop"),
        F.coalesce(
            (F.col("std5") > 0) & (F.abs(z) > ZSCORE_ALERT), F.lit(False)
        ).alias("flag_zscore"),
        (F.col("n_errors") > 0).alias("flag_any_error"),
        round_port(F.coalesce(z, F.lit(0.0)), 4).alias("zscore"),
    ).orderBy("day")


@query(
    "backfill_missing_days",
    oracle="""
WITH bounds AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0, CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders
), calendar AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds
), present AS (
  SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders
)
SELECT COUNT(*) AS n_missing_days,
       MIN(c.day) AS first_missing,
       MAX(c.day) AS last_missing
FROM calendar c
LEFT JOIN present p ON c.day = p.day
WHERE p.day IS NULL
""",
    survey="T7,J5",
)
def backfill_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill detection (monitor.py:510-611): construct the full
    calendar, anti-join the days that have data — the set to reprocess.
    Calendar generation is `sequence`+explode; no driver loop."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.to_date(F.min("o_orderdate")).alias("d0"),
        F.to_date(F.max("o_orderdate")).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    present = orders.select(F.to_date("o_orderdate").alias("day")).distinct()
    missing = calendar.join(present, "day", "left_anti")
    return missing.agg(
        F.count("*").alias("n_missing_days"),
        F.min("day").alias("first_missing"),
        F.max("day").alias("last_missing"),
    )


@query(
    "approx_percentiles",
    oracle=None,  # t-digest/GK sketches are engine-specific — rows-only;
    # the exact twin `exact_percentiles` is the hash-matched one
    survey="A10",
)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx — the 100 TB twin of `exact_percentiles`: the
    exact version holds per-group value buffers (ObjectHashAggregate, no
    codegen); the sketch version streams in bounded memory with a
    documented accuracy knob. Accuracy asserted in tests/test_monitoring
    against the exact values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("approx_p95"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
    )


@query(
    "approx_distinct_users",
    oracle=None,  # HLL sketches differ across engines — rows-only check;
    # the exact twin `count_distinct` is the hash-matched one
    survey="A5",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) — the 100 TB scale path next to the
    exact A5. Checked rows-only (sketch values are engine-specific); the
    accuracy assertion lives in tests/test_monitoring.py."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


MAD_SIGMA = 1.4826  # normal-consistency constant: sigma ≈ 1.4826 * MAD
MAD_K = 3.0  # the classic 3-sigma-equivalent robust cut


@query(
    "robust_outlier_profile",
    oracle=f"""
WITH med AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0 AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS d
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type,
         ROUND(quantile_cont(d, 0.5) * 1000000.0) / 1000000.0 AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n,
       MAX(d.med) AS median_value,
       MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.d > {MAD_K} * {MAD_SIGMA} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
""",
    survey="T6-ext,A8-ext",
)
def robust_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median/MAD instead of
    mean/stdev (Hampel's rule, |x − median| > 3·1.4826·MAD) — the
    monitor-side upgrade for metrics where a single spike poisons the
    mean the z-score rule (`anomaly_flags`) compares against. Both
    location and scale come from `sketch_refine_percentiles`' grouped
    form, so no group ever buffers its full value column: two bounded
    sketch+refine passes (median, then median absolute deviation) and
    one codegen flag scan, with the per-group cut table broadcast."""
    from data_ingestion_system_spark.operators.statistics import (
        sketch_refine_percentiles,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = sketch_refine_percentiles(ev, "value", [0.5], group_cols=["event_type"]).select(
        "event_type", F.element_at("vals", 1).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = sketch_refine_percentiles(dev, "d", [0.5], group_cols=["event_type"]).select(
        "event_type", F.element_at("vals", 1).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(F.col("d") > MAD_K * MAD_SIGMA * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         dayofweek(CAST(ts AS DATE)) AS dow, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), scored AS (
  SELECT event_type, day, dow, n,
         COUNT(*)   OVER w AS m,
         SUM(n)     OVER w AS s1,
         SUM(n * n) OVER w AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type, dow ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(dow AS INTEGER) AS dow, CAST(n AS BIGINT) AS n,
       CAST(m AS BIGINT) AS n_history,
       ROUND(CAST(n * m - s1 AS DOUBLE) / SQRT(CAST(m * s2 - s1 * s1 AS DOUBLE))
             * 1000000.0) / 1000000.0 AS z_same_dow
FROM scored
WHERE m >= 3 AND m * s2 - s1 * s1 > 0
  AND ABS(CAST(n * m - s1 AS DOUBLE) / SQRT(CAST(m * s2 - s1 * s1 AS DOUBLE))) >= 2.0
ORDER BY event_type, day
"""


@query("seasonal_anomaly_flags", oracle=_SEASONAL_ORACLE, survey="T6,A17")
def seasonal_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted volume anomalies: each day's count is
    z-scored against PRIOR days of the SAME weekday (per event type) —
    the upgrade over `anomaly_flags`' flat trailing window, which
    false-alarms every weekend on any weekday-periodic source. Alert
    when |z| >= 2 with at least 3 same-weekday priors.

    The z ratio is assembled from exact BIGINT moment sums over the
    expanding same-dow window ((n*m - s1) / sqrt(m*s2 - s1^2), the
    population form), so both engines divide identical integers.

    Scale shape: one map-side-combinable groupBy to the daily series,
    then windows partitioned by (event_type, dow) — series-sized,
    key-parallel, no global order."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.dayofweek(F.to_date("ts")) - 1).alias("dow"),
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type", "dow")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "dow",
        "n",
        F.count("*").over(w).alias("m"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    var_m2 = F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    z = (F.col("n") * F.col("m") - F.col("s1")).cast("double") / F.sqrt(
        var_m2.cast("double")
    )
    return (
        scored.filter((F.col("m") >= 3) & (var_m2 > 0) & (F.abs(z) >= 2.0))
        .select(
            "event_type",
            "day",
            F.col("dow").cast("int"),
            F.col("n").cast("bigint"),
            F.col("m").cast("bigint").alias("n_history"),
            round_port(z, 6).alias("z_same_dow"),
        )
        .orderBy("event_type", "day")
    )
