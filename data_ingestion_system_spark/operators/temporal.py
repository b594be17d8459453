"""Temporal operators Spark lacks natively: as-of join + sessionization.

Neither exists in the reference (SURVEY §2.3: equi-joins only) — these are
the §7 Stage-6 extensions an event/training-data pipeline needs. Both are
compositions of built-in operators (SURVEY's preferred strategy for
missing operators: composition > pandas UDF > mapPartitions):

- as-of join: the union-tag-window construction — tag both streams, union,
  window per key ordered by time, carry the last right-side row forward.
  One shuffle on (key), no range explosion; DuckDB's native ASOF JOIN is
  the oracle.
- sessionization: gap-based session ids via lag + conditional cumsum —
  the standard windowed construction, identical SQL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

SESSION_GAP_MIN = 30


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For every left row, attach the latest right row with
    right_ts <= left_ts (same key); nulls where no prior right row.

    Union-tag-window: right rows sort before left rows at equal
    timestamps (side 0 < side 1), a last_value(ignoreNulls) window carries
    each right value forward to the following left rows. Scales as one
    shuffle on `key` — no inequality-join blowup.
    """
    left_cols = list(left.columns)
    left_types = dict(left.dtypes)
    right_types = dict(right.dtypes)
    payload = [c for c in left_cols if c != key]

    l_side = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right_types[c]).alias(f"_r_{c}") for c in right_value_cols],
        *payload,
    )
    r_side = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        *[F.lit(None).cast(left_types[c]).alias(c) for c in payload],
    )
    unioned = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        key, *payload, *[F.col(f"asof_{c}") for c in right_value_cols]
    )


@query(
    "asof_join_events",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.ts, p.value, c.click_ts AS asof_click_ts
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
ORDER BY p.user_id, p.ts
""",
    survey="EXT-temporal",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's most recent preceding click —
    verified against DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join(purchases, clicks, "user_id", "ts", "click_ts", ["click_ts"])
    return out.select("user_id", "ts", "value", "asof_click_ts").orderBy("user_id", "ts")


@query(
    "sessionization",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM ordered
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         CAST(date_diff('second', MIN(ts), MAX(ts)) AS DOUBLE) AS duration_sec
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(AVG(duration_sec) * 10000.0) / 10000.0 AS avg_session_sec
FROM per_session
GROUP BY user_id
ORDER BY user_id
""",
    survey="EXT-temporal",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag flags session
    starts, a running sum assigns session ids, two aggregations produce
    per-user session stats. At scale: one shuffle on user_id; the
    streaming twin is `F.session_window` (see streaming module)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = (
        prev.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > SESSION_GAP_MIN * 60)
    ).cast("int")
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = events.select(
        "user_id", "ts", "event_id", new_session.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(wsum))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("double")
        .alias("duration_sec"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            round_port(F.avg("duration_sec"), 4).alias("avg_session_sec"),
        )
        .orderBy("user_id")
    )


_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
), staged AS (
  SELECT user_id,
         CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
         CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS s2,
         CASE WHEN t_view IS NOT NULL AND t_click > t_view
                   AND t_purchase > t_click THEN 1 ELSE 0 END AS s3
  FROM firsts
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(s1) AS BIGINT) AS n_view,
       CAST(SUM(s2) AS BIGINT) AS n_click_after_view,
       CAST(SUM(s3) AS BIGINT) AS n_purchase_after_click,
       ROUND(SUM(s2) * 1.0 / NULLIF(SUM(s1), 0) * 1000000.0) / 1000000.0 AS view_to_click,
       ROUND(SUM(s3) * 1.0 / NULLIF(SUM(s2), 0) * 1000000.0) / 1000000.0 AS click_to_purchase
FROM staged
"""


@query("funnel_conversion", oracle=_FUNNEL_ORACLE, survey="EXT-temporal")
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered first-touch funnel (view → click → purchase): a user
    advances a stage only if their FIRST later-stage event strictly
    follows their first earlier-stage event — the product-analytics
    conversion readout (strict-order semantics; NULL comparisons fall
    out of the funnel naturally).

    Scale shape: one conditional-MIN aggregate per user (map-side
    partial), then a single global roll-up — two shuffles total, no
    windows, no self-joins."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.when(F.col("t_view").isNotNull(), 1).otherwise(0)
    s2 = F.when(
        F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1
    ).otherwise(0)
    s3 = F.when(
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click")),
        1,
    ).otherwise(0)
    staged = firsts.select(s1.alias("s1"), s2.alias("s2"), s3.alias("s3"))
    return staged.agg(
        F.count("*").alias("n_users"),
        F.sum("s1").cast("bigint").alias("n_view"),
        F.sum("s2").cast("bigint").alias("n_click_after_view"),
        F.sum("s3").cast("bigint").alias("n_purchase_after_click"),
        round_port(
            F.sum("s2") / F.nullif(F.sum("s1"), F.lit(0)), 6
        ).alias("view_to_click"),
        round_port(
            F.sum("s3") / F.nullif(F.sum("s2"), F.lit(0)), 6
        ).alias("click_to_purchase"),
    )


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
), ret AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INTEGER) AS week_k,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN firsts f USING (user_id)
  GROUP BY f.cohort_week, 2
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_week
)
SELECT CAST(r.cohort_week AS DATE) AS cohort_week,
       r.week_k,
       CAST(r.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       ROUND(r.n_active * 1.0 / s.cohort_size * 1000000.0) / 1000000.0 AS retention
FROM ret r JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, week_k
"""


@query("cohort_retention", oracle=_COHORT_ORACLE, survey="EXT-temporal")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-activity
    week (Monday-truncated in both engines), retention at week k =
    active cohort members / cohort size — the classic growth-analytics
    matrix.

    Scale shape: per-user first-week aggregate + distinct (user, week)
    activity, joined on user_id (both sides user-partitioned, one
    shuffle each), then week-granular roll-ups over a ~weeks-sized
    result."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    activity = ev.select("user_id", wk.alias("active_week")).distinct()
    ret = (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_k"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        ret.join(sizes, "cohort_week")
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_k",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            round_port(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_k")
    )


_BOUNCE_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts)
                   > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, CAST(ts AS DATE) AS start_day, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), per_session AS (
  SELECT user_id, session_id,
         MIN(start_day) AS day, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*) * 1000000.0) / 1000000.0 AS bounce_rate,
       ROUND(AVG(CAST(n_events AS DOUBLE)) * 1000000.0) / 1000000.0
         AS avg_session_events
FROM per_session GROUP BY day ORDER BY day
"""


@query("session_bounce_stats", oracle=_BOUNCE_ORACLE, survey="EXT-temporal,A2")
def session_bounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate over gap-based sessions (30-min inactivity): a
    bounce is a single-event session, attributed to the day the session
    STARTED — the engagement-health headline next to raw volume
    (volume can grow while every new session bounces).

    Scale shape: the same one-shuffle-per-user session assignment as
    `sessionization`, then two aggregations — per-session, then
    per-day; nothing is ever wider than the session table."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = (
        prev.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > SESSION_GAP_MIN * 60)
    ).cast("int")
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = events.select(
        "user_id",
        "ts",
        "event_id",
        F.to_date("ts").alias("start_day"),
        new_session.alias("new_session"),
    ).withColumn("session_id", F.sum("new_session").over(wsum))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.min("start_day").alias("day"), F.count("*").alias("n_events")
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_session.groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            bounce.cast("bigint").alias("n_bounces"),
            (F.round(bounce * 1.0 / F.count("*") * 1000000.0) / 1000000.0)
            .alias("bounce_rate"),
            (F.round(F.avg(F.col("n_events").cast("double")) * 1000000.0) / 1000000.0)
            .alias("avg_session_events"),
        )
        .orderBy("day")
    )


_TTC_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view'
  GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.t_view
  GROUP BY e.user_id
), d AS (
  SELECT date_diff('second', v.t_view, p.t_purchase) / 60.0 AS minutes
  FROM p JOIN v USING (user_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
       ROUND(quantile_cont(minutes, 0.25) * 1000000.0) / 1000000.0 AS p25_min,
       ROUND(quantile_cont(minutes, 0.50) * 1000000.0) / 1000000.0 AS p50_min,
       ROUND(quantile_cont(minutes, 0.90) * 1000000.0) / 1000000.0 AS p90_min,
       ROUND(AVG(minutes) * 1000000.0) / 1000000.0 AS mean_min
FROM d
"""


@query("funnel_time_to_convert", oracle=_TTC_ORACLE, survey="EXT-temporal,A10")
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long conversion takes, not just whether it happens: exact
    p25/p50/p90 and mean minutes from first view to first subsequent
    purchase among converters — the latency companion to
    `funnel_conversion`'s rate. Durations are exact second diffs
    scaled to minutes; percentiles use the same exact-interpolation
    aggregate as `exact_percentiles` (the converter set is
    user-bounded, far below the sketch-refine cutover).

    Scale shape: two conditional-MIN per-user aggregates joined on
    user_id; the percentile buffer holds one value per converter."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    d = p.join(v, "user_id").select(
        (
            (
                F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
            ).cast("double")
            / 60.0
        ).alias("minutes")
    )
    pcts = d.agg(
        F.count("*").cast("bigint").alias("n_converters"),
        F.expr("percentile(minutes, array(0.25, 0.50, 0.90))").alias("ps"),
        (F.round(F.avg("minutes") * 1000000.0) / 1000000.0).alias("mean_min"),
    )
    return pcts.select(
        "n_converters",
        (F.round(F.col("ps")[0] * 1000000.0) / 1000000.0).alias("p25_min"),
        (F.round(F.col("ps")[1] * 1000000.0) / 1000000.0).alias("p50_min"),
        (F.round(F.col("ps")[2] * 1000000.0) / 1000000.0).alias("p90_min"),
        "mean_min",
    )
