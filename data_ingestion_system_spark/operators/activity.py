"""User-activity analytics — gaps-and-islands streaks and sliding-window
rate audits over the event stream.

The reference's monitor walks per-run history rows in Python to find
consecutive-day streaks and burst anomalies (reference:
src/monitoring/monitor.py:155-209 loads history and loops;
src/scraper/rate_limiter.py enforces a fixed request budget per window).
Re-expressed set-based:

* `gap_islands` — the classic islands trick: group consecutive active
  days by `day - row_number()`; one window + two aggregations, all
  partitioned by user_id. No self-join, no driver loop.
* `sliding_rate_limit` — the rate-limiter's sliding 1-hour window as a
  RANGE window frame over the epoch-seconds ordering, entirely inside
  whole-stage codegen. The reference enforces the budget imperatively
  at request time; the audit form replays the same window over stored
  events and reports per-user peak burst + violation counts.

Scale shape: both queries shuffle once on user_id and then window
within the partition — the 100-TB plan is hash-partition by user,
sort within partition, no global sort, no driver state. Epoch ordering
uses `CAST(ts AS DOUBLE)` (micro-second fraction preserved) so Spark's
rangeBetween(-3600, 0) and DuckDB's `RANGE BETWEEN 3600.0 PRECEDING
AND CURRENT ROW` over `epoch(ts)` see bit-identical frame bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

# Sliding-window budget mirrored from the reference's rate limiter shape
# (N requests per rolling hour); the audit flags events that exceeded it.
BURST_LIMIT = 5
WINDOW_SEC = 3600.0


_ISLANDS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), isl AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS anchor
  FROM days
), g AS (
  SELECT user_id, anchor, COUNT(*) AS len,
         MIN(day) AS island_start, MAX(day) AS island_end
  FROM isl GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS active_days,
       MIN(island_start) AS first_day,
       MAX(island_end) AS last_day
FROM g
GROUP BY user_id
ORDER BY user_id
"""


@query("gap_islands", oracle=_ISLANDS_ORACLE, survey="EXT-temporal,W6")
def gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks per user (gaps-and-islands):
    `day - row_number()` is constant within a run of consecutive days,
    so one window + a groupBy turns the per-user day series into island
    rows, then a second groupBy profiles streak count / longest streak /
    total active days. The reference computes streaks by iterating
    history rows (monitor.py:155-209); here it's two shuffles on
    user_id and zero driver state."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("anchor", F.date_sub(F.col("day"), F.row_number().over(w)))
    g = isl.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"),
        F.min("day").alias("island_start"),
        F.max("day").alias("island_end"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("len").alias("longest_streak"),
            F.sum("len").alias("active_days"),
            F.min("island_start").alias("first_day"),
            F.max("island_end").alias("last_day"),
        )
        .orderBy("user_id")
    )


_RATE_ORACLE = f"""
WITH b AS (
  SELECT user_id,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY epoch(ts)
           RANGE BETWEEN {WINDOW_SEC} PRECEDING AND CURRENT ROW
         ) AS burst
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(burst) AS BIGINT) AS max_burst_1h,
       CAST(SUM(CASE WHEN burst > {BURST_LIMIT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_limit
FROM b
GROUP BY user_id
HAVING MAX(burst) > 1
ORDER BY user_id
"""


@query("sliding_rate_limit", oracle=_RATE_ORACLE, survey="EXT-temporal,T9")
def sliding_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour rate audit: for every event, the count of the same
    user's events in [t-1h, t] via a RANGE window over epoch seconds;
    rolled up to per-user peak burst and over-limit event count. This is
    the set-based replay of the reference's imperative rate limiter
    (rate_limiter.py) — same window semantics, computed after the fact
    over the store. One shuffle (user_id), sort within partition,
    codegen throughout."""
    ev = load_table(spark, sf_dir, "events")
    # SQL-form window: the range literal coerces to the DOUBLE ordering
    # column (the Python rangeBetween API only takes integer bounds).
    b = ev.select(
        "user_id",
        F.expr(
            "count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS DOUBLE)"
            f" RANGE BETWEEN {WINDOW_SEC} PRECEDING AND CURRENT ROW)"
        ).alias("burst"),
    )
    return (
        b.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("burst").alias("max_burst_1h"),
            F.sum((F.col("burst") > BURST_LIMIT).cast("bigint")).alias("n_over_limit"),
        )
        .filter(F.col("max_burst_1h") > 1)
        .orderBy("user_id")
    )


FUNNEL_WINDOW_HOURS = 24

_WINDOWED_FUNNEL_ORACLE = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view'
  GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN v USING (user_id) JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= v.t_view + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_24h,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_24h,
       ROUND((SELECT COUNT(*) FROM c) * 1.0
             / NULLIF((SELECT COUNT(*) FROM v), 0) * 1000000.0) / 1000000.0
         AS view_to_click_24h,
       ROUND((SELECT COUNT(*) FROM p) * 1.0
             / NULLIF((SELECT COUNT(*) FROM c), 0) * 1000000.0) / 1000000.0
         AS click_to_purchase_24h
"""


@query("funnel_within_window", oracle=_WINDOWED_FUNNEL_ORACLE, survey="EXT-temporal")
def funnel_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed strict funnel: view → click → purchase where every
    later stage must land inside 24 h of the user's FIRST view (the
    conversion-window form product analytics actually reports —
    `funnel_conversion` is the unbounded first-touch variant).

    Three conditional-MIN aggregation passes chained by user_id joins —
    each stage's anchor time is an aggregate, so the stage predicate
    can't collapse into one pass; all joins are key-partitioned, no
    windows over the corpus, no self-join explosion."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    window_end = F.col("t_view") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= window_end))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= window_end))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_24h")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_24h")))
    )
    from data_ingestion_system_spark.functions.scalar import round_port

    return counts.select(
        "n_view",
        "n_click_24h",
        "n_purchase_24h",
        round_port(
            F.col("n_click_24h") / F.nullif(F.col("n_view"), F.lit(0)), 6
        ).alias("view_to_click_24h"),
        round_port(
            F.col("n_purchase_24h") / F.nullif(F.col("n_click_24h"), F.lit(0)), 6
        ).alias("click_to_purchase_24h"),
    )


PATH_TOP_N = 10

_PATHS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM seq WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n_paths DESC, e1, e2, e3
LIMIT {PATH_TOP_N}
"""


@query("common_event_paths", oracle=_PATHS_ORACLE, survey="EXT-temporal,A6")
def common_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step event paths (per-user time order,
    event_id tiebreak) — path mining over the behavioral log: which
    trigram journeys dominate. One window per user (two LEADs share the
    frame) + one aggregate + TakeOrdered top-k; no self-joins, no
    per-user collection."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(PATH_TOP_N)
    )


_WAU_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud
), spine AS (
  SELECT CAST(d AS DATE) AS day
  FROM bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS g(d)
), dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
)
SELECT s.day,
       COALESCE(d.dau, 0) AS dau,
       COUNT(DISTINCT u.user_id) AS wau,
       ROUND(CASE WHEN COUNT(DISTINCT u.user_id) > 0
                  THEN CAST(COALESCE(d.dau, 0) AS DOUBLE)
                       / COUNT(DISTINCT u.user_id)
                  ELSE 0.0 END * 1000000.0) / 1000000.0 AS stickiness
FROM spine s
LEFT JOIN ud u ON u.day <= s.day AND u.day > s.day - INTERVAL 7 DAY
LEFT JOIN dau d ON d.day = s.day
GROUP BY s.day, d.dau
ORDER BY s.day
"""


@query("rolling_wau", oracle=_WAU_ORACLE, survey="EXT-temporal,A5")
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per calendar day (WAU), daily actives
    (DAU), and the DAU/WAU stickiness ratio — the engagement surface
    every activity dashboard leads with. The calendar spine is complete
    (gap days report their trailing window too, with dau=0).

    Scale shape: events collapse to DISTINCT (user, day) first — the
    only corpus-sized shuffle. Each presence row then EXPLODES into the
    exactly-7 future days it keeps the user active for, making the
    trailing window a plain equi-join on day (a raw interval predicate
    would compile to a nested-loop against the spine); expansion factor
    is exactly 7, nothing is ever quadratic. (The HLL twin for when
    exact distinct is too hot at 100 TB is `approx_distinct_users`'
    pattern — swap COUNT(DISTINCT) for approx_count_distinct.)"""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    u7 = ud.select(
        "user_id",
        F.explode(
            F.sequence("day", F.date_add("day", 6), F.expr("interval 1 day"))
        ).alias("day"),
    )
    wau = (
        spine.join(u7, "day", "left")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    out = (
        spine.join(dau, "day", "left")
        .join(wau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).alias("dau"),
            F.coalesce("wau", F.lit(0)).alias("wau"),
        )
    )
    stick = F.when(
        F.col("wau") > 0, F.col("dau").cast("double") / F.col("wau")
    ).otherwise(F.lit(0.0))
    return out.select(
        "day",
        "dau",
        "wau",
        (F.round(stick * 1000000.0) / 1000000.0).alias("stickiness"),
    ).orderBy("day")


_TRANSITION_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), margins AS (
  SELECT from_type, SUM(n) AS m FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
       ROUND(CAST(p.n AS DOUBLE) / m.m * 1000000.0) / 1000000.0 AS p_next
FROM pairs p JOIN margins m USING (from_type)
ORDER BY from_type, to_type
"""


@query("event_transition_matrix", oracle=_TRANSITION_ORACLE, survey="EXT-temporal,A6")
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    journeys: P(next event type | current), from adjacent pairs in
    (ts, event_id) order — the journey model behind next-step
    prediction and funnel-leak diagnosis (`common_event_paths` mines
    the top trigrams; this is the full one-step kernel).

    Scale shape: one window pass partitioned by user_id (the tie-broken
    total order makes adjacency deterministic), then a type x type
    aggregate — the matrix is |types|^2 regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    w_m = Window.partitionBy("from_type")
    return (
        pairs.select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint"),
            (F.round(F.col("n").cast("double") / F.sum("n").over(w_m) * 1000000.0)
             / 1000000.0).alias("p_next"),
        )
        .orderBy("from_type", "to_type")
    )


_BURSTINESS_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
), per_user AS (
  SELECT user_id, COUNT(*) AS n_gaps,
         SUM(gap_s) AS s1, SUM(gap_s * gap_s) AS s2
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY user_id HAVING COUNT(*) >= 5
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(CAST(s1 AS DOUBLE) / n_gaps) * 1000000.0) / 1000000.0
         AS mean_gap_s,
       ROUND(AVG((SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) / n_gaps
                  - CAST(s1 AS DOUBLE) / n_gaps)
                 / (SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) / n_gaps
                    + CAST(s1 AS DOUBLE) / n_gaps)) * 1000000.0) / 1000000.0
         AS mean_burstiness,
       CAST(SUM(CASE WHEN SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) / n_gaps
                          > CAST(s1 AS DOUBLE) / n_gaps
                     THEN 1 ELSE 0 END) AS BIGINT) AS bursty_users
FROM per_user
"""


@query("interarrival_burstiness", oracle=_BURSTINESS_ORACLE, survey="EXT-temporal,A17")
def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness profile (Goh-Barabási B = (σ−μ)/(σ+μ)
    over per-user event gaps, users with ≥5 gaps): B→−1 is metronome
    traffic (bots), B≈0 Poisson, B→+1 bursty humans — the traffic-shape
    signal rate thresholds miss. Per-user σ and μ come from exact
    BIGINT second-gap moment sums; B is the only float.

    Scale shape: one lag window per user (key-parallel), then per-user
    3-sum aggregates and a constant-width global rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap_s").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    mu = F.col("s1").cast("double") / F.col("n_gaps")
    sigma = (
        F.sqrt((F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
        / F.col("n_gaps")
    )
    b = (sigma - mu) / (sigma + mu)
    return per_user.agg(
        F.count("*").cast("bigint").alias("n_users"),
        (F.round(F.avg(mu) * 1000000.0) / 1000000.0).alias("mean_gap_s"),
        (F.round(F.avg(b) * 1000000.0) / 1000000.0).alias("mean_burstiness"),
        F.sum(F.when(sigma > mu, 1).otherwise(0)).cast("bigint").alias("bursty_users"),
    )
