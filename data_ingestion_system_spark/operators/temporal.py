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
