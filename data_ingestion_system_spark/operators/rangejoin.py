"""Bucketed range join — the scale-safe time-interval join.

Spark has no native range-join optimization: a raw
`a.ts BETWEEN b.ts - w AND b.ts` predicate compiles to a nested-loop /
cartesian plan that is quadratic per key. The standard fix (the same
trick behind Databricks' range-join hints and interval indexes) is to
discretize time into buckets of exactly the window width `w`: a probe
row lives in one bucket, a build row is replicated into its own bucket
and the next, and any in-window pair is guaranteed to collide on
(key, bucket) — turning the theta join into an equi-join plus an exact
residual filter. Build-side duplication is bounded at 2×, shuffles hash
on (user_id, bucket), and no pair is compared unless it already agrees
on key and coarse time — at 100 TB this is the difference between a
shuffle join and a cross product.

The reference has equi-joins only (SURVEY §2.3); this extends the
temporal family (asof_join_events, sessionization). The DuckDB oracle
is the naive theta join — same result, different plan — so the
differential test proves the bucketing loses no pairs (the coverage
guarantee: click ∈ [error.ts − w, error.ts) ⇒ bucket(click) ∈
{bucket(error) − 1, bucket(error)}).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

WINDOW_SECS = 6 * 3600  # range-join window (and bucket width)


def range_join_before(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    window_secs: int = WINDOW_SECS,
) -> DataFrame:
    """All (probe, build) pairs with the same `key` and
    build_ts ∈ [probe_ts − window, probe_ts), via the bucketed
    equi-join. Returns probe.* + build.* columns (caller projects)."""
    p = probe.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(probe_ts)) / window_secs)
    )
    b0 = build.withColumn(
        "_bb", F.floor(F.unix_timestamp(F.col(build_ts)) / window_secs)
    )
    b = b0.withColumn("_bucket", F.explode(F.array(F.col("_bb"), F.col("_bb") + 1))).drop(
        "_bb"
    )
    joined = p.join(b, [key, "_bucket"]).filter(
        (F.col(build_ts) >= F.col(probe_ts) - F.expr(f"INTERVAL {window_secs} SECONDS"))
        & (F.col(build_ts) < F.col(probe_ts))
    )
    return joined.drop("_bucket")


_ORACLE = f"""
WITH errors AS (
  SELECT event_id AS error_id, user_id, ts AS error_ts FROM events
  WHERE event_type = 'error'
), clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts FROM events
  WHERE event_type = 'click'
)
SELECT e.error_id, c.click_id, e.user_id,
       CAST(date_diff('second', c.click_ts, e.error_ts) AS BIGINT) AS secs_before
FROM errors e
JOIN clicks c
  ON c.user_id = e.user_id
 AND c.click_ts >= e.error_ts - INTERVAL {WINDOW_SECS} SECOND
 AND c.click_ts < e.error_ts
ORDER BY e.error_id, c.click_id
"""


@query("range_join_events", oracle=_ORACLE, survey="EXT-temporal")
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-attribution range join: every click by the same user in the
    6 hours before each error event."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    out = range_join_before(errors, clicks, "user_id", "error_ts", "click_ts")
    return out.select(
        "error_id",
        "click_id",
        "user_id",
        (F.unix_timestamp("error_ts") - F.unix_timestamp("click_ts")).alias("secs_before"),
    ).orderBy("error_id", "click_id")
