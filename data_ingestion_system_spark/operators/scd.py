"""Slowly-changing-dimension (Type 2) history from an event log.

The reference keeps only latest-state rows (labeling_sessions UPDATE
in place, src/database/db_manager.py:520-560) — history is lost on
every transition. The warehouse-standard fix is SCD Type 2: one row
per (entity, attribute-value run) with [valid_from, valid_to) validity
and an is_current flag, built here from the raw event log.

The tracked attribute is each user's dominant daily event type (ties
broken alphabetically — deterministic in both engines). The build is
the classic three-window chain, every window PARTITIONed BY user_id so
the work is key-parallel with no global sort:

  1. dominant value per (user, day):   row_number over count desc;
  2. change detection (gaps&islands):  keep rows where lag differs;
  3. validity intervals:               valid_to = lead(valid_from),
                                       is_current = valid_to IS NULL.

At 100 TB this shuffles events once on user_id and emits only
change rows — output is bounded by the number of transitions, not
the number of events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

_SCD2_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, CAST(ts AS DATE), event_type
), dominant AS (
  SELECT user_id, day, event_type AS segment
  FROM (SELECT user_id, day, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, day
                                  ORDER BY n DESC, event_type ASC) AS rn
        FROM daily)
  WHERE rn = 1
), changes AS (
  SELECT user_id, day AS valid_from, segment
  FROM (SELECT user_id, day, segment,
               LAG(segment) OVER (PARTITION BY user_id ORDER BY day) AS prev
        FROM dominant)
  WHERE prev IS NULL OR prev <> segment
)
SELECT CAST(user_id AS BIGINT) AS user_id, segment, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
              IS NULL AS BOOLEAN) AS is_current
FROM changes
ORDER BY user_id, valid_from
"""


@query("scd2_user_segments", oracle=_SCD2_ORACLE, survey="EXT-temporal,S10")
def scd2_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity intervals for each user's dominant daily
    event type: one row per attribute-value run with [valid_from,
    valid_to) and is_current — the history-preserving upsert the
    reference's in-place UPDATE discards."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w_dom = Window.partitionBy("user_id", "day").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    dominant = (
        daily.withColumn("rn", F.row_number().over(w_dom))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("event_type").alias("segment"))
    )
    w_day = Window.partitionBy("user_id").orderBy("day")
    changes = (
        dominant.withColumn("prev", F.lag("segment").over(w_day))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("segment")))
        .select("user_id", F.col("day").alias("valid_from"), "segment")
    )
    w_run = Window.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w_run)
    return (
        changes.select(
            F.col("user_id").cast("bigint"),
            "segment",
            "valid_from",
            valid_to.alias("valid_to"),
            valid_to.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


_CHURN_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, CAST(ts AS DATE), event_type
), dominant AS (
  SELECT user_id, day, event_type AS segment
  FROM (SELECT user_id, day, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, day
                                  ORDER BY n DESC, event_type ASC) AS rn
        FROM daily)
  WHERE rn = 1
), flips AS (
  SELECT user_id,
         SUM(CASE WHEN prev IS NOT NULL AND prev <> segment
                  THEN 1 ELSE 0 END) AS n_changes,
         COUNT(*) AS n_active_days
  FROM (SELECT user_id, segment,
               LAG(segment) OVER (PARTITION BY user_id ORDER BY day) AS prev
        FROM dominant)
  GROUP BY user_id
)
SELECT CAST(n_changes AS BIGINT) AS n_changes,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_active_days) AS BIGINT) AS total_active_days
FROM flips GROUP BY n_changes ORDER BY n_changes
"""


@query("scd2_churn_profile", oracle=_CHURN_ORACLE, survey="EXT-temporal,A6")
def scd2_churn_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How volatile is the tracked dimension: distribution of users by
    number of segment transitions — the row-explosion estimate for the
    SCD2 table (users at n_changes=0 cost one row forever; the tail is
    the churn load)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w_dom = Window.partitionBy("user_id", "day").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    dominant = (
        daily.withColumn("rn", F.row_number().over(w_dom))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("event_type").alias("segment"))
    )
    w_day = Window.partitionBy("user_id").orderBy("day")
    flips = (
        dominant.withColumn("prev", F.lag("segment").over(w_day))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("prev") != F.col("segment")),
                    1,
                ).otherwise(0)
            ).alias("n_changes"),
            F.count("*").alias("n_active_days"),
        )
    )
    return (
        flips.groupBy(F.col("n_changes").cast("bigint").alias("n_changes"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_active_days").cast("bigint").alias("total_active_days"),
        )
        .orderBy("n_changes")
    )


def scd2_apply_segments(
    spark: SparkSession, scd2_dir: str, new_segments: DataFrame
) -> dict:
    """Incrementally maintain a persisted SCD2 table with one new
    observation day per user: `new_segments` is (user_id, day, segment)
    — the dominant-segment rows `scd2_user_segments` derives for a
    single day.

    Semantics (the warehouse-standard Type-2 maintenance):
      * user unseen before           -> open a new current row
      * current segment unchanged    -> no-op (the run extends for free;
        valid_to stays NULL)
      * current segment changed      -> close the current row
        (valid_to = day) and open a new current row
      * day <= current valid_from    -> rejected: history is append-only,
        late rewrites go through a rebuild, not maintenance

    Implemented as one join of the k-row daily batch against ONLY the
    is_current slice of the table, then a single atomic swap write —
    closed history rows are never rewritten row-by-row, and the table
    is read once. Returns counters {opened, closed, unchanged}.
    """
    import os

    from data_ingestion_system_spark.operators.merge import _swap_write

    cols = ["user_id", "segment", "valid_from", "valid_to", "is_current"]
    new_rows = new_segments.select(
        "user_id",
        "segment",
        F.col("day").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    if not os.path.exists(scd2_dir):
        opened = new_rows.count()
        new_rows.select(cols).write.mode("overwrite").parquet(scd2_dir)
        return {"opened": opened, "closed": 0, "unchanged": 0}

    table = spark.read.parquet(scd2_dir)
    current = table.filter(F.col("is_current"))
    batch = new_segments.select(
        "user_id", F.col("segment").alias("new_segment"), "day"
    )
    joined = current.join(batch, "user_id", "full_outer")

    late = joined.filter(
        F.col("day").isNotNull() & (F.col("day") <= F.col("valid_from"))
    )
    if late.limit(1).count():
        raise ValueError(
            "scd2_apply_segments: batch day not after current valid_from — "
            "history is append-only; rebuild instead"
        )

    changed = F.col("day").isNotNull() & (F.col("new_segment") != F.col("segment"))
    unchanged = F.col("day").isNotNull() & (F.col("new_segment") == F.col("segment"))
    fresh = F.col("segment").isNull()  # no current row for this user

    # current rows: close if changed, keep as-is otherwise
    kept_current = joined.filter(F.col("segment").isNotNull()).select(
        "user_id",
        "segment",
        "valid_from",
        F.when(changed, F.col("day")).otherwise(F.col("valid_to")).alias("valid_to"),
        F.when(changed, F.lit(False)).otherwise(F.col("is_current")).alias("is_current"),
    )
    opened_rows = joined.filter(changed | fresh).select(
        "user_id",
        F.col("new_segment").alias("segment"),
        F.col("day").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    n_closed = joined.filter(changed).count()
    n_opened = joined.filter(changed | fresh).count()
    n_unchanged = joined.filter(unchanged).count()

    history = table.filter(~F.col("is_current"))
    merged = (
        history.select(cols)
        .unionByName(kept_current.select(cols))
        .unionByName(opened_rows.select(cols))
    )
    _swap_write(merged, scd2_dir)
    return {"opened": n_opened, "closed": n_closed, "unchanged": n_unchanged}
