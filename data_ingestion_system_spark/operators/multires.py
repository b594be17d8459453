"""Multi-resolution time rollup — the hypertable continuous-aggregate shape.

Time-series stores (TimescaleDB continuous aggregates, Druid rollup)
materialize the same measure at several time grains. The naive plan
scans the fact table once per grain; the scale-correct plan is ONE scan
expanded through GROUPING SETS, so the hour/day/month aggregates share
a single shuffle (Spark compiles this to Expand + one partial+final
HashAggregate pair — 3 grains cost ~1 scan, not 3).

Extends rollup_daily (year→month ROLLUP over orders) with the
fixed-grain fan-out over the events stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

_ORACLE = """
WITH g AS (
  SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
         date_trunc('month', ts) AS m,
         COUNT(*) AS n_events, SUM(value) AS sv
  FROM events
  GROUP BY GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)),
                          (date_trunc('month', ts)))
)
SELECT CASE WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day'
            ELSE 'month' END AS resolution,
       COALESCE(h, d, m) AS bucket_start,
       CAST(n_events AS BIGINT) AS n_events,
       ROUND(sv * 1000000.0) / 1000000.0 AS sum_value
FROM g
ORDER BY resolution, bucket_start
"""


@query("multires_rollup", oracle=_ORACLE, survey="EXT-temporal")
def multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/month event rollups from one scan via GROUPING SETS."""
    events = load_table(spark, sf_dir, "events")
    g = (
        events.select(
            F.date_trunc("hour", "ts").alias("h"),
            F.date_trunc("day", "ts").alias("d"),
            F.date_trunc("month", "ts").alias("m"),
            "value",
        )
        .groupingSets([["h"], ["d"], ["m"]], "h", "d", "m")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sv"))
    )
    resolution = (
        F.when(F.col("h").isNotNull(), F.lit("hour"))
        .when(F.col("d").isNotNull(), F.lit("day"))
        .otherwise(F.lit("month"))
    )
    return g.select(
        resolution.alias("resolution"),
        F.coalesce("h", "d", "m").alias("bucket_start"),
        F.col("n_events").cast("bigint").alias("n_events"),
        round_port(F.col("sv"), 6).alias("sum_value"),
    ).orderBy("resolution", "bucket_start")
