"""Date-part and JSON scalar coverage — SURVEY.md §2.7.

The reference leans on strftime-style date keys for its temporal
breakdowns (reference: src/analysis/data_quality_analyzer.py:283-297
month keys; src/analysis/deep_analysis.py:220-248 day-of-week and hour
profiles) and stores nested JSON in TEXT columns
(schema.sql:93,129; parsed with json.loads, monitor.py:474). Spark
equivalents: date_format/dayofweek/hour and get_json_object/from_json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


@query(
    "month_frequency",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n
FROM orders
GROUP BY 1
ORDER BY n DESC, month ASC
LIMIT 6
""",
    survey="A7",
)
def month_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Busiest months — Counter.most_common over yyyy-MM keys
    (data_quality_analyzer.py:283-297)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("month"))
        .limit(6)
    )


@query(
    "dow_hour_profile",
    oracle="""
SELECT dayofweek(ts) AS dow, hour(ts) AS hr, COUNT(*) AS n,
       ROUND(AVG(value) * 10000.0) / 10000.0 AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY dow, hr
""",
    survey="A7,scalar-date",
)
def dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity profile (deep_analysis.py:220-248).

    Numeric dow keys: DuckDB's dayofweek is 0=Sunday..6=Saturday while
    Spark's is 1=Sunday..7 — normalized to DuckDB's convention here."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            (F.dayofweek("ts") - 1).alias("dow"), F.hour("ts").alias("hr")
        )
        .agg(
            F.count("*").alias("n"),
            round_port(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("dow", "hr")
    )


@query(
    "json_props_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    survey="scalar-json",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-TEXT extraction (target_apps / report_json pattern,
    schema.sql:93,129): get_json_object pulls `$.k` out of the props blob
    and aggregates it — no Python json.loads anywhere."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("total_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "json_report_roundtrip",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         ROUND(AVG(value) * 10000.0) / 10000.0 AS avg_value
  FROM events GROUP BY 1
)
SELECT day,
       '{"n":' || n_events || ',"avg":' || CAST(avg_value AS VARCHAR) || '}' AS report_json
FROM daily
ORDER BY day
LIMIT 10
""",
    survey="scalar-json,T5",
)
def json_report_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-report serialization (monitor.py:441 stores report_json):
    build the metrics struct and serialize to a JSON string column.
    Serialized via concat for byte-identical parity with the oracle
    (to_json would also work; number formatting differs per engine)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        round_port(F.avg("value"), 4).alias("avg_value"),
    )
    return (
        daily.select(
            "day",
            F.concat(
                F.lit('{"n":'),
                F.col("n_events").cast("string"),
                F.lit(',"avg":'),
                F.col("avg_value").cast("string"),
                F.lit("}"),
            ).alias("report_json"),
        )
        .orderBy("day")
        .limit(10)
    )
