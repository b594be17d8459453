"""Stream-stream interval join with watermarked state cleanup.

The streaming twin of the batch bucketed range join
(operators/rangejoin.py): two live event streams joined on key plus a
time-range condition. Structured Streaming handles this natively —
stream-stream joins buffer both sides in state, and the combination of
watermarks with a time-range join condition lets the engine compute how
long a buffered row can still match, so state is evicted instead of
growing forever (the documented stream-stream join recipe in the Spark
Structured Streaming guide; without the range condition + watermarks
the state is unbounded and a 100 TB/day stream OOMs its executors).

The differential test (tests/test_streaming_intervaljoin.py) replays
the same events through the batch range join and asserts the streaming
result is identical — the streaming/batch parity property Structured
Streaming promises for append-mode joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.rangejoin import WINDOW_SECS


def interval_join_streams(
    errors: DataFrame,
    clicks: DataFrame,
    window_secs: int = WINDOW_SECS,
    watermark_secs: int = 2 * WINDOW_SECS,
) -> DataFrame:
    """Join two STREAMING DataFrames — errors(error_id, user_id,
    error_ts) × clicks(click_id, user_id, click_ts) — on user and
    click_ts ∈ [error_ts − window, error_ts). Both sides carry
    watermarks so join state is bounded."""
    e = errors.withWatermark("error_ts", f"{watermark_secs} seconds")
    c = clicks.withWatermark("click_ts", f"{watermark_secs} seconds")
    return e.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr(f"INTERVAL {window_secs} SECONDS"))
        & (F.col("click_ts") < F.col("error_ts")),
    ).select(
        "error_id",
        "click_id",
        "user_id",
        (F.unix_timestamp("error_ts") - F.unix_timestamp("click_ts")).alias("secs_before"),
    )


def run_interval_join(
    spark: SparkSession,
    errors_dir: str,
    clicks_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    window_secs: int = WINDOW_SECS,
) -> None:
    """Drive the stream-stream join over two parquet directories with an
    availableNow trigger (drain everything, then stop) and append the
    matches to `out_dir`."""
    errors = (
        spark.readStream.schema(schema)
        .parquet(errors_dir)
        .select(
            F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
        )
    )
    clicks = (
        spark.readStream.schema(schema)
        .parquet(clicks_dir)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = interval_join_streams(errors, clicks, window_secs)
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
