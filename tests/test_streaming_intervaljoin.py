"""Stream-stream interval join (streaming/intervaljoin.py): the
streaming result must be IDENTICAL to the batch bucketed range join on
the same events — the append-mode streaming/batch parity property.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.rangejoin import range_join_before
from data_ingestion_system_spark.streaming.intervaljoin import run_interval_join

SCHEMA = "event_id long, user_id long, ts timestamp"
T0 = datetime(2024, 3, 1, 12, 0, 0)
WINDOW = 600  # 10 minutes for the test


def _events(offsets_minutes, start_id, user=1):
    return [
        (start_id + i, user, T0 + timedelta(minutes=m))
        for i, m in enumerate(offsets_minutes)
    ]


def test_streaming_matches_batch_range_join(spark, tmp_path):
    # user 1: clicks at t+0,2,8,15; error at t+9 catches 0,2,8 (15 is
    # after it), error at t+30 catches nothing (t+15 is >10 min before).
    # user 2: click at t+4, error at t+5 catches it.
    clicks = _events([0, 2, 8, 15], 100, user=1) + _events([4], 200, user=2)
    errors = _events([9, 30], 300, user=1) + _events([5], 400, user=2)
    clicks_df = spark.createDataFrame(clicks, SCHEMA)
    errors_df = spark.createDataFrame(errors, SCHEMA)
    clicks_dir = str(tmp_path / "clicks")
    errors_dir = str(tmp_path / "errors")
    clicks_df.write.parquet(clicks_dir)
    errors_df.write.parquet(errors_dir)

    out_dir = str(tmp_path / "out")
    run_interval_join(
        spark,
        errors_dir,
        clicks_dir,
        out_dir,
        str(tmp_path / "ckpt"),
        SCHEMA,
        window_secs=WINDOW,
    )
    streaming = {
        (r.error_id, r.click_id, r.user_id, r.secs_before)
        for r in spark.read.parquet(out_dir).collect()
    }

    batch = range_join_before(
        errors_df.select(
            F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
        ),
        clicks_df.select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
        ),
        "user_id",
        "error_ts",
        "click_ts",
        window_secs=WINDOW,
    ).select(
        "error_id",
        "click_id",
        "user_id",
        (F.unix_timestamp("error_ts") - F.unix_timestamp("click_ts")).alias("secs_before"),
    )
    expected = {
        (r.error_id, r.click_id, r.user_id, r.secs_before) for r in batch.collect()
    }
    assert streaming == expected
    # sanity on the scenario itself: error 300 catches clicks 100,101,102;
    # error 400 catches click 200; error 301 catches nothing
    assert {(e, c) for e, c, _, _ in expected} == {
        (300, 100),
        (300, 101),
        (300, 102),
        (400, 200),
    }
