"""Incremental SCD2 maintenance: day-by-day apply equals the batch
build over the same dominant-segment stream, plus the append-only
guard."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.scd import scd2_apply_segments

D = datetime.date


def _batch(spark, rows):
    return spark.createDataFrame(rows, "user_id long, day date, segment string")


def test_daily_apply_builds_correct_history(spark, tmp_path):
    t = str(tmp_path / "scd2")

    r1 = scd2_apply_segments(
        spark, t, _batch(spark, [(1, D(2024, 1, 1), "click"), (2, D(2024, 1, 1), "view")])
    )
    assert r1 == {"opened": 2, "closed": 0, "unchanged": 0}

    # day 2: user 1 unchanged (no-op), user 2 flips, user 3 appears
    r2 = scd2_apply_segments(
        spark,
        t,
        _batch(
            spark,
            [
                (1, D(2024, 1, 2), "click"),
                (2, D(2024, 1, 2), "purchase"),
                (3, D(2024, 1, 2), "view"),
            ],
        ),
    )
    assert r2 == {"opened": 2, "closed": 1, "unchanged": 1}

    # day 4 (gap day skipped): user 1 flips
    r3 = scd2_apply_segments(spark, t, _batch(spark, [(1, D(2024, 1, 4), "view")]))
    assert r3 == {"opened": 1, "closed": 1, "unchanged": 0}

    got = {
        (r.user_id, r.segment, r.valid_from, r.valid_to, r.is_current)
        for r in spark.read.parquet(t).collect()
    }
    assert got == {
        (1, "click", D(2024, 1, 1), D(2024, 1, 4), False),
        (1, "view", D(2024, 1, 4), None, True),
        (2, "view", D(2024, 1, 1), D(2024, 1, 2), False),
        (2, "purchase", D(2024, 1, 2), None, True),
        (3, "view", D(2024, 1, 2), None, True),
    }, got

    # exactly one current row per user, always
    cur = spark.read.parquet(t).filter(F.col("is_current"))
    assert cur.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0


def test_apply_rejects_backdated_batch(spark, tmp_path):
    t = str(tmp_path / "scd2b")
    scd2_apply_segments(spark, t, _batch(spark, [(1, D(2024, 1, 5), "click")]))
    with pytest.raises(ValueError, match="append-only"):
        scd2_apply_segments(spark, t, _batch(spark, [(1, D(2024, 1, 5), "view")]))
