"""Temporal-operator internals: the window-based sessionizer must agree
with Spark's built-in session_window (the streaming twin), and the as-of
join must carry the correct row (spot-checked directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.temporal import SESSION_GAP_MIN, asof_join
from data_ingestion_system_spark.tables import load_table


def test_sessionizer_matches_builtin_session_window(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    builtin = (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
        )
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    from data_ingestion_system_spark.registry import load_all

    ours = (
        load_all()["sessionization"].spark(spark, sf_dir).select("user_id", "n_sessions")
    )
    b = {r.user_id: r.n_sessions for r in builtin.collect()}
    o = {r.user_id: r.n_sessions for r in ours.collect()}
    assert o == b


def test_asof_join_carries_latest_preceding(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k int, t int, payload string"
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (1, 25, 300.0), (3, 1, 999.0)],
        "k int, rt int, val double",
    )
    out = {
        (r.k, r.t): r.asof_val
        for r in asof_join(left, right, "k", "t", "rt", ["val"]).collect()
    }
    assert out == {(1, 10): 100.0, (1, 20): 200.0, (2, 5): None}
