"""Golden labeling-session walkthrough.

The reference's ONLY golden output is a hand-verified 10-review labeling
session with expected queue-state tables
(reference: docs/labeling_system_test.md — SURVEY §5.4). This test
replays that exact scenario through the engine's event-log state machine:
queue of {26,43,16,13} per tier, 10 Tier-1 items labeled across 2
sessions with a 6/4 very_negative/negative split, then asserts the
documented end state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.statemachine import (
    current_state,
    next_batch,
    queue_statistics,
)

# reference walkthrough constants (labeling_system_test.md)
ORIGINAL_PER_TIER = {1: 26, 2: 43, 3: 16, 4: 13}
LABELED = 10
GOLDEN_LABELS = ["very_negative"] * 6 + ["negative"] * 4
GOLDEN_CONFIDENCE = ["high"] * 7 + ["medium"] * 3
REMAINING_PER_TIER = {1: 16, 2: 43, 3: 16, 4: 13}


def _queue_events(spark):
    rows = []
    qid = 0
    for tier, n in ORIGINAL_PER_TIER.items():
        for _ in range(n):
            qid += 1
            rows.append((qid, f"r{qid}", tier, "pending", None, 1, qid))
    return spark.createDataFrame(
        rows,
        "queue_id long, review_id string, priority_tier int, status string,"
        " actor_id long, ord int, seq long",
    ).withColumn(
        "event_ts",
        F.to_timestamp(F.lit("2024-04-01 00:00:00")) + F.make_interval(mins=F.col("ord")),
    ).drop("ord")


def test_golden_walkthrough(spark):
    events = _queue_events(spark)

    # two sessions × 5 reviews: fetch the priority head, assign, complete
    seq = 1000
    for session in range(2):
        state = current_state(events)
        batch = next_batch(state, 5).collect()
        # priority head must serve Tier 1 while any tier-1 items pend
        assert all(r.priority_tier == 1 for r in batch)
        new_rows = []
        for r in batch:
            for status in ("assigned", "completed"):
                seq += 1
                new_rows.append(
                    (r.queue_id, r.review_id, r.priority_tier, status, 1, seq - 900, seq)
                )
        delta = spark.createDataFrame(
            new_rows,
            "queue_id long, review_id string, priority_tier int, status string,"
            " actor_id long, ord int, seq long",
        ).withColumn(
            "event_ts",
            F.to_timestamp(F.lit("2024-04-01 00:00:00")) + F.make_interval(mins=F.col("ord")),
        ).drop("ord")
        events = events.unionByName(delta)

    # --- golden queue-state table ("Updated Queue State") ---
    state = current_state(events)
    stats = {r.priority_tier: r for r in queue_statistics(state).collect()}
    for tier, remaining in REMAINING_PER_TIER.items():
        assert stats[tier].pending == remaining, f"tier {tier}"
    assert stats[1].completed == LABELED
    assert sum(r.pending for r in stats.values()) == 88  # doc: "88 reviews remain"

    # --- golden label distribution (60/40 split, 70/30 confidence) ---
    completed_ids = [r.review_id for r in state.filter("status = 'completed'").collect()]
    labels = spark.createDataFrame(
        [
            (rid, GOLDEN_LABELS[i], GOLDEN_CONFIDENCE[i], 1 if i == 9 else 1)
            for i, rid in enumerate(sorted(completed_ids, key=lambda s: int(s[1:])))
        ],
        "review_id string, sentiment string, confidence string, rating int",
    )
    dist = {r.sentiment: r["count"] for r in labels.groupBy("sentiment").count().collect()}
    assert dist == {"very_negative": 6, "negative": 4}
    conf = {r.confidence: r["count"] for r in labels.groupBy("confidence").count().collect()}
    assert conf == {"high": 7, "medium": 3}

    # --- "No Star-Label Mismatches (Yet)": tier-1 rows are 1-2★ with
    # negative labels → the v_labeled_reviews flag must be 0 for all ---
    mismatch = labels.select(
        F.when(
            (F.col("sentiment").isin("positive", "very_positive") & (F.col("rating") <= 2))
            | (F.col("sentiment").isin("negative", "very_negative") & (F.col("rating") >= 4)),
            1,
        ).otherwise(0).alias("m")
    )
    assert mismatch.agg(F.sum("m")).collect()[0][0] == 0
