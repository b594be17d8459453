"""Label-queue state machine as an append-only event log — SURVEY.md §7.4.4.

The reference mutates `label_queue` rows in place through
pending→assigned→completed/skipped transitions
(reference: src/database/db_manager.py:637-714, schema.sql:315-330) —
an OLTP pattern that doesn't translate to immutable columnar storage.
The engine models it the lakehouse way:

    queue_events (append-only)  →  latest-state window view

Every transition is an append; current state is `row_number() = 1` per
queue_id ordered by event time. History is free (audit = the log itself),
writes never rewrite files, and the view is one partitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID_TRANSITIONS = {
    ("pending", "assigned"),
    ("assigned", "completed"),
    ("assigned", "skipped"),
    ("assigned", "pending"),  # quit-release / abandoned-assignment reset
    #                           (session.py:104-116, db_manager reset_abandoned)
    ("skipped", "pending"),  # requeue
}


def current_state(queue_events: DataFrame) -> DataFrame:
    """Latest-state view: one row per queue_id with its current status.

    queue_events schema: queue_id, review_id, priority_tier, status,
    actor_id (nullable), event_ts.
    """
    # seq is the unique monotone append order across all writers —
    # ordering by it FIRST makes the view immune to wall-clock
    # regressions (an NTP step between appends would otherwise
    # resurrect stale state); event_ts only tie-breaks legacy rows
    # that share a seq
    w = Window.partitionBy("queue_id").orderBy(F.desc("seq"), F.desc("event_ts"))
    return (
        queue_events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def next_batch(state: DataFrame, n: int) -> DataFrame:
    """Priority-queue head (db_manager.py:650-656): pending items ordered
    by (tier, queue_id), limit n — W3 on the latest-state view."""
    return (
        state.filter(F.col("status") == "pending")
        .orderBy(F.asc("priority_tier"), F.asc("queue_id"))
        .limit(n)
    )


def invalid_transitions(queue_events: DataFrame) -> DataFrame:
    """Audit query: transitions not in the reference's state machine —
    the engine's replacement for SQLite CHECK constraints (SURVEY §1.4)."""
    w = Window.partitionBy("queue_id").orderBy("seq", "event_ts")  # seq first, as above
    with_prev = queue_events.withColumn("prev_status", F.lag("status").over(w))
    valid = F.array(
        *[F.struct(F.lit(a).alias("f"), F.lit(b).alias("t")) for a, b in VALID_TRANSITIONS]
    )
    return with_prev.filter(
        F.col("prev_status").isNotNull()
        & ~F.array_contains(
            valid, F.struct(F.col("prev_status").alias("f"), F.col("status").alias("t"))
        )
    )


def queue_statistics(state: DataFrame) -> DataFrame:
    """tier × status matrix (db_manager.py:716-748) on the latest state."""
    return (
        state.groupBy("priority_tier")
        .pivot("status", ["pending", "assigned", "completed", "skipped"])
        .count()
        .na.fill(0)
        .orderBy("priority_tier")
    )
