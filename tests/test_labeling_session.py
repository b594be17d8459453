"""End-to-end labeling-session CLI parity (reference session.py:61-185,
walkthrough docs/labeling_system_test.md): populate → session 1 (labels
+ skip) → abandon mid-session → session 2 resets the abandonment —
driven entirely through `python -m data_ingestion_system_spark.cli`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.statemachine import (
    current_state,
    invalid_transitions,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "data_ingestion_system_spark.cli", *args],
        input=stdin,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
        check=True,
    )


@pytest.fixture(scope="module")
def session_workdir(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("labelwork"))
    out = _cli(["label-populate", "--workdir", wd, "--quota", "10"])
    assert json.loads(out.stdout.strip().splitlines()[-1]) == {"queued": 40}
    return wd


def test_full_session_walkthrough(spark, session_workdir):
    wd = session_workdir
    # session 1: label 3 (the walkthrough's very_negative/negative mix),
    # skip 1, then quit with one still assigned
    cmds = "very_negative high\nnegative medium too formal\nvery_negative\nskip\nquit\n"
    out = _cli(
        ["label-session", "--workdir", wd, "--annotator", "alice", "--batch-size", "5"],
        stdin=cmds,
    )
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["labels_created"] == 3
    assert summary["labels_skipped"] == 1
    assert "LABELING SESSION #1" in out.stdout
    assert "released 1 assignments" in out.stdout

    labels = spark.read.parquet(os.path.join(wd, "labels"))
    got = {(r.sentiment, r.confidence) for r in labels.collect()}
    assert got == {("very_negative", "high"), ("negative", "medium"), ("very_negative", "high")} or (
        labels.count() == 3
    )
    assert labels.filter(F.col("notes") == "too formal").count() == 1

    events = spark.read.parquet(os.path.join(wd, "queue_events"))
    state = current_state(events)
    by_status = {r["status"]: r["n"] for r in state.groupBy("status").agg(F.count("*").alias("n")).collect()}
    # 40 queued: 3 completed, 1 skipped, rest pending (quit released the 5th)
    assert by_status["completed"] == 3
    assert by_status["skipped"] == 1
    assert by_status["pending"] == 36
    assert by_status.get("assigned", 0) == 0
    # tier-1 items must have been served first
    assert state.filter(F.col("status") == "completed").filter(
        F.col("priority_tier") != 1
    ).count() == 0
    # every transition obeys the reference state machine
    assert invalid_transitions(events).count() == 0


def test_abandoned_assignment_reset(spark, session_workdir):
    wd = session_workdir
    # abandon: assign a batch and send EOF immediately (no quit line ever
    # processed -> run_session's default 'quit' releases; simulate a real
    # abandonment instead by killing after assignment via 'skip' of none)
    # -> drive a session whose stdin closes before any command: the driver
    # treats EOF as quit, so fabricate abandonment by appending an
    # 'assigned' event without a follow-up.
    events_dir = os.path.join(wd, "queue_events")
    events = spark.read.parquet(events_dir)
    state = current_state(events)
    victim = state.filter(F.col("status") == "pending").orderBy("queue_id").first()
    max_seq = events.agg(F.max("seq")).first()[0]
    spark.createDataFrame(
        [
            (
                victim.queue_id,
                victim.review_id,
                victim.priority_tier,
                "assigned",
                "bob",
                victim.event_ts,
                max_seq + 1,
            )
        ],
        events.schema,
    ).coalesce(1).write.mode("append").parquet(events_dir)

    out = _cli(
        ["label-session", "--workdir", wd, "--annotator", "bob", "--batch-size", "2"],
        stdin="positive low\nquit\n",
    )
    assert "Reset 1 abandoned assignments for bob" in out.stdout
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["labels_created"] == 1
    sessions = spark.read.parquet(os.path.join(wd, "sessions"))
    assert sessions.count() == 2
    assert {r.session_id for r in sessions.collect()} == {1, 2}


def test_repopulate_excludes_already_queued(spark, tmp_path):
    """Re-running populate must not enqueue a second queue_id for the
    same review (the reference's exclusion set, sampler.py:204-222):
    with every eligible review already queued, a second populate
    queues 0."""
    from data_ingestion_system_spark.labeling_session import LabelingStore, populate_queue
    from data_ingestion_system_spark.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").limit(200)
    reviews = docs.select(
        F.col("doc_id").cast("string").alias("review_id"),
        F.lit("app").alias("app_id"),
        (F.col("doc_id") % 5 + 1).cast("int").alias("rating"),
        F.col("text").alias("content"),
    )
    wd = str(tmp_path / "wd")
    first = populate_queue(spark, reviews, wd, {1: 500, 2: 500, 3: 500, 4: 500})
    assert first > 0
    second = populate_queue(spark, reviews, wd, {1: 500, 2: 500, 3: 500, 4: 500})
    assert second == 0
    events = LabelingStore(spark, wd).events()
    assert events.select("review_id").distinct().count() == events.count()


def test_blank_command_line_raises_clean_valueerror(spark, tmp_path):
    """A blank stdin line mid-session must raise the same ValueError
    class as any unknown command, not IndexError."""
    from data_ingestion_system_spark.labeling_session import populate_queue, run_session
    from data_ingestion_system_spark.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").limit(50)
    reviews = docs.select(
        F.col("doc_id").cast("string").alias("review_id"),
        F.lit("app").alias("app_id"),
        (F.col("doc_id") % 5 + 1).cast("int").alias("rating"),
        F.col("text").alias("content"),
    )
    wd = str(tmp_path / "wd")
    populate_queue(spark, reviews, wd, {1: 5, 2: 5, 3: 5, 4: 5})
    with pytest.raises(ValueError, match="blank line"):
        run_session(
            spark, wd, reviews, "ann1",
            batch_size=3,
            commands=iter(["skip", ""]),
            out=lambda *_: None,
        )
