"""MERGE semantics + queue-state-machine tests (SURVEY §2.1 S9-S10, §7.4.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.merge import insert_ignore, upsert
from data_ingestion_system_spark.operators.statemachine import (
    current_state,
    invalid_transitions,
    next_batch,
    queue_statistics,
)
from data_ingestion_system_spark.tables import load_table


def test_insert_ignore_counts(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    target = str(tmp_path / "target")
    r1 = insert_ignore(spark, docs.filter("doc_id < 300"), target, "doc_id")
    assert (r1.inserted, r1.skipped) == (300, 0)
    # overlapping second batch: 100 collisions skip silently
    r2 = insert_ignore(spark, docs.filter("doc_id >= 200 AND doc_id < 500"), target, "doc_id")
    assert (r2.inserted, r2.skipped) == (200, 100)
    stored = spark.read.parquet(target)
    assert stored.count() == stored.select("doc_id").distinct().count() == 500


def test_upsert_updates_and_inserts(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    target = str(tmp_path / "apps")
    upsert(spark, docs.filter("doc_id < 100"), target, "doc_id")
    # conflicting rows carry a changed attribute — must replace, not dup
    changed = docs.filter("doc_id >= 50 AND doc_id < 150").withColumn("lang", F.lit("xx"))
    r = upsert(spark, changed, target, "doc_id")
    assert (r.inserted, r.updated) == (50, 50)
    stored = spark.read.parquet(target)
    assert stored.count() == 150
    assert stored.filter("lang = 'xx'").count() == 100
    assert stored.filter("doc_id < 50 AND lang = 'xx'").count() == 0


def _events(spark):
    rows = [
        # queue_id, review_id, tier, status, actor, ts-ordinal, seq
        (1, "r1", 1, "pending", None, 1, 1),
        (1, "r1", 1, "assigned", 7, 2, 2),
        (1, "r1", 1, "completed", 7, 3, 3),
        (2, "r2", 2, "pending", None, 1, 4),
        (2, "r2", 2, "assigned", 8, 2, 5),
        (2, "r2", 2, "skipped", 8, 3, 6),
        (2, "r2", 2, "pending", None, 4, 7),  # requeued
        (3, "r3", 1, "pending", None, 1, 8),
        (4, "r4", 3, "pending", None, 1, 9),
        (5, "r5", 1, "pending", None, 1, 10),
        (5, "r5", 1, "completed", 9, 2, 11),  # invalid: pending→completed
    ]
    df = spark.createDataFrame(
        rows,
        "queue_id long, review_id string, priority_tier int, status string,"
        " actor_id long, ord int, seq long",
    )
    return df.withColumn(
        "event_ts",
        F.to_timestamp(F.lit("2024-04-01 00:00:00")) + F.make_interval(mins=F.col("ord")),
    ).drop("ord")


def test_latest_state_and_next_batch(spark):
    ev = _events(spark)
    state = current_state(ev)
    by_id = {r.queue_id: r.status for r in state.collect()}
    assert by_id == {1: "completed", 2: "pending", 3: "pending", 4: "pending", 5: "completed"}
    batch = next_batch(state, 2).collect()
    # tier ASC, queue_id ASC: queue 3 (tier1) before queue 2 (tier2)
    assert [r.queue_id for r in batch] == [3, 2]


def test_invalid_transition_audit(spark):
    ev = _events(spark)
    bad = invalid_transitions(ev).collect()
    assert len(bad) == 1
    assert bad[0].queue_id == 5 and bad[0].prev_status == "pending" and bad[0].status == "completed"


def test_queue_statistics_matrix(spark):
    ev = _events(spark)
    stats = queue_statistics(current_state(ev)).collect()
    tier1 = next(r for r in stats if r.priority_tier == 1)
    assert tier1.completed == 2 and tier1.pending == 1


def test_merge_apply_three_clauses(spark, tmp_path):
    """DELETE-before-UPDATE precedence, conditional clauses, untouched
    matched rows preserved, counters equal the written delta."""
    from data_ingestion_system_spark.operators.merge import merge_apply

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, v string, score int",
    )
    base.write.parquet(target)

    src = spark.createDataFrame(
        [
            (1, "a2", 11),   # matched, update (score < 100)
            (2, "xx", 999),  # matched, delete wins over update
            (3, "c2", 500),  # matched, neither clause -> untouched
            (5, "e", 50),    # not matched, insert
            (6, "f", 5000),  # not matched, insert condition rejects
        ],
        "k int, v string, score int",
    )
    from pyspark.sql import functions as F

    res = merge_apply(
        spark,
        src,
        target,
        "k",
        update_condition=F.col("score") < 100,
        delete_condition=F.col("v") == "xx",
        insert_condition=F.col("score") < 1000,
    )
    assert (res.inserted, res.updated, res.deleted, res.untouched) == (1, 1, 1, 1)
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == {
        (1, "a2", 11),  # updated
        (3, "c", 30),   # matched but untouched: ORIGINAL row survives
        (4, "d", 40),   # unmatched target row survives
        (5, "e", 50),   # inserted
    }, got


def test_merge_apply_null_clause_condition_cascades(spark, tmp_path):
    """A NULL clause condition is FALSE per the SQL standard: a matched
    row whose delete_condition evaluates to NULL must cascade to the
    UPDATE clause (and fire it if t_update holds), never be silently
    skipped by a NULL ~t_delete & t_update."""
    from data_ingestion_system_spark.operators.merge import merge_apply

    target = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, v string, score int"
    ).write.parquet(target)

    # v NULL for key 1 -> delete_condition (v == 'xx') is NULL -> UPDATE fires
    src = spark.createDataFrame(
        [(1, None, 11), (2, "xx", 22)], "k int, v string, score int"
    )
    res = merge_apply(
        spark, src, target, "k",
        delete_condition=F.col("v") == "xx",
    )
    assert (res.inserted, res.updated, res.deleted, res.untouched) == (0, 1, 1, 0)
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == {(1, None, 11)}, got


def test_merge_apply_rejects_duplicate_source_keys(spark, tmp_path):
    import pytest as _pytest

    from data_ingestion_system_spark.operators.merge import merge_apply

    src = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with _pytest.raises(ValueError, match="duplicate keys"):
        merge_apply(spark, src, str(tmp_path / "t2"), "k")


def test_merge_apply_bootstrap_missing_target(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_ingestion_system_spark.operators.merge import merge_apply

    src = spark.createDataFrame([(1, 5), (2, 5000)], "k int, score int")
    res = merge_apply(
        spark, src, str(tmp_path / "t3"), "k",
        insert_condition=F.col("score") < 1000,
    )
    assert (res.inserted, res.updated, res.deleted, res.untouched) == (1, 0, 0, 0)
    assert spark.read.parquet(str(tmp_path / "t3")).count() == 1


def test_current_state_survives_wall_clock_regression(spark):
    """seq is the unique monotone append order; a wall-clock step
    backwards between appends (NTP) must not resurrect stale state.
    Previously the view ordered by event_ts first, so a quit-release
    'pending' stamped 2 minutes earlier than the 'assigned' it undoes
    left the item stuck in 'assigned' forever."""
    rows = [
        # (queue_id, review_id, tier, status, actor, ord_minutes, seq)
        (9, "r9", 1, "pending", None, 10, 1),
        (9, "r9", 1, "assigned", 7, 12, 2),
        (9, "r9", 1, "pending", None, 8, 3),  # clock stepped BACK 4 min
    ]
    df = spark.createDataFrame(
        rows,
        "queue_id long, review_id string, priority_tier int, status string,"
        " actor_id long, ord int, seq long",
    ).withColumn(
        "event_ts",
        F.to_timestamp(F.lit("2024-04-01 00:00:00")) + F.make_interval(mins=F.col("ord")),
    ).drop("ord")
    state = current_state(df).collect()
    assert len(state) == 1 and state[0].status == "pending"
    # and the transition audit follows append order too: no phantom
    # pending->pending violation from the ts-sorted sequence
    assert invalid_transitions(df).count() == 0
