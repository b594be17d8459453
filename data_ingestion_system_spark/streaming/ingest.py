"""Structured-Streaming ingestion — SURVEY.md §2.8 (T1–T5, T8) + §2.1 S8–S10.

The reference hand-rolls micro-batch streaming: a sleep-loop scheduler
(reference: src/ingestion/scheduler.py:53-100), per-batch dedup against
the whole stored PK set (src/ingestion/pipeline.py:201-216), INSERT OR
IGNORE sinks (src/database/db_manager.py:141-230), a run-audit row per
batch (db_manager.py:266-314), and provenance rows
(db_manager.py:488-506). Spark-first equivalents:

- scheduler      → `trigger(processingTime=...)` / `Trigger.AvailableNow`
- checkpoints    → `checkpointLocation` (exactly-once source progress,
                   replacing file_storage.py:209-229 manual checkpoints)
- dedup sink     → per-batch anti-join against the target on the key
                   (INSERT OR IGNORE ≡ WHEN NOT MATCHED INSERT)
- audit + provenance → writes inside the same foreachBatch
- graceful stop  → `query.stop()` (scheduler.py:121-133 SIGINT path)

Scale: the anti-join reads only the key column of the target (column
pruning); with a Delta/Iceberg target this becomes MERGE with file-level
pruning. State never lives in driver memory, unlike the reference's
Python id-set.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class IngestPaths:
    source_dir: str      # landing files (the "scraper output")
    target_dir: str      # deduplicated store (reviews table equivalent)
    audit_dir: str       # scrape_runs equivalent, one row per batch
    provenance_dir: str  # review_scrape_log equivalent (key, batch_id)
    checkpoint_dir: str
    alerts_dir: str | None = None  # ingestion_metrics alerts (T5/T6)
    quarantine_dir: str | None = None  # CHECK-rule violators (+ reasons)


# thresholds mirroring monitor.py:72-78
DEDUP_RATE_ALERT = 0.995
INSERT_DROP_FACTOR = 0.5
DURATION_SPIKE_FACTOR = 2.0


def evaluate_batch_health(
    spark: SparkSession,
    paths: IngestPaths,
    batch_id: int,
    inserted: int,
    dedup_rate: float,
    duration_seconds: float,
) -> None:
    """Pre-commit health evaluation (T5, monitor.evaluate_run
    monitor.py:96-121): compare THIS batch's metrics (passed in — the
    audit row is not written yet) against the previous ≤5 batches'
    audit rows; the same three rules as
    operators.monitoring.anomaly_flags, evaluated incrementally at
    ingest time.

    Runs BEFORE the audit commit marker and writes alerts into a
    per-batch partition with dynamic overwrite, so the alert is part of
    the batch's replay-idempotent pre-marker writes: a crash between
    alerts and the audit append replays the batch and overwrites the
    same partition (previously alerts were appended AFTER the marker —
    a crash in between lost them forever, since replay short-circuits
    on the existing audit row). The baseline read is a 5-row
    TakeOrdered over the one-row-per-batch audit — metadata scale — not
    a full-history single-partition window sort; a healthy batch writes
    NOTHING (no empty-file accretion in alerts_dir)."""
    avg_inserted5 = avg_duration5 = None
    if os.path.isdir(paths.audit_dir) and any(
        f.endswith(".parquet") for f in os.listdir(paths.audit_dir)
    ):
        prev = (
            spark.read.parquet(paths.audit_dir)
            .filter(F.col("batch_id") < int(batch_id))
            .orderBy(F.col("batch_id").desc())
            .limit(5)
            .agg(
                F.avg(F.col("inserted").cast("double")).alias("ai"),
                F.avg("duration_seconds").alias("ad"),
            )
            .collect()[0]  # one aggregate row — metadata scale
        )
        avg_inserted5, avg_duration5 = prev.ai, prev.ad
    alerts = []
    if dedup_rate > DEDUP_RATE_ALERT:
        alerts.append("dedup_rate_ceiling")
    if avg_inserted5 is not None and inserted < INSERT_DROP_FACTOR * avg_inserted5:
        alerts.append("insert_drop")
    if avg_duration5 is not None and duration_seconds > DURATION_SPIKE_FACTOR * avg_duration5:
        alerts.append("duration_spike")
    _migrate_legacy_flat_alerts(spark, paths.alerts_dir)
    if alerts:
        spark.createDataFrame(
            [(int(batch_id), a) for a in alerts], "batch_id long, alert string"
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(paths.alerts_dir)
    else:
        # replay must fully SUPERSEDE a crashed attempt: dynamic
        # partition overwrite only replaces partitions PRESENT in the
        # written data, so when the replay computes no alerts (e.g. a
        # nondeterministic duration_spike fired pre-crash) the stale
        # partition would survive and be committed by the audit marker
        # as if real (ADVICE r9). Healthy evaluation = no partition.
        stale = os.path.join(paths.alerts_dir, f"batch_id={int(batch_id)}")
        if os.path.isdir(stale):
            shutil.rmtree(stale)


def _migrate_legacy_flat_alerts(spark: SparkSession, alerts_dir: str) -> None:
    """One layout for the alerts store (ADVICE r9): a dir written by the
    pre-partitioned (flat append) code would mix root-level part files
    with batch_id=N subdirs after the first partitioned write —
    unreadable by Spark. Unlike the near-dup state store's rename-only
    migration, flat alert files CONTAIN the batch_id column, so a rename
    into one partition dir would corrupt every row's batch id; instead
    the (metadata-tiny by construction: alert rows only) legacy files
    are rewritten once into their true per-batch partitions and the flat
    files removed. Idempotent under a crash mid-migration: the rewrite
    derives entirely from the flat files, prior `legacy-*` outputs are
    cleared before moving, and the flat files are deleted LAST."""
    if not os.path.isdir(alerts_dir):
        return
    flat = [f for f in os.listdir(alerts_dir) if f.endswith(".parquet")]
    if not flat:
        return
    legacy = spark.read.parquet(
        *[os.path.join(alerts_dir, f) for f in flat]
    ).select("batch_id", "alert")
    tmp = alerts_dir.rstrip("/") + ".__legacy_migration__"
    legacy.write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    for d in os.listdir(tmp):
        if not d.startswith("batch_id="):
            continue
        dest = os.path.join(alerts_dir, d)
        os.makedirs(dest, exist_ok=True)
        for stale in os.listdir(dest):
            if stale.startswith("legacy-"):
                os.remove(os.path.join(dest, stale))
        for f in os.listdir(os.path.join(tmp, d)):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(tmp, d, f), os.path.join(dest, "legacy-" + f)
                )
    shutil.rmtree(tmp)
    for f in flat:
        os.remove(os.path.join(alerts_dir, f))
        crc = os.path.join(alerts_dir, f".{f}.crc")
        if os.path.exists(crc):
            os.remove(crc)


def dedup_insert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    key_col: str,
    paths: IngestPaths,
    rules: list | None = None,
) -> None:
    """The foreachBatch body: INSERT-OR-IGNORE semantics + audit trail.

    Mirrors pipeline.run (pipeline.py:82-159): dedup within batch, dedup
    against store, append survivors, record run + provenance. Counts are
    computed from DataFrame aggregates, not driver loops.

    With ``rules`` (operators/integrity.Rule list — the CHECK-constraint
    gate the reference's schema enforces per-row, schema.sql:58,89-90,
    293-299), violators are diverted to ``paths.quarantine_dir`` with a
    `_violations` reasons column before dedup, written partitioned by
    batch_id with dynamic overwrite (replay-idempotent, like
    provenance), and counted in the audit record:
    fetched = inserted + skipped + quarantined.

    Replay-safe: the audit row is the commit marker — a replayed batch
    whose audit row already exists is skipped outright, and provenance is
    written as a dynamic overwrite of this batch's partition, so a crash
    between the provenance and audit writes cannot double-log keys. (A
    crash between the target append and the audit write replays with
    inserted=0/skipped=fetched — honest INSERT-OR-IGNORE accounting; the
    target itself stays exact via the anti-join.)
    """
    import time as _time

    t0 = _time.perf_counter()
    if rules and paths.quarantine_dir is None:
        # without a quarantine dir the violators would be dropped on the
        # floor while the audit claims they were diverted — fail fast
        raise ValueError(
            "dedup_insert_batch: rules= requires paths.quarantine_dir "
            "(CHECK violators are diverted, never destroyed)"
        )
    audit_exists = os.path.isdir(paths.audit_dir) and any(
        f.endswith(".parquet") for f in os.listdir(paths.audit_dir)
    )
    if audit_exists:
        already_done = (
            spark.read.parquet(paths.audit_dir)
            .filter(F.col("batch_id") == int(batch_id))
            .limit(1)
            .count()
        )
        if already_done:
            return

    batch_df = batch_df.dropDuplicates([key_col]).localCheckpoint(eager=True)
    fetched = batch_df.count()
    # provenance logs EVERY fetched key — including ones the CHECK gate
    # quarantines below — so the fetched/inserted/skipped/quarantined
    # audit counts reconcile against the provenance log exactly. The
    # `quarantined` flag keeps first-INSERT semantics recoverable:
    # timetravel's MIN(batch_id)-per-key must run over flag=false rows
    # only, or a key quarantined in batch Q and inserted in batch I > Q
    # would backdate snapshots to Q.
    prov_df = batch_df.select(F.col(key_col), F.lit(False).alias("quarantined"))

    quarantined = 0
    if rules:
        from data_ingestion_system_spark.operators.integrity import validate

        valid_df, quar_df = validate(batch_df, rules)
        if paths.quarantine_dir is not None:
            quar_df.withColumn(
                "batch_id", F.lit(int(batch_id)).cast("long")
            ).write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("batch_id").parquet(paths.quarantine_dir)
        batch_df = valid_df.localCheckpoint(eager=True)
        quarantined = fetched - batch_df.count()
        prov_df = valid_df.select(
            F.col(key_col), F.lit(False).alias("quarantined")
        ).unionByName(
            quar_df.select(F.col(key_col), F.lit(True).alias("quarantined"))
        )

    target_exists = os.path.isdir(paths.target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(paths.target_dir)
    )
    if target_exists:
        existing_keys = spark.read.parquet(paths.target_dir).select(key_col)
        # eager localCheckpoint pins the anti-join result: the lineage must
        # not recompute by re-reading target_dir mid-append (self-read-write)
        new_rows = batch_df.join(existing_keys, key_col, "left_anti").localCheckpoint(
            eager=True
        )
    else:
        new_rows = batch_df
    inserted = new_rows.count()
    skipped = fetched - quarantined - inserted
    status = "completed" if fetched else "empty"

    new_rows.write.mode("append").parquet(paths.target_dir)
    # provenance: every fetched key is logged for this run, including skips
    # (review_scrape_log records re-fetches too, db_manager.py:488-506);
    # partitioned by batch_id + dynamic overwrite → idempotent under replay
    prov_df.withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    ).write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
        "batch_id"
    ).parquet(paths.provenance_dir)
    dedup_rate = float(skipped) / fetched if fetched else 0.0
    duration = _time.perf_counter() - t0
    # health alerts are pre-marker writes (dynamic overwrite of this
    # batch's partition): crash-before-marker replays recompute them,
    # and the marker below commits batch state AND alerts together
    if paths.alerts_dir is not None:
        evaluate_batch_health(
            spark, paths, int(batch_id), inserted, dedup_rate, duration
        )
    audit = spark.createDataFrame(
        [(int(batch_id), fetched, inserted, skipped, quarantined,
          dedup_rate, status, duration)],
        "batch_id long, fetched long, inserted long, skipped long,"
        " quarantined long, dedup_rate double, status string,"
        " duration_seconds double",
    )
    audit.write.mode("append").parquet(paths.audit_dir)


def run_file_ingestion(
    spark: SparkSession,
    paths: IngestPaths,
    schema: StructType,
    key_col: str,
    max_files_per_trigger: int | None = 1,
    processing_time: str | None = None,
    await_seconds: float | None = None,
    rules: list | None = None,
):
    """Continuous (or one-shot) file-source ingestion.

    `processing_time=None` → Trigger.AvailableNow: drain everything
    pending and stop — the reference's `--once` mode (scheduler.py:65-86).
    A processing-time trigger reproduces the 4-hour cadence
    (settings.py:125) without a sleep loop.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(paths.source_dir)

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_insert_batch(spark, batch_df, batch_id, key_col, paths, rules=rules)

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", paths.checkpoint_dir
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if await_seconds is not None:
        query.awaitTermination(await_seconds)
        query.stop()  # graceful shutdown, T8
    else:
        query.awaitTermination()
    return query


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Event-time windowed aggregation with a watermark — the streaming
    twin of A2 daily stats. Late rows beyond `watermark_delay` are
    dropped and their state reclaimed (the reference has no late-data
    story at all; dedup-by-key was its only defense, SURVEY §2.8)."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup_within_watermark(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    key_col: str,
    ts_col: str = "ts",
    watermark_delay: str = "1 day",
):
    """Pure-streaming dedup alternative to the foreachBatch anti-join:
    `dropDuplicatesWithinWatermark` keys state on `key_col` and reclaims
    it once the watermark passes — bounded state for unbounded streams
    (SURVEY §7.4.5). Semantic difference vs INSERT-OR-IGNORE: duplicates
    arriving later than `watermark_delay` after the first sighting are
    NOT suppressed; the MERGE path has no such horizon. Use this when the
    re-delivery window is bounded (the reference's 4-hourly re-fetch is)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        [key_col]
    )
    query = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def run_windowed_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    window_duration: str = "1 hour",
):
    """Drain a file-source stream through the watermarked window agg into
    a parquet sink (append mode → only finalized windows emit)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(stream, window_duration)
    query = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def sessionized_event_counts(
    events_stream: DataFrame,
    gap_duration: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming session windows — the native `F.session_window` twin of
    operators/temporal.sessionization (batch gap-based sessions). State
    per (user, open session) merges rows while gaps stay under
    `gap_duration`; the watermark closes sessions and reclaims state, so
    memory is bounded by *open* sessions, not history — the property
    that matters on an unbounded 100-TB stream."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.session_window("ts", gap_duration).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_session_window_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    gap_duration: str = "30 minutes",
):
    """Drain a file-source stream through the session-window agg into a
    parquet sink (append mode -> only watermark-closed sessions emit)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = sessionized_event_counts(stream, gap_duration)
    query = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def run_api_ingestion(
    spark: SparkSession,
    paths: IngestPaths,
    key_col: str = "review_id",
    apps: int = 4,
    page_size: int = 50,
    max_pages_per_batch: int = 2,
    await_seconds: float = 120.0,
):
    """One scrape cycle: the paginated-API Python Data Source feeding the
    same idempotent-insert foreachBatch as file ingestion.

    This is the reference's main loop end-to-end (main.py: fetch pages →
    INSERT OR IGNORE → run audit) with Spark owning every moving part:
    the continuation token is the stream reader's checkpointed offset
    (sources/paginated.py), the page fetch fans out across executors,
    and the dedup/audit/provenance protocol is dedup_insert_batch
    unchanged — the sink cannot tell an API batch from a file batch.
    Trigger-once = one cycle of the reference's 4-hour scheduler; rerun
    with the same checkpoint_dir to continue at the committed cursor.
    """
    from data_ingestion_system_spark.sources import paginated

    paginated.register(spark)
    stream = (
        spark.readStream.format("paginated_reviews")
        .option("apps", apps)
        .option("page_size", page_size)
        .option("max_pages_per_batch", max_pages_per_batch)
        .load()
    )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_insert_batch(spark, batch_df, batch_id, key_col, paths)

    query = (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", paths.checkpoint_dir)
        .trigger(once=True)
        .start()
    )
    if not query.awaitTermination(await_seconds):
        # timeout: stop before returning, else the caller reads
        # target/audit dirs while foreachBatch is still appending
        query.stop()
    return query
