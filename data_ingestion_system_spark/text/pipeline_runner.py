"""Resumable corpus-prep pipeline runner — stage materialization with
commit markers.

`corpus_prep_pipeline` (text/pipeline.py) is the one-shot lazy query;
this runner is how the same DAG runs in production over a corpus that
takes hours per stage: every stage's output is materialized to parquet
under a work directory with a `_STAGE_DONE` commit marker written
AFTER the parquet lands, and a re-run skips any stage whose marker
exists — so a job killed in stage 4 resumes at stage 4, not at zero.
The marker-last ordering means a half-written stage (no marker) is
recomputed and overwritten, never trusted — the same
commit-marker-last invariant as `sources/jsonl_sink.py` and the
metadata sidecar (S13).

Stage graph (each node = one parquet dataset of doc_ids, the report
consumes all of them):

    quality_ids   clf_keep_ids   dup_drop   contaminated
         \\            |             |          /
          +------------+---- survivors ------+
                             |
                          chunks -> report

At 100 TB the stage outputs double as the audit trail (how many docs
each gate removed — read them directly) and as shareable inputs: a
different pipeline variant (say, a stricter dedup) re-uses the
quality/classifier stages untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.tables import load_table
from data_ingestion_system_spark.text.chunking import chunk_documents
from data_ingestion_system_spark.text.contamination import BENCH_MOD
from data_ingestion_system_spark.text.pipeline import (
    stage_clf_keep_ids,
    stage_contaminated,
    stage_dup_drop,
    stage_quality_ids,
)

MARKER = "_STAGE_DONE"


def _stage(
    spark: SparkSession, work_dir: str, name: str, build, ran: list, skipped: list
) -> DataFrame:
    """Materialize-or-reuse one stage: compute + write + marker-last on
    a miss, plain parquet read on a hit."""
    out = os.path.join(work_dir, name)
    marker = os.path.join(out, MARKER)
    if os.path.exists(marker):
        skipped.append(name)
        return spark.read.parquet(out)
    build().write.mode("overwrite").parquet(out)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    ran.append(name)
    return spark.read.parquet(out)


def run_corpus_prep(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> dict:
    """Run (or resume) the 5-stage pipeline. Returns
    {"report": DataFrame, "ran": [...], "skipped": [...]}."""
    os.makedirs(work_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    ran: list = []
    skipped: list = []

    quality = _stage(spark, work_dir, "quality_ids", lambda: stage_quality_ids(docs), ran, skipped)
    clf = _stage(spark, work_dir, "clf_keep_ids", lambda: stage_clf_keep_ids(docs), ran, skipped)
    dup = _stage(
        spark,
        work_dir,
        "dup_drop",
        lambda: stage_dup_drop(docs, n_docs=docs.count()),
        ran,
        skipped,
    )
    contam = _stage(spark, work_dir, "contaminated", lambda: stage_contaminated(docs), ran, skipped)

    def _survivors() -> DataFrame:
        candidates = docs.filter(~(F.pmod("doc_id", F.lit(BENCH_MOD)) == 0))
        return (
            candidates.join(quality, "doc_id", "left_semi")
            .join(clf, "doc_id", "left_semi")
            .join(dup, "doc_id", "left_anti")
            .join(contam, "doc_id", "left_anti")
        )

    survivors = _stage(spark, work_dir, "survivors", _survivors, ran, skipped)

    def _chunks() -> DataFrame:
        return chunk_documents(survivors.select("doc_id", "text")).join(
            survivors.select("doc_id", "source"), "doc_id"
        )

    chunks = _stage(spark, work_dir, "chunks", _chunks, ran, skipped)

    candidates = docs.filter(~(F.pmod("doc_id", F.lit(BENCH_MOD)) == 0))
    report = (
        candidates.groupBy("source").agg(F.count("*").alias("n_candidates"))
        .join(
            survivors.groupBy("source").agg(F.count("*").alias("n_kept")),
            "source",
            "left",
        )
        .join(
            chunks.groupBy("source").agg(
                F.count("*").alias("n_chunks"), F.sum("n_tokens").alias("n_tokens")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_candidates",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
        .orderBy("source")
    )
    return {"report": report, "ran": ran, "skipped": skipped}
