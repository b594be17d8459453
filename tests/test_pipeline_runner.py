"""Resumable pipeline runner: marker-gated skip, equivalence to the
one-shot query, and recompute of unmarked (torn) stages."""

from __future__ import annotations

import os
import shutil

from data_ingestion_system_spark.registry import load_all
from data_ingestion_system_spark.text.pipeline_runner import (
    MARKER,
    run_corpus_prep,
)

STAGES = ["quality_ids", "clf_keep_ids", "dup_drop", "contaminated", "survivors", "chunks"]


def _report_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_runner_matches_oneshot_query_and_resumes(spark, sf_dir, tmp_path):
    wd = str(tmp_path / "work")

    r1 = run_corpus_prep(spark, sf_dir, wd)
    assert r1["ran"] == STAGES and r1["skipped"] == []
    # the materialized DAG must agree with the lazy one-shot query
    oneshot = load_all()["corpus_prep_pipeline"].spark(spark, sf_dir)
    assert _report_rows(r1["report"]) == _report_rows(oneshot)

    # full resume: everything skips, same report
    r2 = run_corpus_prep(spark, sf_dir, wd)
    assert r2["ran"] == [] and r2["skipped"] == STAGES
    assert _report_rows(r2["report"]) == _report_rows(r1["report"])


def test_runner_recomputes_torn_and_downstream_missing_stages(spark, sf_dir, tmp_path):
    wd = str(tmp_path / "work")
    run_corpus_prep(spark, sf_dir, wd)

    # simulate a crash mid-"survivors": output half-written, marker never
    # landed -> that stage (and the downstream chunks dir we also drop)
    # must recompute; the four upstream gates stay cached
    os.remove(os.path.join(wd, "survivors", MARKER))
    shutil.rmtree(os.path.join(wd, "chunks"))
    r = run_corpus_prep(spark, sf_dir, wd)
    assert r["ran"] == ["survivors", "chunks"]
    assert r["skipped"] == ["quality_ids", "clf_keep_ids", "dup_drop", "contaminated"]
    oneshot = load_all()["corpus_prep_pipeline"].spark(spark, sf_dir)
    assert _report_rows(r["report"]) == _report_rows(oneshot)


def test_serial_stage_dispatch_equals_parallel(spark, sf_dir, monkeypatch):
    """The >PIPELINE_PARALLEL_MAX_DOCS plan (serial stage
    materialization, dup stage reusing the shared token relation) must
    return the identical yield report as the small-corpus parallel plan
    — the dispatch changes scheduling and checkpoint storage, never the
    answer."""
    from data_ingestion_system_spark.text import pipeline as pl

    par = _report_rows(pl.corpus_prep_pipeline(spark, sf_dir))
    monkeypatch.setattr(pl, "PIPELINE_PARALLEL_MAX_DOCS", 0)
    ser = _report_rows(pl.corpus_prep_pipeline(spark, sf_dir))
    assert par == ser
