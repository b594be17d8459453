#!/usr/bin/env python
"""Validate the ngram candidate-scheme dispatch on a corpus family
(VERDICT r6 ask #3): the volume probe's estimates vs EXACT measured
join volumes, the scheme it picks, and a timed A/B of both schemes.

The r6 calibration only ever saw the 31-word saturated vocabulary; this
tool runs the same production relations (dedup/minhash
`_ngram_prefix_relations` / `_ngram_scheme_probe`) on any generated dir
— in particular the `--vocab zipf` corpora — and reports:

  * probe estimates (est_single_rows, est_pairkey_postings, est_ratio)
    and the dispatch decision,
  * EXACT measured volumes: single-gram match rows Σ_g C(c_g, 2) over
    prefix posting counts, pair-key postings Σ_doc C(L_pref, 2),
  * wall time + verified-pair count of BOTH forced schemes (answers
    must agree).

Usage:
    python tools/ngram_dispatch_probe.py /tmp/sf1.0-zipf [/tmp/sf1.0 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_system_spark.dedup.minhash import (  # noqa: E402
    _ngram_jaccard_pairs,
    _ngram_prefix_relations,
    _ngram_scheme_probe,
)
from data_ingestion_system_spark.session import get_spark  # noqa: E402

P, Q = 3, 10


def probe_dir(spark, sf_dir: str, time_schemes: bool = True) -> dict:
    gram_ids, _gram_sets, prefix, n_docs = _ngram_prefix_relations(spark, sf_dir, P, Q)
    scheme, est = _ngram_scheme_probe(gram_ids, n_docs, P, Q)
    prefix = prefix.localCheckpoint(eager=True)  # measured twice below
    meas = prefix.groupBy("gid").agg(F.count("*").alias("c")).agg(
        F.sum(F.expr("c * (c - 1) / 2")).alias("single_rows")
    ).first()
    meas_pk = prefix.groupBy("doc_id").agg(F.count("*").alias("lp")).agg(
        F.sum(F.expr("lp * (lp - 1) / 2")).alias("pk_postings")
    ).first()
    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "dispatch": scheme,
        "probe": {k: round(v, 2) if isinstance(v, float) else v for k, v in est.items()},
        "measured_single_rows": int(meas.single_rows or 0),
        "measured_pk_postings": int(meas_pk.pk_postings or 0),
        "est_over_measured_single": round(
            est["est_single_rows"] / max(1, int(meas.single_rows or 0)), 2
        ),
        "est_over_measured_pk": round(
            est["est_pairkey_postings"] / max(1, int(meas_pk.pk_postings or 0)), 2
        ),
    }
    if time_schemes:
        for forced in ("single", "pairkey"):
            t0 = time.perf_counter()
            n_pairs = _ngram_jaccard_pairs(spark, sf_dir, force_scheme=forced).count()
            out[f"{forced}_sec"] = round(time.perf_counter() - t0, 1)
            out[f"{forced}_pairs"] = n_pairs
        assert out["single_pairs"] == out["pairkey_pairs"], out
    return out


def main(dirs: list[str]) -> None:
    spark = get_spark(app_name="ngram-dispatch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(probe_dir(spark, d)), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/sf1.0-zipf"])
