"""Persist / load trained ANN index artifacts.

The session memo (`ivf._index_cache`) makes an index train-once-serve-
many WITHIN a session; this module is the across-session form every
vector deployment actually runs: centroids and PQ codebooks written to
parquet next to a fingerprint sidecar, loaded back into the session
cache at startup. Serving then never trains — `ann_ivf_topk` etc. hit
the cache exactly as if `train_centroids` had just run.

The fingerprint is `ivf.dataset_cache_key(sf_dir)` (embeddings parquet
path + mtime_ns + size): `load_index` REFUSES an index trained on a
different corpus generation instead of silently serving stale
centroids — the same staleness contract the in-session cache enforces.

Artifacts are tiny (K centroids + M·2^bits codebook rows), so this is
metadata-scale I/O; at 100 TB the win is exactly that serving reads
kilobytes of index instead of re-running Lloyd over the corpus sample.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from data_ingestion_system_spark.similarity.ivf import (
    CENT_SCHEMA,
    _index_cache,
    N_CELLS,
    dataset_cache_key,
    warm_index_cache,
)
from data_ingestion_system_spark.similarity.pq import CODES_SCHEMA

META = "index_meta.json"


def save_index(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Train (or reuse the session-cached) index for `sf_dir` and persist
    centroids + codebooks + fingerprint. Returns the metadata dict."""
    warm_index_cache(spark, sf_dir)
    key = dataset_cache_key(sf_dir)
    cache = _index_cache(spark)
    os.makedirs(out_dir, exist_ok=True)
    meta = {"fingerprint": key, "artifacts": {}}
    for kind, schema in (("centroids", CENT_SCHEMA), ("codebooks", CODES_SCHEMA)):
        # the ANN index's coarse quantizer is the fixed-K (N_CELLS) one;
        # its session memo carries the cell count (adaptive-K SemDeDup
        # quantizers memoize separately and are retrained per corpus)
        rows = cache[(kind, key, N_CELLS) if kind == "centroids" else (kind, key)]
        with open(os.path.join(out_dir, f"{kind}.json"), "w") as fh:
            json.dump(rows, fh)
        meta["artifacts"][kind] = {"n_rows": len(rows), "schema": schema}
    tmp = os.path.join(out_dir, META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, META))  # marker-last commit
    return meta


def load_index(spark: SparkSession, sf_dir: str, index_dir: str) -> dict:
    """Seed the session index cache from a persisted index. Raises
    ValueError if the index was trained on a different corpus
    generation (fingerprint mismatch) — retrain rather than serve
    stale centroids."""
    with open(os.path.join(index_dir, META)) as fh:
        meta = json.load(fh)
    key = dataset_cache_key(sf_dir)
    if meta["fingerprint"] != key:
        raise ValueError(
            f"index fingerprint {meta['fingerprint']!r} does not match the "
            f"corpus at {sf_dir!r} ({key!r}) — retrain via save_index"
        )
    cache = _index_cache(spark)
    for kind in meta["artifacts"]:
        with open(os.path.join(index_dir, f"{kind}.json")) as fh:
            rows = json.load(fh)
        # JSON round-trips tuples as lists — restore the (id, vec) shape
        memo = (kind, key, N_CELLS) if kind == "centroids" else (kind, key)
        cache[memo] = [tuple(r) for r in rows]
    return meta
