"""ANN index persistence: load serves identical results without
retraining; stale-fingerprint indexes are refused."""

from __future__ import annotations

import json
import os

import pytest

from data_ingestion_system_spark.registry import load_all
from data_ingestion_system_spark.similarity.index_store import (
    META,
    load_index,
    save_index,
)
from data_ingestion_system_spark.similarity.ivf import _index_cache


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_saved_index_round_trips_and_serves_identically(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "index")
    reg = load_all()

    meta = save_index(spark, sf_dir, idx)
    assert set(meta["artifacts"]) == {"centroids", "codebooks"}
    assert os.path.exists(os.path.join(idx, META))
    direct = _rows(reg["ann_ivf_topk"].spark(spark, sf_dir))

    # wipe the session cache: a query now would retrain — loading the
    # persisted index must restore serving without any Lloyd pass
    _index_cache(spark).clear()
    load_index(spark, sf_dir, idx)
    served = _rows(reg["ann_ivf_topk"].spark(spark, sf_dir))
    assert served == direct
    # and the composite consumer (IVF-PQ) serves off the same artifacts
    assert _rows(reg["ann_ivfpq_topk"].spark(spark, sf_dir))


def test_stale_fingerprint_is_refused(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "index")
    save_index(spark, sf_dir, idx)
    meta_path = os.path.join(idx, META)
    meta = json.load(open(meta_path))
    meta["fingerprint"] = "someone-elses-corpus|123|456"
    json.dump(meta, open(meta_path, "w"))
    _index_cache(spark).clear()
    with pytest.raises(ValueError, match="fingerprint"):
        load_index(spark, sf_dir, idx)
