"""Multimodal column plumbing: exact assertions for the deterministic
fake feature extractor (the driver only rows-checks mapInPandas queries)."""

from __future__ import annotations

import pytest

from data_ingestion_system_spark.multimodal.columns import (
    decode_image_stub,
    multimodal_features,
)


def test_fake_features_match_python(spark, sf_dir):
    out = multimodal_features(spark, sf_dir).limit(20).collect()
    assert len(out) == 20
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id LIMIT 20"
    ).fetchall()
    expected = {}
    for doc_id, text in rows:
        b = text.encode("utf-8")
        expected[doc_id] = (len(b), sum(b) / len(b) if b else 0.0, sum(b[:8]))
    for r in out:
        n_bytes, mean_byte, first8 = expected[r.doc_id]
        assert r.n_bytes == n_bytes
        assert abs(r.mean_byte - mean_byte) < 1e-9
        assert r.first8_sum == first8


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\xff\xd8\xff")
