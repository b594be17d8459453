"""Accuracy assertions for the approximate scale-path operators (their
exact twins are the hash-matched oracle queries)."""

from __future__ import annotations

from data_ingestion_system_spark.registry import load_all

REGISTRY = load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = REGISTRY["approx_distinct_users"].spark(spark, sf_dir).collect()[0]
    assert abs(row.approx_users - row.exact_users) <= max(2, 0.05 * row.exact_users)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    row = REGISTRY["approx_percentiles"].spark(spark, sf_dir).collect()[0]
    for approx, exact in [(row.approx_p50, row.exact_p50), (row.approx_p95, row.exact_p95)]:
        assert abs(approx - exact) / max(abs(exact), 1e-9) < 0.01
