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


def test_count_min_sketch_bounds_heavy_hitter_counts(spark, sf_dir):
    """The CMS scale twin of `heavy_hitters`: estimates from
    count_min_sketch never undercount (one-sided error) and stay within
    eps * total mass of the exact frequencies."""
    from pyspark.sql import functions as F

    from data_ingestion_system_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    eps, conf = 0.001, 0.99
    sketch_bytes = tokens.agg(
        F.expr(f"count_min_sketch(token, {eps}d, {conf}d, 42)").alias("cms")
    ).collect()[0]["cms"]

    exact = {
        r["token"]: r["freq"]
        for r in tokens.groupBy("token").agg(F.count("*").alias("freq")).collect()
    }
    total = sum(exact.values())

    # probe the sketch for every exact token via the JVM CountMinSketch API
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    for token, freq in exact.items():
        est = cms.estimateCount(token)
        assert est >= freq, (token, est, freq)          # never undercounts
        assert est <= freq + eps * total * 3, (token, est, freq)
