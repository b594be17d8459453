"""Token-budget selection: bucketed-exact vs brute-force greedy."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.text.budget import select_within_budget


def _brute(rows, budget_fraction):
    total = sum(r[2] for r in rows)
    budget = int(total * budget_fraction)
    kept, cum = [], 0
    for r in sorted(rows, key=lambda r: (-r[3], r[0])):
        if cum + r[2] <= budget:
            kept.append(r[0])
            cum += r[2]
        else:
            break
    return set(kept)


def _check(spark, rows, fraction):
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, s6 double"
    )
    got = {r["doc_id"] for r in select_within_budget(df, fraction).collect()}
    assert got == _brute(rows, fraction), (got, _brute(rows, fraction))


def test_budget_inside_one_bucket(spark):
    """Budget smaller than the best decile: only the boundary-bucket
    window decides, and it must cut mid-bucket exactly."""
    rows = [(i, "s", 10, 1.0 - i / 100.0) for i in range(50)]
    _check(spark, rows, 0.05)


def test_budget_spans_buckets_with_ties(spark):
    """Equal scores straddling a decile cut stay together; doc_id breaks
    the tie inside the boundary bucket exactly like the global greedy."""
    rows = [(i, "s", 7, round(1.0 - (i // 5) / 10.0, 6)) for i in range(50)]
    _check(spark, rows, 0.37)


def test_budget_covers_everything(spark):
    rows = [(i, "s", 3, float(i)) for i in range(20)]
    _check(spark, rows, 1.0)
