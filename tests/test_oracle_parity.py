"""Differential tests: every registered query vs its DuckDB oracle.

This is the engine's primary correctness gate (SURVEY.md §5) — the
reference has no test suite, so we adopt a stronger strategy: each
SURVEY §2 operator is a named query whose Spark result must match the
equivalent ANSI SQL run by DuckDB on the same parquet, order-insensitively.
"""

from __future__ import annotations

import pytest

from data_ingestion_system_spark.registry import load_all

from conftest import assert_df_matches_oracle

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert_df_matches_oracle(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    """Non-SQL-expressible ops at least run and return a stable schema."""
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"n_name", "order_count", "avg_price"} <= set(df.columns)


def test_registry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 1
