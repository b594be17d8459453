"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_ingestion_system_spark``; every operator
registers itself in ``registry.REGISTRY`` with both the Spark builder and
the DuckDB oracle SQL (SURVEY.md §5 differential-testing strategy).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from data_ingestion_system_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A1 grouped multi-agg (`v_app_stats` shape, reference
    src/database/schema.sql:236-249) over orders ⋈ customer ⋈ nation.
    """
    registry = load_all()
    return registry["app_stats"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; omitted for non-SQL-expressible ops
    (seeded-random sampling internals, streaming state) → rows-only check."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
