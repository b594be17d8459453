"""sketch_refine_percentiles must be EXACT (identical to a full-column
percentile()) on distributions that stress the bracket windows:
duplicate-heavy columns (bracket boundaries hit value multiplicity),
two-valued columns, skewed long tails, and tiny inputs where every
rank lands on an interpolation boundary."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_ingestion_system_spark.operators.statistics import (
    _PCTS,
    sketch_refine_percentiles,
)


def _exact(df, pcts):
    row = df.agg(
        F.expr(
            f"percentile(x, array({', '.join(map(str, pcts))}))"
        ).alias("ps")
    ).collect()[0]
    return [round(v * 1e6) / 1e6 for v in row.ps]


def _refined(df, pcts):
    row = sketch_refine_percentiles(df, "x", pcts).collect()[0]
    return list(row.vals)


DISTRIBUTIONS = {
    "uniform": "CAST(id AS DOUBLE)",
    "dup_heavy": "CAST(id % 7 AS DOUBLE)",          # 7 distinct values x ~1400 dups
    "two_valued": "CAST(CASE WHEN id % 10 < 9 THEN 1 ELSE 100 END AS DOUBLE)",
    "skewed": "exp(CAST(id % 50 AS DOUBLE) / 5.0)",  # long right tail
    "negative": "CAST(-id AS DOUBLE) / 3.0",
}


@pytest.mark.parametrize("name", sorted(DISTRIBUTIONS))
def test_exact_on_distribution(spark, name):
    df = spark.range(10_000).select(F.expr(DISTRIBUTIONS[name]).alias("x"))
    assert _refined(df, _PCTS) == _exact(df, _PCTS)


def test_exact_on_tiny_input(spark):
    """n=3: every target rank interpolates between adjacent order stats."""
    df = spark.createDataFrame([(1.0,), (2.0,), (10.0,)], "x double")
    assert _refined(df, _PCTS) == _exact(df, _PCTS)


def test_exact_on_constant_column(spark):
    """Degenerate case the docstring flags: all values identical — the
    refine window is the whole column (unbounded memory at scale, noted
    as the groupBy-by-value escape hatch) but values must stay exact."""
    df = spark.range(1000).select(F.lit(42.5).alias("x"))
    assert _refined(df, _PCTS) == [42.5] * len(_PCTS)


def test_grouped_form_exact_under_extreme_skew(spark):
    """One group 200x another: the grouped scale path must still equal a
    per-group full-buffer percentile() on every group."""
    big = spark.range(20000).select(
        F.lit("big").alias("g"), (F.col("id") % 997).cast("double").alias("x")
    )
    small = spark.range(100).select(
        F.lit("small").alias("g"), (F.col("id") * 3).cast("double").alias("x")
    )
    df = big.union(small)
    pcts = [0.1, 0.5, 0.9, 0.99]
    got = {
        r.g: list(r.vals)
        for r in sketch_refine_percentiles(df, "x", pcts, group_cols=["g"]).collect()
    }
    for g in ("big", "small"):
        want = _exact(df.filter(F.col("g") == g), pcts)
        assert got[g] == want, g
    # and per-group n reflects the group, not the table
    ns = {
        r.g: r.n
        for r in sketch_refine_percentiles(df, "x", pcts, group_cols=["g"]).collect()
    }
    assert ns == {"big": 20000, "small": 100}


# --- hypothesis fuzz: ∀ (column transform, percentile set):
#     sketch_refine == single-buffer exact percentile, bit-for-bit -------
try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _TRANSFORMS = {
        "raw": "l_extendedprice",
        "neg": "-l_extendedprice",
        "log": "ln(l_extendedprice)",
        "mod": "l_quantity % 7",          # heavy value multiplicity
        "affine": "l_quantity * 3.5 - 2.0",
    }

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        tname=st.sampled_from(sorted(_TRANSFORMS)),
        pcts=st.lists(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            min_size=1,
            max_size=6,
            unique=True,
        ),
    )
    def test_fuzz_sketch_refine_matches_exact(spark, tname, pcts):
        from pyspark.sql import functions as F

        from data_ingestion_system_spark.operators.statistics import (
            sketch_refine_percentiles,
        )
        from data_ingestion_system_spark.tables import load_table

        li = (
            load_table(spark, "/root/testdata/sf0.001", "lineitem")
            .select(F.expr(_TRANSFORMS[tname]).alias("x"))
            .filter(F.col("x").isNotNull())
        )
        pcts = sorted(pcts)
        got = sketch_refine_percentiles(li, "x", pcts).collect()[0]["vals"]
        arr = ", ".join(str(p) for p in pcts)
        want_raw = li.agg(F.expr(f"percentile(x, array({arr}))").alias("ps")).collect()[0][
            "ps"
        ]
        want = [round(v * 1e6) / 1e6 for v in want_raw]
        assert list(got) == want, (tname, pcts, got, want)
