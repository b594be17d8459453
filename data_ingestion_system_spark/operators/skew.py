"""Skew-handling utilities — the 100 TB posture for hot keys (SURVEY §7.2 Stage 6).

The reference's corpus is visibly skewed (app volume max/min > 2×,
reference: src/analysis/data_quality_analyzer.py:336-341; at scale a hot
app_id dominates its shuffle partition). Primary defense is AQE skew-join
splitting (enabled in session.py); these helpers cover the cases AQE
doesn't: high-cardinality aggregation on a hot key and non-broadcastable
skewed joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-stage salted count: stage 1 aggregates (key, salt) — spreading
    a hot key over `n_salts` reducers — stage 2 merges the partials.
    Result-identical to `df.groupBy(key).count()`.

    The salt is derived from a per-row deterministic hash (no rand():
    reproducible under retries and partition changes)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("_salt")
    stage1 = df.groupBy(F.col(key), salt).agg(F.count("*").alias("_partial"))
    return stage1.groupBy(key).agg(F.sum("_partial").alias("count"))


def salted_join_skew_side(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Salted equi-join for a skewed big side when the small side is too
    large to broadcast: big rows get a deterministic salt in [0, n_salts);
    small rows are replicated n_salts times; join on (key, salt). One
    hot key fans out over n_salts reducers.

    Inner-join semantics; result-identical to big.join(small, key)."""
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(small_replicated, [key, "_salt"])
    return joined.drop("_salt")
