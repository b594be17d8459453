"""Scalar column expressions — the engine's reusable function library.

All pure Column expressions (JVM-side, codegen-friendly); no Python UDFs.
Mirrors the reference's scalar surface (SURVEY.md §2.7) plus the
determinism conventions from SURVEY.md §4.2:

- `sentiment_bucket` / `length_bucket`: the CASE ladders of
  reference src/database/schema.sql:219-232.
- `safe_div`: division-safe ratio, reference src/analysis/deep_analysis.py:37-38.
- `det_rank_key`: deterministic stand-in for ORDER BY RANDOM()
  (reference src/labeling/sampler.py:142) — md5 of (seed, key) gives a
  uniform, engine-portable pseudo-random ordering that a SQL oracle can
  reproduce exactly (DuckDB md5 == Spark md5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sentiment_bucket(rating: Column) -> Column:
    """rating>=4 → positive, =3 → neutral, else negative (schema.sql:219-226)."""
    return (
        F.when(rating >= 4, F.lit("positive"))
        .when(rating == 3, F.lit("neutral"))
        .otherwise(F.lit("negative"))
    )


def length_bucket(n: Column) -> Column:
    """≤10 very_short / ≤50 short / ≤200 medium / else long (schema.sql:227-232)."""
    return (
        F.when(n <= 10, F.lit("very_short"))
        .when(n <= 50, F.lit("short"))
        .when(n <= 200, F.lit("medium"))
        .otherwise(F.lit("long"))
    )


def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """num/den, `default` when den is 0/NULL (deep_analysis.py:37-38)."""
    return F.when(den.isNotNull() & (den != 0), num / den).otherwise(F.lit(default))


def det_rank_key(key: Column, seed: int = 42) -> Column:
    """Deterministic pseudo-random sort key: md5(seed || key).

    Replaces ORDER BY RANDOM() / random.shuffle for sampling and splits so
    both engines (Spark + DuckDB oracle) order rows identically. Uniformity
    is as good as md5; determinism is exact.
    """
    return F.md5(F.concat(F.lit(str(seed) + ":"), key.cast("string")))


def oracle_det_rank_key(key_sql: str, seed: int = 42) -> str:
    """DuckDB-side rendering of `det_rank_key` for oracle strings."""
    return f"md5(concat('{seed}:', CAST({key_sql} AS VARCHAR)))"


def round_port(col: Column, scale: int) -> Column:
    """Engine-portable rounding: round(x * 10^scale) / 10^scale.

    Spark's round(x, n) decimal-string-rounds (HALF_UP on the shortest
    repr) while DuckDB rounds the scaled double — at a half boundary like
    avg=141428.955 they disagree (.96 vs .95). Scaling first makes both
    engines round the *same* IEEE double to an integer, where their
    semantics agree; the final division is bit-identical on both sides.
    Oracle SQL must use `oracle_round(expr, scale)` for the same shape.
    """
    f = float(10**scale)
    return F.round(col * f) / f


def oracle_round(expr_sql: str, scale: int) -> str:
    """DuckDB-side rendering of `round_port`."""
    f = float(10**scale)
    return f"ROUND(({expr_sql}) * {f}) / {f}"


U52_DENOM = float(1 << 52)

# Spark-side fast form of `u52_terms_sql("instr")` (r11, guide §1.2
# per-task work): ONE radix parse of the 13-digit hex prefix instead of
# 13 substr+instr pairs — measured ~3x cheaper per evaluation on a 4M-hash
# scan and verified bit-identical (0 mismatches over 200k hashes; both
# LongType; NULL h → NULL either way). conv() exists only on the Spark
# side, so DuckDB oracle strings keep the digit-position sum — the two
# expressions compute the same base-16 integer, which is the only
# contract the cross-engine parity needs. 52 bits < 2^63, so the BIGINT
# cast is exact.
U52_SPARK_SQL = "CAST(conv(substr(h, 1, 13), 16, 10) AS BIGINT)"


def u52_terms_sql(instr_fn: str) -> str:
    """Expression (over a column named ``h`` holding an md5 hex digest)
    for the first 13 hex digits as a 52-bit integer. 52 bits fit a
    double exactly, and the digit-position sum uses only integer
    arithmetic both engines evaluate identically — so
    ``(u52 + 0.5) / 2^52`` is a bit-identical uniform in (0,1) on Spark
    (``instr``) and DuckDB (``strpos``). The md5 itself comes from
    `det_rank_key`, hoisted into ``h`` once per row."""
    return " + ".join(
        f"({instr_fn}('0123456789abcdef', substr(h, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (12 - i)} AS BIGINT)"
        for i in range(13)
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation (deep_analysis.py:398)."""
    punct_count = F.length(text) - F.length(
        F.regexp_replace(text, r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]""", "")
    )
    return safe_div(punct_count.cast("double"), F.length(text).cast("double"))
