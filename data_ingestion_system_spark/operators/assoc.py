"""Categorical association and metric correlation over the corpus.

The reference's analyzer reports per-group means and distributions
(src/analysis/deep_analysis.py:84-130) but never asks whether two
columns are RELATED — the first question a data audit asks before
trusting a stratified split or a per-source quota. Two classics:

* `chi2_lang_source` — Pearson chi-squared test of independence over
  the lang x source contingency table, plus Cramér's V (the bounded
  effect size). All observed/marginal counts are exact BIGINT; floats
  appear only in the expected-count division — no summation-order
  surface beyond the final 60-cell sum, rounded.
* `metric_correlation_matrix` — pairwise Pearson correlation between
  per-document integer metrics (chars, whitespace tokens, punctuation
  marks) computed from EXACT integer moment sums (n, Σx, Σy, Σxy, Σx²,
  Σy²), so both engines derive each correlation from identical
  integers; the closed-form ratio is the only float.

Scale shape: each query is one map-side-combinable groupBy over the
corpus followed by constant-size arithmetic (a cells x margins join on
tiny aggregates; a single 10-sum row). Nothing downstream of the first
aggregation scales with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import oracle_round, round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

_CHI2_ORACLE = f"""
WITH cells AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
), rowm AS (
  SELECT lang, SUM(o) AS rl FROM cells GROUP BY lang
), colm AS (
  SELECT source, SUM(o) AS cs FROM cells GROUP BY source
), tot AS (
  SELECT SUM(o) AS n FROM cells
), terms AS (
  SELECT POWER(c.o - CAST(r.rl * cm.cs AS DOUBLE) / t.n, 2)
           / (CAST(r.rl * cm.cs AS DOUBLE) / t.n) AS term
  FROM cells c JOIN rowm r USING (lang) JOIN colm cm USING (source)
  CROSS JOIN tot t
)
SELECT {oracle_round("SUM(term)", 6)} AS chi2,
       CAST((SELECT COUNT(*) FROM rowm) - 1 AS BIGINT)
         * CAST((SELECT COUNT(*) FROM colm) - 1 AS BIGINT) AS dof,
       {oracle_round(
           "SQRT(SUM(term) / ((SELECT n FROM tot) * LEAST("
           "(SELECT COUNT(*) FROM rowm) - 1,"
           "(SELECT COUNT(*) FROM colm) - 1)))", 6)} AS cramers_v,
       CAST((SELECT n FROM tot) AS BIGINT) AS n_docs
FROM terms
"""


@query("chi2_lang_source", oracle=_CHI2_ORACLE, survey="EXT-monitoring,A12")
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test of lang x source with Cramér's V:
    is document language associated with its source (if yes, a
    per-source sample is NOT language-balanced and the mixture weights
    must stratify on both)."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rowm = cells.groupBy("lang").agg(F.sum("o").alias("rl"))
    colm = cells.groupBy("source").agg(F.sum("o").alias("cs"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    expected = (F.col("rl") * F.col("cs")).cast("double") / F.col("n")
    term = F.pow(F.col("o") - expected, 2) / expected
    joined = cells.join(rowm, "lang").join(colm, "source").crossJoin(F.broadcast(tot))
    return joined.agg(
        round_port(F.sum(term), 6).alias("chi2"),
        ((F.first("n_langs") - 1) * (F.first("n_sources") - 1))
        .cast("bigint")
        .alias("dof"),
        round_port(
            F.sqrt(
                F.sum(term)
                / (
                    F.first("n")
                    * F.least(F.first("n_langs") - 1, F.first("n_sources") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
        F.first("n").cast("bigint").alias("n_docs"),
    )


# Per-document integer metrics; the punctuation pattern is the proven
# engine-portable marker class from text/analysis.py.
_METRICS = ("chars", "tokens", "punct")
_PAIRS = (("chars", "tokens"), ("chars", "punct"), ("tokens", "punct"))

_METRICS_SQL = """
  SELECT CAST(length(text) AS BIGINT) AS chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
         CAST(len(regexp_extract_all(text, '[^a-z0-9 ]', 0)) AS BIGINT) AS punct
  FROM documents
"""


def _corr_sql(x: str, y: str) -> str:
    # NULLIF: a zero-variance metric has no defined correlation — NULL,
    # not a divide-by-zero (Spark runs ANSI mode and would throw).
    num = f"CAST(n * s_{x}{y} - s_{x} * s_{y} AS DOUBLE)"
    den = (
        f"SQRT(CAST(n * s_{x}{x} - s_{x} * s_{x} AS DOUBLE))"
        f" * SQRT(CAST(n * s_{y}{y} - s_{y} * s_{y} AS DOUBLE))"
    )
    return oracle_round(f"{num} / NULLIF({den}, 0)", 6)


_CORR_ORACLE = f"""
WITH m AS ({_METRICS_SQL}),
s AS (
  SELECT COUNT(*) AS n,
         SUM(chars) AS s_chars, SUM(tokens) AS s_tokens, SUM(punct) AS s_punct,
         SUM(chars * chars) AS s_charschars,
         SUM(tokens * tokens) AS s_tokenstokens,
         SUM(punct * punct) AS s_punctpunct,
         SUM(chars * tokens) AS s_charstokens,
         SUM(chars * punct) AS s_charspunct,
         SUM(tokens * punct) AS s_tokenspunct
  FROM m
)
SELECT 'chars' AS metric_a, 'tokens' AS metric_b,
       {_corr_sql("chars", "tokens")} AS pearson_r FROM s
UNION ALL
SELECT 'chars', 'punct', {_corr_sql("chars", "punct")} FROM s
UNION ALL
SELECT 'tokens', 'punct', {_corr_sql("tokens", "punct")} FROM s
ORDER BY metric_a, metric_b
"""


@query("metric_correlation_matrix", oracle=_CORR_ORACLE, survey="EXT-monitoring,A8")
def metric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between per-document metrics
    (chars, whitespace tokens, punctuation marks) from exact integer
    moment sums — one corpus pass, then constant-size arithmetic. The
    redundancy check for quality features: r≈1 features double-count
    in any downstream linear scorer."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.length("text").cast("bigint").alias("chars"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"),
        F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
        .cast("bigint")
        .alias("punct"),
    )
    aggs = [F.count("*").alias("n")]
    for x in _METRICS:
        aggs.append(F.sum(x).alias(f"s_{x}"))
    for x, y in (("chars", "chars"), ("tokens", "tokens"), ("punct", "punct"),
                 ("chars", "tokens"), ("chars", "punct"), ("tokens", "punct")):
        aggs.append(F.sum(F.col(x) * F.col(y)).alias(f"s_{x}{y}"))
    s = m.agg(*aggs)

    def corr(x: str, y: str):
        n = F.col("n")
        num = (n * F.col(f"s_{x}{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")).cast(
            "double"
        )
        den = F.sqrt(
            (n * F.col(f"s_{x}{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")).cast("double")
        ) * F.sqrt(
            (n * F.col(f"s_{y}{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")).cast("double")
        )
        return round_port(num / F.nullif(den, F.lit(0.0)), 6)

    rows = [
        s.select(
            F.lit(x).alias("metric_a"),
            F.lit(y).alias("metric_b"),
            corr(x, y).alias("pearson_r"),
        )
        for x, y in _PAIRS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("metric_a", "metric_b")


_Z95 = 1.959963984540054  # two-sided 95% normal quantile

_WILSON_ORACLE = f"""
WITH s AS (
  SELECT source,
         COUNT(*) AS n,
         SUM(CASE WHEN len(string_split(text, ' ')) >= 50 THEN 1 ELSE 0 END) AS k
  FROM documents GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS kept,
       {oracle_round("CAST(k AS DOUBLE) / n", 6)} AS p_hat,
       {oracle_round(
           f"((CAST(k AS DOUBLE) / n) + {_Z95} * {_Z95} / (2 * n)"
           f" - {_Z95} * SQRT((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n"
           f"   + {_Z95} * {_Z95} / (4.0 * n * n)))"
           f" / (1 + {_Z95} * {_Z95} / n)", 6)} AS wilson_lo,
       {oracle_round(
           f"((CAST(k AS DOUBLE) / n) + {_Z95} * {_Z95} / (2 * n)"
           f" + {_Z95} * SQRT((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n"
           f"   + {_Z95} * {_Z95} / (4.0 * n * n)))"
           f" / (1 + {_Z95} * {_Z95} / n)", 6)} AS wilson_hi
FROM s ORDER BY source
"""


@query("keep_rate_wilson", oracle=_WILSON_ORACLE, survey="EXT-monitoring,A16")
def keep_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep rate (docs with >= 50 whitespace tokens) with the
    95% Wilson score interval — the uncertainty band a data card should
    print next to every rate, and the statistically-honest comparison
    between a 300-doc source and a 30k-doc one (the Wald interval the
    naive +/-1.96*sqrt(pq/n) gives collapses or overshoots at small n
    and extreme p; Wilson stays inside [0,1] and centers correctly).

    Both engines derive (n, k) as exact BIGINTs and evaluate the same
    closed-form ratio; the interval is the only float."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.size(F.split(F.col("text"), " ")) >= 50, 1).otherwise(0)
        ).alias("k"),
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    z2 = _Z95 * _Z95
    denom = 1 + z2 / n
    center = p + z2 / (2 * n)
    half = F.lit(_Z95) * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    return s.select(
        "source",
        n.cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("kept"),
        round_port(p, 6).alias("p_hat"),
        round_port((center - half) / denom, 6).alias("wilson_lo"),
        round_port((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("source")
