"""Token-budget data selection — keep the highest-quality documents
whose tokens fit a training budget.

The standard corpus-assembly step after scoring: sort by quality, take
documents until the token budget is spent (the greedy form used by
quality-filtered subset selection in LLM data pipelines). The naive
plan is a GLOBAL sort + running sum — a single-partition window at
100 TB. This implementation reproduces the exact greedy result with
bounded memory:

1. decile cut points of the (rounded) quality score from the engine's
   exact sketch+refine percentile path (operators/statistics.py);
2. per-bucket token totals (10 rows) → which bucket the budget
   boundary falls in — driver never sees a row, the cumulative sum is
   a 10-row window;
3. buckets strictly above the boundary are kept whole (no sort at
   all); ONLY the boundary bucket is sorted — a window over ~1/10 of
   the corpus (or less with more cut points) — to find the exact
   cutoff inside it.

Equal scores never straddle a bucket edge (bucket assignment compares
the same rounded score the ordering uses), so the bucketed selection
equals the global-window greedy row-for-row; the DuckDB oracle runs
the global form and the hash must match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import corpus_checkpoint_lazy, load_table

BUDGET_FRACTION = 0.3  # spend 30% of the corpus token mass
N_SCORE_BUCKETS = 10


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_system_spark.text.classifier import (
        hashed_weight_table,
        score_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return score_documents(docs, hashed_weight_table(spark)).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        round_port(F.col("score"), 6).alias("s6"),
    )


def select_within_budget(scored: DataFrame, budget_fraction: float = BUDGET_FRACTION) -> DataFrame:
    """(doc_id, source, n_tokens, s6) kept by greedy quality-descending
    selection under `budget_fraction` of total tokens — bucketed exact
    form (see module docstring)."""
    from data_ingestion_system_spark.operators.statistics import (
        sketch_refine_percentiles,
    )

    pcts = [i / N_SCORE_BUCKETS for i in range(1, N_SCORE_BUCKETS)]
    cuts = sketch_refine_percentiles(scored, "s6", pcts).select(
        "vals", F.col("n").alias("n_total")
    )
    # bucket 0..9, higher = better score; equal scores share a bucket
    bucketed = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "source",
        "n_tokens",
        "s6",
        F.size(F.filter(F.col("vals"), lambda c: F.col("s6") > c)).alias("bkt"),
    ).transform(corpus_checkpoint_lazy)

    budget = bucketed.agg(
        F.floor(F.sum("n_tokens") * F.lit(budget_fraction)).cast("bigint").alias("budget")
    )
    # 10-row bucket ledger: tokens above each bucket (processed best-first)
    wdesc = Window.orderBy(F.desc("bkt"))
    ledger = (
        bucketed.groupBy("bkt")
        .agg(F.sum("n_tokens").alias("bkt_tokens"))
        .withColumn(
            "cum_through",
            F.sum("bkt_tokens").over(wdesc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "cum_above",
            F.coalesce(
                F.sum("bkt_tokens").over(wdesc.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .crossJoin(F.broadcast(budget))
    )
    whole = ledger.filter(F.col("cum_through") <= F.col("budget")).select("bkt")
    boundary = (
        ledger.filter(
            (F.col("cum_through") > F.col("budget")) & (F.col("cum_above") <= F.col("budget"))
        )
        .select("bkt", (F.col("budget") - F.col("cum_above")).alias("remaining"))
    )
    kept_whole = bucketed.join(F.broadcast(whole), "bkt", "left_semi")
    # ONLY the boundary bucket sorts — window over one bucket's rows
    wb = Window.partitionBy("bkt").orderBy(F.desc("s6"), F.asc("doc_id"))
    kept_boundary = (
        bucketed.join(F.broadcast(boundary), "bkt")
        .withColumn(
            "cum_in",
            F.sum("n_tokens").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("cum_in") <= F.col("remaining"))
        .drop("remaining", "cum_in")
    )
    return kept_whole.unionByName(kept_boundary).select(
        "doc_id", "source", "n_tokens", "s6"
    )


_BUDGET_ORACLE = f"""
WITH {{CLASSIFIER_CTES}},
scored AS (
  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         ROUND(score * 1000000.0) / 1000000.0 AS s6
  FROM clfscored
), b AS (
  SELECT CAST(FLOOR(SUM(n_tokens) * {BUDGET_FRACTION}) AS BIGINT) AS budget FROM scored
), ranked AS (
  SELECT doc_id, source, n_tokens, s6,
         SUM(n_tokens) OVER (ORDER BY s6 DESC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM scored
), kept AS (
  SELECT r.* FROM ranked r, b WHERE r.cum <= b.budget
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
       ROUND(MIN(s6) * 1000000.0) / 1000000.0 AS min_score_kept
FROM kept
GROUP BY source
ORDER BY source
"""


def _budget_oracle() -> str:
    from data_ingestion_system_spark.text.classifier import CLASSIFIER_CTES

    return _BUDGET_ORACLE.replace("{CLASSIFIER_CTES}", CLASSIFIER_CTES)


@query("token_budget_selection", oracle=_budget_oracle(), survey="EXT-text,EXT-mlprep")
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source composition of the greedy quality-under-token-budget
    corpus subset (30% of token mass, hashed-classifier score order):
    how many documents and tokens each source contributes and the worst
    score admitted. The oracle computes the naive global-window greedy;
    the engine's bucketed plan must (and does) match it row-for-row
    while sorting only the boundary decile."""
    scored = _scored_docs(spark, sf_dir)
    kept = select_within_budget(scored)
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
            round_port(F.min("s6"), 6).alias("min_score_kept"),
        )
        .orderBy("source")
    )
