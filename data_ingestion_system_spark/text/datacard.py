"""Corpus data card — the one-table dataset summary published alongside
a training corpus (the "Datasheets for Datasets" / model-card companion
table: per-slice sizes, token budgets, length distribution, language
make-up).

The reference emits a per-run TXT report with corpus-level counts
(reference: src/analysis/report_generator.py); a training-data engine
needs the per-(source, lang) slice version that mixture design
(text/packing.py mixture_weights) and contamination review read.

Scale shape: one groupBy(source, lang) pass computes every column —
counts, token sums (size(split()) — no explode, no second scan), and
exact within-group percentiles. Exact grouped percentiles buffer per
group (ObjectHashAggregate); at 100 TB swap them for the
sketch+refine machinery already in
operators/statistics.sketch_refine_percentiles (the
`grouped_percentiles_sketch_refine` query) — the card's contract
doesn't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import oracle_round, round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

SHORT_DOC_CHARS = 100  # the card's "short document" flag threshold


_CARD_ORACLE = f"""
WITH d AS (
  SELECT source, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), slice_stats AS (
  SELECT source, lang,
         COUNT(*) AS n_docs,
         SUM(n_tokens) AS total_tokens,
         {oracle_round("AVG(CAST(n_chars AS DOUBLE))", 4)} AS avg_chars,
         {oracle_round("quantile_cont(CAST(n_chars AS DOUBLE), 0.5)", 4)} AS p50_chars,
         {oracle_round("quantile_cont(CAST(n_chars AS DOUBLE), 0.9)", 4)} AS p90_chars,
         {oracle_round(f"AVG(CASE WHEN n_chars < {SHORT_DOC_CHARS} THEN 1.0 ELSE 0.0 END)", 6)}
           AS short_doc_rate
  FROM d GROUP BY source, lang
)
SELECT source, lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       avg_chars, p50_chars, p90_chars, short_doc_rate,
       {oracle_round("total_tokens * 1.0 / SUM(total_tokens) OVER ()", 6)} AS token_share
FROM slice_stats
ORDER BY source, lang
"""


@query("corpus_data_card", oracle=_CARD_ORACLE, survey="EXT-text,A12")
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) data-card table: document and token counts,
    length distribution (mean / exact P50 / P90), short-doc rate, and
    each slice's share of the total token budget — the summary a
    mixture designer and a dataset reviewer both start from."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    slice_stats = d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        round_port(F.avg("n_chars"), 4).alias("avg_chars"),
        round_port(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        round_port(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
        round_port(
            F.avg(F.when(F.col("n_chars") < SHORT_DOC_CHARS, 1.0).otherwise(0.0)), 6
        ).alias("short_doc_rate"),
    )
    total = F.sum("total_tokens").over(Window.partitionBy())
    return (
        slice_stats.withColumn(
            "token_share", round_port(F.col("total_tokens") * F.lit(1.0) / total, 6)
        )
        .orderBy("source", "lang")
    )
