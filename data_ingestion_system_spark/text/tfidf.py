"""Per-document TF-IDF term profiles.

The classic weighting (Salton & Buckley 1988): tfidf(t,d) =
tf(t,d) · ln(N / df(t)), with the top-K terms per document as the
document's keyword profile. Complements bm25_search (query-side
ranking) with the document-side feature extraction a corpus indexer
materializes.

Shape: one token explode → (doc, term) counts; document frequencies are
a vocabulary-sized aggregate broadcast back onto the counts (vocabulary
≪ corpus at any scale); top-K is a per-doc window. The only corpus-wide
shuffle is the (doc_id, term) count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import fan_out, load_table

TOP_TERMS = 3


def tfidf_terms(docs: DataFrame, top_k: int = TOP_TERMS) -> DataFrame:
    """(doc_id, term, tfidf, term_rank) — top_k terms per doc by
    tf·ln(N/df), ties broken by term text ascending. tfidf unrounded."""
    toks = fan_out(docs, "doc_id").select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("term_rank", F.row_number().over(w)).filter(
        F.col("term_rank") <= top_k
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfs AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
), scored AS (
  SELECT t.doc_id, t.term,
         t.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / f.df) AS tfidf
  FROM tf t JOIN dfs f USING (term)
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
           AS term_rank
  FROM scored
)
SELECT doc_id, term, ROUND(tfidf * 1000000.0) / 1000000.0 AS tfidf,
       CAST(term_rank AS INTEGER) AS term_rank
FROM ranked WHERE term_rank <= {TOP_TERMS}
ORDER BY doc_id, term_rank
""",
    survey="EXT-text",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document with deterministic tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_terms(docs).select(
        "doc_id",
        "term",
        round_port(F.col("tfidf"), 6).alias("tfidf"),
        F.col("term_rank").cast("int").alias("term_rank"),
    ).orderBy("doc_id", "term_rank")
