"""Document chunking into fixed-size token windows.

LLM training pipelines cut documents into fixed-length sequences with a
configurable overlap (sliding windows, stride < window ⇒ context is
shared across chunk boundaries). The reference exports whole reviews
(src/export/training_exporter.py); the documents-table extension is the
window cut that export would need at pretraining scale.

One row per (doc, window): a per-doc `sequence(0, n-1, STRIDE)` explode
followed by an array `slice` — pure expression algebra, embarrassingly
parallel, no shuffle at all until a downstream consumer groups or
repacks the chunks. Token = whitespace word here; a BPE tokenizer would
swap in at the `split` without touching the windowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

CHUNK_TOKENS = 64
STRIDE = 48  # 16-token overlap between consecutive windows


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_TOKENS, stride: int = STRIDE
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): sliding token windows,
    trailing partial window kept."""
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    return (
        toks.select(
            "doc_id",
            "ts",
            F.explode(F.expr(f"sequence(0, size(ts) - 1, {stride})")).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / stride).cast("bigint").alias("chunk_id"),
            F.slice("ts", F.col("start") + 1, size).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


@query(
    "doc_chunks",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), starts AS (
  SELECT doc_id, ts, CAST(s AS BIGINT) AS start
  FROM toks, UNNEST(range(0, len(ts), {STRIDE})) AS r(s)
)
SELECT doc_id,
       start // {STRIDE} AS chunk_id,
       CAST(len(ts[start + 1 : start + {CHUNK_TOKENS}]) AS BIGINT) AS n_tokens,
       array_to_string(ts[start + 1 : start + {CHUNK_TOKENS}], ' ') AS chunk_text
FROM starts
ORDER BY doc_id, chunk_id
""",
    survey="EXT-text",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 64-token windows with stride 48 over every document."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs).orderBy("doc_id", "chunk_id")
