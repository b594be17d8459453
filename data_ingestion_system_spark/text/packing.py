"""Sequence packing & boilerplate-chunk dedup — the last mile between a
chunked corpus and training batches.

* `pack_training_sequences` — greedy fixed-capacity packing of each
  document's chunks into SEQ_LEN-token training sequences (the
  "example packing" step that turns ragged chunks into dense batches).
  Packing is PER DOCUMENT (the standard choice: no cross-document
  attention, and the operator stays embarrassingly parallel — a window
  partitioned by doc_id, never a global running total). The report is
  per-source packing efficiency: sequences emitted, mean fill, waste
  fraction — what you read before buying the GPU-hours.
* `boilerplate_chunks` — C4-style repeated-paragraph detection at the
  chunk level: chunk texts shared by ≥ BOILER_MIN_DOCS distinct
  documents (headers, footers, navigation debris). Doc-level dedup
  can't see these (the docs differ); span-level repetition is its own
  pass (Lee et al. 2022, "Deduplicating Training Data Makes Language
  Models Better" — the exact-substring motivation, bucketed by chunk
  hash instead of a suffix array, which is the Spark-shaped
  approximation).

Scale shape: packing is one narrow window per doc (partitioned by
doc_id — thousands of rows per partition at worst); boilerplate is one
groupBy over chunk fingerprints (md5, so the shuffle carries 32-byte
keys, not chunk text). No UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table
from data_ingestion_system_spark.text.chunking import STRIDE, chunk_documents

SEQ_LEN = 128          # training sequence capacity (tokens)
BOILER_MIN_DOCS = 3    # chunk text in >= this many docs == boilerplate

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), starts AS (
  SELECT doc_id, ts, CAST(s AS BIGINT) AS start
  FROM toks, UNNEST(range(0, len(ts), {STRIDE})) AS r(s)
), chunks AS (
  SELECT doc_id,
         start // {STRIDE} AS chunk_id,
         CAST(len(ts[start + 1 : start + 64]) AS BIGINT) AS n_tokens
  FROM starts
), cum AS (
  SELECT doc_id, chunk_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM chunks
), binned AS (
  SELECT doc_id, n_tokens, (cum_tokens - 1) // {SEQ_LEN} AS seq_id
  FROM cum
), seqs AS (
  SELECT doc_id, seq_id, SUM(n_tokens) AS fill
  FROM binned GROUP BY doc_id, seq_id
), with_src AS (
  SELECT s.doc_id, s.seq_id, s.fill, d.source
  FROM seqs s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT source,
       COUNT(*) AS n_sequences,
       ROUND(AVG(CAST(fill AS DOUBLE) / {SEQ_LEN}) * 1000000.0) / 1000000.0 AS mean_fill,
       ROUND((1.0 - CAST(SUM(fill) AS DOUBLE) / (COUNT(*) * {SEQ_LEN})) * 1000000.0)
         / 1000000.0 AS waste_frac
FROM with_src GROUP BY source ORDER BY source
"""


@query("pack_training_sequences", oracle=_PACK_ORACLE, survey="EXT-text")
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-document packing of 64-token chunks into SEQ_LEN-token
    training sequences: chunk c goes to sequence floor((cumsum-1) /
    SEQ_LEN) of its document (first-fit in chunk order). Per-source
    report: sequences, mean fill ratio, wasted-capacity fraction."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs).select("doc_id", "chunk_id", "n_tokens")
    w = Window.partitionBy("doc_id").orderBy("chunk_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    binned = chunks.select(
        "doc_id",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - 1) / SEQ_LEN).cast("bigint").alias("seq_id"),
    )
    seqs = binned.groupBy("doc_id", "seq_id").agg(F.sum("n_tokens").alias("fill"))
    with_src = seqs.join(docs.select("doc_id", "source"), "doc_id")
    return (
        with_src.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sequences"),
            round_port(F.avg(F.col("fill").cast("double") / SEQ_LEN), 6).alias("mean_fill"),
            round_port(
                F.lit(1.0)
                - F.sum("fill").cast("double") / (F.count(F.lit(1)) * SEQ_LEN),
                6,
            ).alias("waste_frac"),
        )
        .orderBy("source")
    )


_BOILER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), starts AS (
  SELECT doc_id, ts, CAST(s AS BIGINT) AS start
  FROM toks, UNNEST(range(0, len(ts), {STRIDE})) AS r(s)
), chunks AS (
  SELECT doc_id,
         md5(array_to_string(ts[start + 1 : start + 64], ' ')) AS fp,
         CAST(len(ts[start + 1 : start + 64]) AS BIGINT) AS n_tokens
  FROM starts
)
SELECT fp,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(ANY_VALUE(n_tokens) AS BIGINT) AS n_tokens
FROM chunks
GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
ORDER BY n_docs DESC, fp
"""


@query("boilerplate_chunks", oracle=_BOILER_ORACLE, survey="EXT-dedup")
def boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span (boilerplate) detection: chunk fingerprints shared
    by ≥ {BOILER_MIN_DOCS} distinct docs, with doc/occurrence counts —
    the removal list a C4-style repeated-paragraph filter anti-joins
    against. The shuffle key is the 32-char md5, never the chunk text."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs).select(
        "doc_id", F.md5("chunk_text").alias("fp"), "n_tokens"
    )
    return (
        chunks.groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.any_value("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= BOILER_MIN_DOCS)
        .orderBy(F.desc("n_docs"), "fp")
    )
