"""Exact substring-level dedup — repeated k-token span detection across
the corpus (the "Deduplicating Training Data Makes Language Models
Better" / Lee et al. 2022 exact-substring pass, re-expressed set-based).

MinHash/SimHash (dedup/minhash.py, dedup/simhash.py) find *documents*
that are near-copies; this pass finds *spans* that recur verbatim across
otherwise-distinct documents — boilerplate, licence headers, templated
paragraphs — the duplication mode that document-level fingerprints miss.
Suffix arrays give the exact maximal-match answer on one node; the
distributed equivalent used here is fixed-k token shingling: every
k-token window, keyed by a portable digest, counted across documents.
A span inside a longer duplicated region contributes k consecutive
duplicated shingles, so `dup_fraction` closely tracks the suffix-array
duplicated-byte fraction while needing only groupBy/join machinery.

Scale shape: shingle extraction is narrow (split + slice per row, no
shuffle); the shingle→doc-count aggregation and the count-back join
shuffle on the *digest* (md5 here so the DuckDB oracle is bit-identical;
xxhash64 halves the key width in production) — never on the span text.
Heavy-hitter spans are found with the same aggregation + TakeOrdered
top-k, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import oracle_round, round_port, safe_div
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import bulk_checkpoint, fan_out, load_table

K = 8  # tokens per shingle — Lee et al. use 50 unicode chars ≈ 8-10 words


def shingles(docs: DataFrame, k: int = K) -> DataFrame:
    """(doc_id, source, pos, key): every k-token window of each document,
    keyed by md5 digest. Docs shorter than k tokens produce no rows
    (guarded — Spark's sequence(1, n) would run DESCENDING for n < 1).

    Fanned out ahead of the window-digest chain (r10): one md5 per
    k-token window is exactly the expensive narrow stage
    `tables.fan_out` exists for — a single-row-group local scan
    otherwise runs the whole split+slice+md5 expansion on ONE task
    (measured 0.7 s -> 0.4 s per pass at sf0.1; same idiom as
    minhash.token_sets)."""
    toks = fan_out(docs, "doc_id").select(
        "doc_id", "source", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= k)
    return toks.select(
        "doc_id",
        "source",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (k - 1)),
                lambda i: F.md5(F.array_join(F.slice("t", i, k), " ")),
            )
        ).alias("pos", "key"),
    )


_SHINGLE_SQL = f"""
  SELECT doc_id, source,
         md5(array_to_string(t[CAST(i AS BIGINT):CAST(i + {K - 1} AS BIGINT)], ' ')) AS key
  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents) toks,
       LATERAL unnest(range(1, len(t) - {K} + 2)) AS u(i)
  WHERE len(t) >= {K}
"""

_PROFILE_ORACLE = f"""
WITH sh AS ({_SHINGLE_SQL}),
dupkeys AS (
  SELECT key FROM sh GROUP BY key HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT sh.doc_id, sh.source,
         COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN d.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM sh LEFT JOIN dupkeys d USING (key)
  GROUP BY sh.doc_id, sh.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_dup) AS BIGINT) AS dup_shingle_instances,
       {oracle_round("AVG(CAST(n_dup AS DOUBLE) / n_shingles)", 6)} AS avg_dup_fraction,
       CAST(SUM(CASE WHEN CAST(n_dup AS DOUBLE) / n_shingles >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_heavy_dup
FROM per_doc
GROUP BY source
ORDER BY source
"""


@query("substring_dup_profile", oracle=_PROFILE_ORACLE, survey="EXT-dedup,A15")
def substring_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-substring duplication profile: fraction of each
    document's k-token shingles that recur verbatim in at least one
    OTHER document, rolled up per source with a heavy-duplication count
    (dup_fraction ≥ 0.2 — Lee et al.'s removal threshold regime).
    Catches cross-document boilerplate that document-level MinHash
    misses. Three shuffles (shingle agg, count-back join, doc agg) —
    all on digest or doc_id keys, never on span text.

    The shingle relation feeds TWO consumers (the dup-key aggregate and
    the count-back join's probe side) whose exchanges differ (partial
    agg vs join shuffle), so exchange reuse never fires and the
    split+md5 expansion ran twice (r10 plan audit). One bulk checkpoint
    makes it a single pass; the relation is a per-doc expansion
    (~47 rows/doc), so the storage level rides the calibrated
    source-corpus floor (tables.bulk_checkpoint)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # parquet footer statistics — no scan
    sh = bulk_checkpoint(shingles(docs), eager=False, n_rows=n_docs)
    dupkeys = (
        sh.groupBy("key")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("key")
    )
    per_doc = (
        sh.join(dupkeys.withColumn("is_dup", F.lit(1)), "key", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("bigint").alias("n_dup"),
        )
    )
    frac = F.col("n_dup").cast("double") / F.col("n_shingles")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_dup").cast("bigint").alias("dup_shingle_instances"),
            round_port(F.avg(frac), 6).alias("avg_dup_fraction"),
            F.sum((frac >= 0.2).cast("int")).cast("bigint").alias("n_docs_heavy_dup"),
        )
        .orderBy("source")
    )


_SPANS_ORACLE = f"""
WITH sh AS ({_SHINGLE_SQL})
SELECT key,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM sh
GROUP BY key
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, key
LIMIT 20
"""


@query("duplicated_spans_topk", oracle=_SPANS_ORACLE, survey="EXT-dedup,A6")
def duplicated_spans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most widely duplicated k-token spans (by distinct-document
    reach, then occurrence count) — the 'which boilerplate dominates the
    corpus' readout used to build span-removal lists. One aggregation on
    the span digest + TakeOrdered top-k; no global sort."""
    sh = shingles(load_table(spark, sf_dir, "documents"))
    return (
        sh.groupBy("key")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.count_distinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("key"))
        .limit(20)
    )
