"""BM25 ranked retrieval — scoring on top of the inverted index.

The reference's search surface is unranked `LIKE` containment
(src/database/db_manager.py:438-460, with FTS5 noted as the intended
upgrade); FTS5's default ranking IS BM25, so the honest Spark-side twin
of that upgrade is Okapi BM25 (Robertson & Zaragoza 2009) over the
posting lists of text/search.py:

    score(q,d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·dl/avgdl))
    idf(t)     = ln(1 + (N - df + 0.5)/(df + 0.5))      (Lucene variant)

Everything is expression algebra over three tiny aggregates (df per
query term, corpus N, average doc length) broadcast against the
term-frequency relation — the corpus-side work is one explode + one
groupBy on (doc_id, token) filtered to the K query terms, so a K-term
query touches K posting lists, not the corpus. Per-term scores are
pivoted to fixed columns and added in a fixed order (not SUM-aggregated)
so the float result is bit-stable across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import fan_out, load_table

BM25_TERMS = ("spark", "join", "filter")
K1 = 1.2
B = 0.75
TOP_N = 20


def bm25_scores(docs: DataFrame, terms: tuple[str, ...] = BM25_TERMS) -> DataFrame:
    """(doc_id, score) for docs matching ≥1 term, unrounded.

    ONE explode + ONE groupBy(doc_id) (r10): the r9 shape ran the corpus
    token explode under four consumers (doc lengths, avgdl, per-term df,
    per-term tf — ReuseExchange shares the fan-out shuffle but each
    consumer re-exploded and re-aggregated the token stream). Per-doc
    length AND the K per-term term frequencies are conditional counts of
    one pass; df per term then falls out of the collapsed n_docs-row
    relation as a count of docs with tf > 0. Same integers (dl, tf, df,
    N) and the same per-term score expression evaluated in the same
    fixed order, so the float contract is unchanged — only the pass
    count drops (4 corpus passes -> 1)."""
    toks = fan_out(docs, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    perdoc = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.count(F.when(F.col("token") == t, True)).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # three one-row side inputs, broadcast — never a driver-side collect.
    # avgdl and every per-term df reduce the SAME collapsed per-doc
    # relation in one aggregate row.
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    stats = perdoc.agg(
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    matched = perdoc.filter(
        sum((F.col(f"tf{i}") > 0).cast("int") for i in range(len(terms))) > 0
    )
    scored = matched.crossJoin(F.broadcast(n_docs)).crossJoin(F.broadcast(stats))
    total = None
    for i in range(len(terms)):
        tf_i = F.col(f"tf{i}")
        s_i = F.when(
            tf_i > 0,
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
            )
            * (tf_i * (K1 + 1))
            / (tf_i + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))
        total = s_i if total is None else total + s_i
    return scored.select("doc_id", total.alias("score"))


def _bm25_oracle() -> str:
    terms_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    per_term = " + ".join(
        f"COALESCE(MAX(CASE WHEN token = '{t}' THEN s END), 0.0)" for t in BM25_TERMS
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT AVG(dl) FROM dl) AS avgdl
), dfs AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
  WHERE token IN ({terms_list}) GROUP BY token
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks
  WHERE token IN ({terms_list}) GROUP BY doc_id, token
), scored AS (
  SELECT t.doc_id, t.token,
         ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
         * (t.tf * ({K1} + 1)) / (t.tf + {K1} * (1 - {B} + {B} * d.dl / s.avgdl)) AS s
  FROM tf t JOIN dfs f USING (token) JOIN dl d USING (doc_id), stats s
), totals AS (
  SELECT doc_id, {per_term} AS score FROM scored GROUP BY doc_id
), ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM totals
)
SELECT doc_id, ROUND(score * 1000000.0) / 1000000.0 AS score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_N}
ORDER BY rank
"""


@query("bm25_search", oracle=_bm25_oracle(), survey="EXT-text")
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed 3-term query by BM25 score,
    deterministic (doc_id) tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    scores = bm25_scores(docs)
    ranked = scores.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
    )
    return (
        ranked.filter(F.col("rank") <= TOP_N)
        .select(
            "doc_id",
            round_port(F.col("score"), 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("rank")
    )
