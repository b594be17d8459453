"""Train/eval contamination detection by shared n-gram spans.

Before training on a corpus, pipelines flag documents that overlap an
evaluation set (the GPT-3 appendix-C / PaLM decontamination recipe:
mark a training doc contaminated when enough of its n-grams appear in
any benchmark doc). The reference has no eval-set concept; the
benchmark here is a deterministic held-out slice (doc_id % BENCH_MOD
== 0) standing in for an external eval suite.

Scale shape: eval suites are tiny relative to a 100 TB corpus, so the
benchmark gram set is a broadcast semi-join against the exploded train
grams — one map-side membership probe per gram, no shuffle of the
corpus beyond the per-doc count aggregation. N = 5 word-grams: long
enough that matches mean copied spans (the synthetic vocabulary makes
shorter grams collide by chance), short enough to fire on the corpus's
real near-duplicate spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import corpus_checkpoint, fan_out, load_table

CONTAM_N = 5        # words per gram
BENCH_MOD = 25      # doc_id % BENCH_MOD == 0 → benchmark slice
FLAG_FRAC = 0.10    # contaminated when ≥10% of grams overlap the benchmark


def doc_ngrams(
    docs: DataFrame, n: int = CONTAM_N, toks: DataFrame | None = None
) -> DataFrame:
    """Distinct (doc_id, gram) word-n-grams; docs shorter than n words
    contribute no grams.

    `toks` optionally supplies a pre-tokenized (doc_id, ts) relation
    shared with other pipeline stages (text/pipeline.py)."""
    inner = ", ' ', ".join(f"ts[i + {j}]" for j in range(n))
    parts = f"concat({inner})"
    tokenized = (
        fan_out(docs, "doc_id").select("doc_id", F.split("text", " ").alias("ts"))
        if toks is None
        else toks.select("doc_id", "ts")
    )
    return (
        tokenized.filter(F.size("ts") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(0, size(ts) - {n}), i -> {parts})")
            ).alias("gram"),
        )
        .distinct()
    )


# CTE body (distinct `c`-prefixed names) shared with the corpus-prep
# pipeline oracle. `cflags` is the per-train-doc contamination relation.
CONTAM_CTES = f"""ctoks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), cgrams AS (
  SELECT DISTINCT doc_id,
         {" || ' ' || ".join(f"ts[i + {j}]" for j in range(CONTAM_N))} AS gram
  FROM ctoks, UNNEST(range(1, len(ts) - {CONTAM_N - 2})) AS r(i)
  WHERE len(ts) >= {CONTAM_N}
), cbench AS (
  SELECT DISTINCT gram FROM cgrams WHERE doc_id % {BENCH_MOD} = 0
), ctrain AS (
  SELECT * FROM cgrams WHERE doc_id % {BENCH_MOD} <> 0
), ctotals AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM ctrain GROUP BY doc_id
), chits AS (
  SELECT t.doc_id, COUNT(*) AS n_contaminated
  FROM ctrain t JOIN cbench b ON b.gram = t.gram
  GROUP BY t.doc_id
), cflags AS (
  SELECT tt.doc_id, tt.n_grams,
         COALESCE(h.n_contaminated, 0) AS n_contaminated,
         CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / tt.n_grams
           AS contamination_frac
  FROM ctotals tt LEFT JOIN chits h ON h.doc_id = tt.doc_id
)"""


@query(
    "contamination_overlap",
    oracle=f"""
WITH {CONTAM_CTES}
SELECT doc_id, n_grams, n_contaminated,
       ROUND(contamination_frac * 1000000.0) / 1000000.0 AS contamination_frac,
       contamination_frac >= {FLAG_FRAC} AS flagged
FROM cflags
ORDER BY doc_id
""",
    survey="EXT-text",
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-doc overlap with the benchmark slice: distinct
    5-gram count, how many of them appear anywhere in the benchmark,
    the contamination fraction, and the ≥10% flag."""
    docs = load_table(spark, sf_dir, "documents")
    grams = corpus_checkpoint(doc_ngrams(docs), eager=False)
    is_bench = F.pmod("doc_id", F.lit(BENCH_MOD)) == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    train = grams.filter(~is_bench)
    totals = train.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        train.join(F.broadcast(bench), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    frac = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double") / F.col("n_grams")
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
            round_port(frac, 6).alias("contamination_frac"),
            (frac >= FLAG_FRAC).alias("flagged"),
        )
        .orderBy("doc_id")
    )
