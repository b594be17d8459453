"""K-fold cross-validation assignment — deterministic, engine-portable.

The reference's train/val/test split shuffles once and slices
(reference: src/labeling/sampler.py:139-160); k-fold CV is the
generalization every model-selection loop needs. Folds are assigned by
content-independent key hashing (seeded md5 → 52-bit uniform → mod k),
which gives three properties a shuffle-slice split lacks at 100 TB:

* **stable** — a document keeps its fold when the corpus grows, so CV
  metrics are comparable across ingests (no re-shuffle of history);
* **shuffle-free** — assignment is a per-row codegen expression; the
  only shuffle is the per-fold profile aggregation;
* **portable** — the DuckDB oracle computes the identical fold ids
  (md5 digits → integer arithmetic both engines evaluate exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import (
    det_rank_key,
    oracle_round,
    round_port,
    u52_terms_sql,
)
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

K_FOLDS = 5
FOLD_SEED = 23


def with_fold(docs: DataFrame, key: F.Column, k: int = K_FOLDS, seed: int = FOLD_SEED) -> DataFrame:
    """Attach a deterministic fold id in [0, k) from the row key."""
    hashed = docs.withColumn("h", det_rank_key(key, seed=seed))
    return hashed.withColumn(
        "fold", F.expr(f"CAST(({u52_terms_sql('instr')}) % {k} AS INT)")
    ).drop("h")


_KFOLD_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id, lang, n_chars,
         md5(concat('{FOLD_SEED}:', CAST(doc_id AS VARCHAR))) AS h
  FROM documents
), folded AS (
  SELECT doc_id, lang, n_chars,
         CAST(({u52_terms_sql("strpos")}) % {K_FOLDS} AS INTEGER) AS fold
  FROM hashed
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       {oracle_round("AVG(CAST(n_chars AS DOUBLE))", 4)} AS avg_chars,
       {oracle_round("COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents)", 6)} AS share
FROM folded
GROUP BY fold
ORDER BY fold
"""


@query("kfold_balance", oracle=_KFOLD_ORACLE, survey="M3-ext,O7")
def kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold balance profile of the deterministic 5-fold assignment:
    row counts, language coverage, mean length, and corpus share per
    fold — the sanity readout before trusting CV metrics. Fold ids are
    pure per-row expressions; one aggregation shuffle total."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    folded = with_fold(docs.select("doc_id", "lang", "n_chars"), F.col("doc_id"))
    per_fold = folded.groupBy("fold").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        round_port(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
    )
    # share from a window over the k-row aggregate — no second corpus scan
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        per_fold.withColumn(
            "share", round_port(F.col("n_docs") * F.lit(1.0) / total, 6)
        )
        .orderBy("fold")
    )
