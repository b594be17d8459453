"""Embedding-cosine near-duplicate detection (SURVEY.md §7 Stage 6).

The semantic-dedup modality: two items are near-dups if their embedding
cosine exceeds a threshold. Candidates come from the same deterministic
sign-projection LSH buckets as similarity.ann (vectors in the same
bucket agree on all 8 hyperplane signs → high-cosine pairs land together
with high probability); the exact cosine check runs only inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.similarity.ann import (
    DIM,
    _as_double,
    _dot,
    lsh_bucket_expr,
)
from data_ingestion_system_spark.tables import load_table

COSINE_THRESHOLD = 0.9


_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), bucketed AS (
  SELECT vec_id, ev, {lsh_bucket_expr("ev", "strpos", "//")} AS bucket FROM v
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    list_sum(list_transform(range(1, {DIM} + 1), i -> a.ev[i] * b.ev[i]))
      / (sqrt(list_sum(list_transform(range(1, {DIM} + 1), i -> a.ev[i] * a.ev[i])))
         * sqrt(list_sum(list_transform(range(1, {DIM} + 1), i -> b.ev[i] * b.ev[i])))) AS cosine
  FROM bucketed a
  JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, ROUND(cosine * 1000000.0) / 1000000.0 AS cosine
FROM pairs
WHERE cosine >= {COSINE_THRESHOLD}
ORDER BY vec_a, vec_b
"""


@query("near_dup_embedding_cosine", oracle=_ORACLE, survey="EXT-dedup,EXT-similarity")
def near_dup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.9 within sign-projection LSH
    buckets. At 100 TB the bucket join is the only shuffle; bucket width
    (number of planes) trades recall vs candidate volume."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _as_double("embedding").alias("ev"))
    # materialized once — the sign expression is huge and feeds both join sides
    bucketed = v.withColumn(
        "bucket", F.expr(lsh_bucket_expr("ev", "instr", "div"))
    ).localCheckpoint(eager=False)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (
            _dot(F.col("a.ev"), F.col("b.ev"))
            / (
                F.sqrt(_dot(F.col("a.ev"), F.col("a.ev")))
                * F.sqrt(_dot(F.col("b.ev"), F.col("b.ev")))
            )
        ).alias("cosine"),
    )
    return (
        pairs.filter(F.col("cosine") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", round_port(F.col("cosine"), 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )
