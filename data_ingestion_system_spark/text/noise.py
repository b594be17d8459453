"""Label-noise estimation via the confident joint (Confident Learning,
Northcutt et al. 2021, "Confident Learning: Estimating Uncertainty in
Dataset Labels").

Weak labels (here: the repetition-heuristic teacher that also trains
text/nb.py) contain mistakes; the confident joint estimates HOW MANY
and IN WHICH DIRECTION by cross-tabulating given labels against
confident model predictions, where "confident" means the model's class
probability clears that class's own mean — the per-class threshold
t_c = E[p_c | label = c] that makes the estimator robust to class
imbalance and miscalibration.

Variant implemented: exclusive membership — a document counts into
C[given][confident] only when exactly ONE class clears its threshold;
ambiguous (both) and abstaining (neither) rows are reported separately
rather than argmax-assigned (the margin argmax adds a float comparison
surface with no extra information at binary scale).

Scale shape: one scoring pass (broadcast model), one 2-row threshold
aggregate joined back by broadcast, one groupBy over 4 cells. Float
contract: scores AND thresholds are rounded to 6 decimals before any
comparison, so the order-dependent double summation inside AVG cannot
flip a membership between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

_CJ_ORACLE = """
WITH {CLASSIFIER_CTES},
{REPETITION_CTES_BLOCK},
teacher AS (
  SELECT doc_id, CASE WHEN {REPETITION_KEEP} THEN 1 ELSE 0 END AS y
  FROM rmetrics
), j AS (
  SELECT ROUND(cs.score * 1000000.0) / 1000000.0 AS s6, t.y
  FROM clfscored cs JOIN teacher t USING (doc_id)
), th AS (
  SELECT ROUND(AVG(s6) FILTER (WHERE y = 1) * 1000000.0) / 1000000.0 AS t1,
         ROUND(AVG(1.0 - s6) FILTER (WHERE y = 0) * 1000000.0) / 1000000.0 AS t0
  FROM j
), m AS (
  SELECT y,
         CASE WHEN s6 >= t1 AND (1.0 - s6) < t0 THEN 1
              WHEN (1.0 - s6) >= t0 AND s6 < t1 THEN 0
              ELSE -1 END AS c
  FROM j, th
)
SELECT y AS given_label, c AS confident_label,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM m
GROUP BY y, c
ORDER BY given_label, confident_label
"""


def _cj_oracle() -> str:
    from data_ingestion_system_spark.text.classifier import CLASSIFIER_CTES
    from data_ingestion_system_spark.text.repetition import (
        REPETITION_CTES,
        REPETITION_KEEP_SQL,
    )

    return (
        _CJ_ORACLE.replace("{CLASSIFIER_CTES}", CLASSIFIER_CTES)
        .replace("{REPETITION_CTES_BLOCK}", REPETITION_CTES)
        .replace("{REPETITION_KEEP}", REPETITION_KEEP_SQL)
    )


@query("confident_joint_matrix", oracle=_cj_oracle(), survey="EXT-text,A18-ext")
def confident_joint_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The confident joint over (teacher label, confident model class):
    diagonal cells are labels the model confidently confirms,
    off-diagonal cells are the ESTIMATED LABEL ERRORS (the rows a
    relabeling pass would queue first), and confident_label = -1 rows
    are ambiguous/abstained. Per-class thresholds are the class-mean
    probabilities, computed in the same pass."""
    from data_ingestion_system_spark.text.classifier import (
        hashed_weight_table,
        score_documents,
    )
    from data_ingestion_system_spark.text.pipeline import stage_quality_ids

    docs = load_table(spark, sf_dir, "documents")
    scored = score_documents(
        docs.select("doc_id", "source", "text"), hashed_weight_table(spark)
    ).select("doc_id", round_port(F.col("score"), 6).alias("s6"))
    keep_ids = stage_quality_ids(docs)
    teacher = (
        docs.select("doc_id")
        .join(keep_ids.withColumn("y1", F.lit(1)), "doc_id", "left")
        .select("doc_id", F.coalesce("y1", F.lit(0)).alias("y"))
    )
    j = scored.join(teacher, "doc_id")
    th = j.agg(
        round_port(F.avg(F.when(F.col("y") == 1, F.col("s6"))), 6).alias("t1"),
        round_port(F.avg(F.when(F.col("y") == 0, 1.0 - F.col("s6"))), 6).alias("t0"),
    )
    in1 = F.col("s6") >= F.col("t1")
    in0 = (F.lit(1.0) - F.col("s6")) >= F.col("t0")
    m = j.crossJoin(F.broadcast(th)).select(
        "y",
        F.when(in1 & ~in0, 1).when(in0 & ~in1, 0).otherwise(-1).alias("c"),
    )
    return (
        m.groupBy(F.col("y").alias("given_label"), F.col("c").alias("confident_label"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("given_label", "confident_label")
    )
