"""Naive Bayes quality classifier TRAINED in-engine on weak labels.

Where `text/classifier.py` serves a pre-trained (fixture) weight table,
this module closes the loop the way weak-supervision pipelines do
(Snorkel-style distillation: a cheap heuristic labels the corpus, a
statistical model is fit to those labels and generalizes past them):

  1. weak labels — the Gopher repetition verdict (text/repetition.py)
     marks each document keep(1)/drop(0);
  2. training — multinomial Naive Bayes with add-1 smoothing, fit as
     two groupBy aggregates (per-class token counts, class totals):
     w_t = ln((n_t,1 + 1)/(N_1 + V)) − ln((n_t,0 + 1)/(N_0 + V)),
     bias = ln(D_1/D_0);
  3. scoring — per-doc log-likelihood ratio: bias + Σ_tokens w_t,
     predict keep iff score > 0.

The readout is the label×prediction confusion matrix with mean scores —
how faithfully the learned model reproduces (and where it overrules)
its teacher. Everything, training included, is DataFrame algebra; the
oracle unrolls the same fit, so the driver hash-checks the TRAINING
math, not just the serving pass.

Scale shape: two corpus passes (token explode → per-class counts;
score join), with the learned weight table vocabulary-sized and
broadcast — the same serving plan as classifier.py. The weak-label
CTEs are shared with the repetition module.

Float contract: weights and scores stay raw until the final per-cell
mean is rounded; the sign threshold on a sum of irrational ln terms
sits on the 0 boundary with probability ~0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import fan_out, load_table
from data_ingestion_system_spark.text.repetition import (
    DUP_TRIGRAM_MAX,
    REPETITION_CTES,
    REPETITION_KEEP_SQL,
    TOP_BIGRAM_MAX,
    TOP_WORD_MAX,
    repetition_metrics,
)

_NB_ORACLE = f"""
WITH {REPETITION_CTES},
labels AS (
  SELECT doc_id, CASE WHEN {REPETITION_KEEP_SQL} THEN 1 ELSE 0 END AS y
  FROM rmetrics
), ltoks AS (
  SELECT r.doc_id, r.w, l.y FROM rwords r JOIN labels l USING (doc_id)
), class_tok AS (
  SELECT y, w, COUNT(*) AS c FROM ltoks GROUP BY y, w
), class_tot AS (
  SELECT y, SUM(c) AS nt FROM class_tok GROUP BY y
), vocab AS (
  SELECT COUNT(DISTINCT w) AS v FROM rwords
), prior AS (
  SELECT ln(SUM(CASE WHEN y = 1 THEN 1.0 ELSE 0.0 END)
            / SUM(CASE WHEN y = 0 THEN 1.0 ELSE 0.0 END)) AS b
  FROM labels
), wts AS (
  SELECT t.w,
         ln((COALESCE(c1.c, 0) + 1.0) / (t1.nt + vb.v))
       - ln((COALESCE(c0.c, 0) + 1.0) / (t0.nt + vb.v)) AS wt
  FROM (SELECT DISTINCT w FROM rwords) t
  LEFT JOIN class_tok c1 ON c1.w = t.w AND c1.y = 1
  LEFT JOIN class_tok c0 ON c0.w = t.w AND c0.y = 0
  CROSS JOIN (SELECT nt FROM class_tot WHERE y = 1) t1
  CROSS JOIN (SELECT nt FROM class_tot WHERE y = 0) t0
  CROSS JOIN vocab vb
), scored AS (
  SELECT lt.doc_id, lt.y, p.b + SUM(w.wt) AS score
  FROM ltoks lt JOIN wts w USING (w), prior p
  GROUP BY lt.doc_id, lt.y, p.b
)
SELECT y AS label,
       CASE WHEN score > 0 THEN 1 ELSE 0 END AS pred,
       COUNT(*) AS n_docs,
       ROUND(AVG(score) * 1000000.0) / 1000000.0 AS avg_score
FROM scored
GROUP BY 1, 2
ORDER BY label, pred
"""


def nb_weights(toks_labeled: DataFrame) -> DataFrame:
    """(w, wt) learned log-likelihood-ratio weights from a labeled
    (doc_id, w, y) token stream — the whole NB fit as aggregates."""
    class_tok = toks_labeled.groupBy("y", "w").agg(F.count("*").alias("c"))
    class_tot = class_tok.groupBy("y").agg(F.sum("c").alias("nt"))
    vocab = toks_labeled.select("w").distinct()
    v = vocab.agg(F.count("*").alias("v"))
    n1 = class_tot.filter(F.col("y") == 1).select(F.col("nt").alias("n1"))
    n0 = class_tot.filter(F.col("y") == 0).select(F.col("nt").alias("n0"))
    c1 = class_tok.filter(F.col("y") == 1).select("w", F.col("c").alias("c1"))
    c0 = class_tok.filter(F.col("y") == 0).select("w", F.col("c").alias("c0"))
    return (
        vocab.join(c1, "w", "left")
        .join(c0, "w", "left")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n0))
        .crossJoin(F.broadcast(v))
        .select(
            "w",
            (
                F.log((F.coalesce("c1", F.lit(0)) + 1.0) / (F.col("n1") + F.col("v")))
                - F.log((F.coalesce("c0", F.lit(0)) + 1.0) / (F.col("n0") + F.col("v")))
            ).alias("wt"),
        )
    )


@query("nb_weak_label_confusion", oracle=_NB_ORACLE, survey="EXT-text")
def nb_weak_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the weak-label NB and report teacher-label × model-prediction
    counts with mean scores — the distillation faithfulness readout."""
    docs = load_table(spark, sf_dir, "documents")
    m = repetition_metrics(docs)
    keep = (
        (F.col("top_word_frac") <= TOP_WORD_MAX)
        & F.coalesce(F.col("top_bigram_frac") <= TOP_BIGRAM_MAX, F.lit(True))
        & F.coalesce(F.col("dup_trigram_frac") <= DUP_TRIGRAM_MAX, F.lit(True))
    )
    labels = m.select("doc_id", F.when(keep, 1).otherwise(0).alias("y"))
    toks = (
        fan_out(docs, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .join(labels, "doc_id")
    )
    toks = toks.localCheckpoint(eager=False)  # feeds training AND scoring
    wts = nb_weights(toks)
    prior = labels.agg(
        F.log(
            F.sum(F.when(F.col("y") == 1, 1.0).otherwise(0.0))
            / F.sum(F.when(F.col("y") == 0, 1.0).otherwise(0.0))
        ).alias("b")
    )
    scored = (
        toks.join(F.broadcast(wts), "w")
        .crossJoin(F.broadcast(prior))
        .groupBy("doc_id", "y", "b")
        .agg(F.sum("wt").alias("s"))
        .select("doc_id", "y", (F.col("b") + F.col("s")).alias("score"))
    )
    return (
        scored.groupBy(
            F.col("y").alias("label"),
            F.when(F.col("score") > 0, 1).otherwise(0).alias("pred"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            round_port(F.avg("score"), 6).alias("avg_score"),
        )
        .orderBy("label", "pred")
    )
