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
from data_ingestion_system_spark.tables import corpus_checkpoint, fan_out, load_table
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
    toks = corpus_checkpoint(toks, eager=False)  # feeds training AND scoring
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


N_CAL_BINS = 50  # 0.02-wide score bins

_CAL_ORACLE = f"""
WITH {REPETITION_CTES},
{{CLASSIFIER_CTES}}
, teacher AS (
  SELECT doc_id, CASE WHEN {REPETITION_KEEP_SQL} THEN 1 ELSE 0 END AS keep
  FROM rmetrics
)
SELECT CAST(FLOOR(cs.score * {N_CAL_BINS}) AS INTEGER) AS score_bin,
       COUNT(*) AS n_docs,
       CAST(SUM(t.keep) AS BIGINT) AS n_teacher_keep,
       ROUND(AVG(CAST(t.keep AS DOUBLE)) * 1000000.0) / 1000000.0 AS teacher_keep_rate,
       ROUND(AVG(cs.score) * 1000000.0) / 1000000.0 AS avg_score
FROM clfscored cs JOIN teacher t USING (doc_id)
GROUP BY 1
ORDER BY score_bin
"""


def _cal_oracle() -> str:
    from data_ingestion_system_spark.text.classifier import CLASSIFIER_CTES

    return _CAL_ORACLE.replace("{CLASSIFIER_CTES}", CLASSIFIER_CTES)


@query("classifier_calibration", oracle=_cal_oracle(), survey="EXT-text")
def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration of the hashed-feature classifier against the
    repetition heuristic: documents bucketed by classifier score
    (0.02-wide bins), each bin reporting how often the heuristic
    teacher keeps its members — the reliability-diagram table read
    before trusting a learned gate's threshold. A well-calibrated
    score shows keep-rate rising with the bin; a flat line means the
    model adds nothing over the prior."""
    from data_ingestion_system_spark.text.classifier import (
        hashed_weight_table,
        score_documents,
    )
    from data_ingestion_system_spark.text.pipeline import stage_quality_ids

    docs = load_table(spark, sf_dir, "documents")
    scored = score_documents(
        docs.select("doc_id", "source", "text"), hashed_weight_table(spark)
    )
    keep_ids = stage_quality_ids(docs)
    teacher = docs.select("doc_id").join(
        keep_ids.withColumn("t_keep", F.lit(1)), "doc_id", "left"
    ).select("doc_id", F.coalesce("t_keep", F.lit(0)).alias("t_keep"))
    joined = scored.select("doc_id", "score").join(teacher, "doc_id")
    return (
        joined.groupBy(
            F.floor(F.col("score") * N_CAL_BINS).cast("int").alias("score_bin")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("t_keep").cast("bigint").alias("n_teacher_keep"),
            round_port(F.avg(F.col("t_keep").cast("double")), 6).alias("teacher_keep_rate"),
            round_port(F.avg("score"), 6).alias("avg_score"),
        )
        .orderBy("score_bin")
    )


_PR_ORACLE = """
WITH {CLASSIFIER_CTES},
{REPETITION_CTES_BLOCK},
teacher AS (
  SELECT doc_id, CASE WHEN {REPETITION_KEEP} THEN 1 ELSE 0 END AS t_keep
  FROM rmetrics
), j AS (
  SELECT ROUND(cs.score * 1000000.0) / 1000000.0 AS s6, t.t_keep
  FROM clfscored cs JOIN teacher t USING (doc_id)
), x AS (
  SELECT CAST(u.step AS INTEGER) AS step, s6, t_keep
  FROM j, LATERAL unnest(range(1, 10)) AS u(step)
), agg AS (
  SELECT step,
         SUM(CASE WHEN s6 >= step / 10.0 AND t_keep = 1 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN s6 >= step / 10.0 AND t_keep = 0 THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN s6 < step / 10.0 AND t_keep = 1 THEN 1 ELSE 0 END) AS fn
  FROM x GROUP BY step
)
SELECT step, ROUND(step / 10.0 * 10.0) / 10.0 AS threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       ROUND(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END * 1000000.0) / 1000000.0 AS precision,
       ROUND(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END * 1000000.0) / 1000000.0 AS recall
FROM agg
ORDER BY step
"""


def _pr_oracle() -> str:
    from data_ingestion_system_spark.text.classifier import CLASSIFIER_CTES

    return (
        _PR_ORACLE.replace("{CLASSIFIER_CTES}", CLASSIFIER_CTES)
        .replace("{REPETITION_CTES_BLOCK}", REPETITION_CTES)
        .replace("{REPETITION_KEEP}", REPETITION_KEEP_SQL)
    )


@query("classifier_pr_thresholds", oracle=_pr_oracle(), survey="EXT-text")
def classifier_pr_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the hashed-feature quality gate against the
    repetition-heuristic teacher at a ladder of 9 score thresholds —
    the operating-point table a corpus owner reads to pick the keep
    cutoff (the reference picks its quality thresholds by inspection,
    data_quality_analyzer.py:86-138; this is the measured version).

    Scale shape: scores and teacher labels join once on doc_id; the
    9-point ladder is a literal-array explode of that narrow projection
    (9x fan-out of (double, int) rows, map-side) followed by one
    aggregation — no per-threshold rescans. Comparisons use the
    6-decimal-rounded score so the exp() ulp surface can't flip a
    boundary row between engines."""
    from data_ingestion_system_spark.text.classifier import (
        hashed_weight_table,
        score_documents,
    )
    from data_ingestion_system_spark.text.pipeline import stage_quality_ids

    docs = load_table(spark, sf_dir, "documents")
    scored = score_documents(
        docs.select("doc_id", "source", "text"), hashed_weight_table(spark)
    )
    keep_ids = stage_quality_ids(docs)
    teacher = (
        docs.select("doc_id")
        .join(keep_ids.withColumn("t_keep", F.lit(1)), "doc_id", "left")
        .select("doc_id", F.coalesce("t_keep", F.lit(0)).alias("t_keep"))
    )
    j = scored.select("doc_id", round_port(F.col("score"), 6).alias("s6")).join(
        teacher, "doc_id"
    )
    x = j.select(
        F.explode(F.array(*[F.lit(i) for i in range(1, 10)])).alias("step"),
        "s6",
        "t_keep",
    )
    t = F.col("step") / 10.0
    pred = F.col("s6") >= t
    agg = x.groupBy("step").agg(
        F.sum((pred & (F.col("t_keep") == 1)).cast("long")).alias("tp"),
        F.sum((pred & (F.col("t_keep") == 0)).cast("long")).alias("fp"),
        F.sum(((~pred) & (F.col("t_keep") == 1)).cast("long")).alias("fn"),
    )
    return agg.select(
        "step",
        round_port(t, 1).alias("threshold"),
        "tp",
        "fp",
        "fn",
        round_port(
            F.when(F.col("tp") + F.col("fp") > 0,
                   F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
                   ).otherwise(0.0), 6
        ).alias("precision"),
        round_port(
            F.when(F.col("tp") + F.col("fn") > 0,
                   F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
                   ).otherwise(0.0), 6
        ).alias("recall"),
    ).orderBy("step")
