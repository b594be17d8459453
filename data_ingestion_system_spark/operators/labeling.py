"""Labeling analytics — SURVEY.md §2.4 A18–A19, §2.9 M4.

The reference's labeling pipeline stores human annotations and computes
majority votes (src/labeling/exporter.py:110-159) and Cohen's kappa
(src/labeling/reporter.py:111-167) by looping over collected rows. Here
both are pure DataFrame algebra over an annotation relation.

The driver's testdata has no labels table, so annotations are *derived
deterministically* from `events`: item = event_id % 499, annotator =
user_id % 3, label = event_type — giving multi-annotator overlap and
disagreements, reproducible in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import corpus_checkpoint, load_table

# Deduped annotation relation: one label per (item, annotator), keeping the
# latest by event_id — mirrors UNIQUE(review_id, annotator_id) (schema.sql:304).
ANNOTATIONS_SQL = """
SELECT item_id, annotator_id, label FROM (
  SELECT event_id % 499 AS item_id,
         user_id % 3 AS annotator_id,
         event_type AS label,
         ROW_NUMBER() OVER (PARTITION BY event_id % 499, user_id % 3 ORDER BY event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


def annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("item_id", "annotator_id").orderBy(F.desc("event_id"))
    return (
        events.select(
            (F.col("event_id") % 499).alias("item_id"),
            (F.col("user_id") % 3).alias("annotator_id"),
            F.col("event_type").alias("label"),
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("item_id", "annotator_id", "label")
    )


@query(
    "majority_vote",
    oracle=f"""
WITH ann AS ({ANNOTATIONS_SQL}),
counts AS (
  SELECT item_id, label, COUNT(*) AS n
  FROM ann GROUP BY item_id, label
), ranked AS (
  SELECT item_id, label, n,
         ROW_NUMBER() OVER (PARTITION BY item_id ORDER BY n DESC, label ASC) AS rn,
         COUNT(*) FILTER (WHERE TRUE) OVER (PARTITION BY item_id) AS n_labels,
         MAX(n) OVER (PARTITION BY item_id) AS max_n,
         CAST(SUM(CASE WHEN n = (SELECT MAX(n2.n) FROM counts n2 WHERE n2.item_id = counts.item_id) THEN 1 ELSE 0 END)
              OVER (PARTITION BY item_id) AS BIGINT) AS n_at_max
  FROM counts
)
SELECT item_id, label AS winner, n AS votes,
       CASE WHEN n_at_max > 1 THEN 'low' ELSE 'high' END AS confidence
FROM ranked WHERE rn = 1
ORDER BY item_id
""",
    survey="A19,M4",
)
def majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-annotator conflict resolution (exporter.py:110-159): per item
    take the majority label; a tie keeps the lexicographically-first label
    demoted to confidence='low' (the reference demotes the kept first
    label on ties). One groupBy + one window — no per-item loop."""
    ann = annotations(spark, sf_dir)
    counts = ann.groupBy("item_id", "label").agg(F.count("*").alias("n"))
    w_rank = Window.partitionBy("item_id").orderBy(F.desc("n"), F.asc("label"))
    w_item = Window.partitionBy("item_id")
    ranked = counts.select(
        "item_id",
        "label",
        "n",
        F.row_number().over(w_rank).alias("rn"),
        F.sum((F.col("n") == F.max("n").over(w_item)).cast("int")).over(w_item).alias("n_at_max"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "item_id",
            F.col("label").alias("winner"),
            F.col("n").alias("votes"),
            F.when(F.col("n_at_max") > 1, "low").otherwise("high").alias("confidence"),
        )
        .orderBy("item_id")
    )


@query(
    "cohens_kappa",
    oracle=f"""
WITH ann AS ({ANNOTATIONS_SQL}),
pairs AS (
  SELECT a.item_id, a.label AS label_a, b.label AS label_b
  FROM ann a JOIN ann b
    ON a.item_id = b.item_id AND a.annotator_id < b.annotator_id
), po AS (
  SELECT COUNT(*) AS n_pairs,
         AVG(CASE WHEN label_a = label_b THEN 1.0 ELSE 0.0 END) AS p_observed
  FROM pairs
), marg AS (
  SELECT l.label,
         CAST(SUM(CASE WHEN side = 'a' THEN n ELSE 0 END) AS DOUBLE) / (SELECT n_pairs FROM po) AS pa,
         CAST(SUM(CASE WHEN side = 'b' THEN n ELSE 0 END) AS DOUBLE) / (SELECT n_pairs FROM po) AS pb
  FROM (
    SELECT 'a' AS side, label_a AS label, COUNT(*) AS n FROM pairs GROUP BY label_a
    UNION ALL
    SELECT 'b' AS side, label_b AS label, COUNT(*) AS n FROM pairs GROUP BY label_b
  ) l
  GROUP BY l.label
), pe AS (
  SELECT SUM(pa * pb) AS p_expected FROM marg
)
SELECT po.n_pairs,
  ROUND(po.p_observed * 1000000.0) / 1000000.0 AS p_observed,
  ROUND(pe.p_expected * 1000000.0) / 1000000.0 AS p_expected,
  ROUND(((po.p_observed - pe.p_expected) / (1.0 - pe.p_expected)) * 1000000.0) / 1000000.0 AS kappa
FROM po, pe
""",
    survey="A18,J3",
)
def cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa over annotator pairs (reporter.py:111-167): observed
    agreement from the theta self-join (J3 pattern, annotator_a <
    annotator_b), expected agreement from the pooled label marginals of
    each pair side — all composed aggregates, no UDF."""
    return pairwise_kappa_stats(
        annotations(spark, sf_dir), "item_id", "annotator_id", "label"
    )


def pairwise_kappa_stats(
    ann: DataFrame, item_col: str, annotator_col: str, label_col: str
) -> DataFrame:
    """The kappa computation itself, over any (item, annotator, label)
    relation — shared by the catalog query above and the review-domain
    `views.pairwise_kappa`, so the statistics live in exactly one place.

    Scale shape: the self-join is an equi-join on the item key (only
    multi-annotated items produce pairs), then three scalar/low-card
    aggregates — no window over the corpus, no collect."""
    a = ann.alias("a")
    b = ann.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{item_col}") == F.col(f"b.{item_col}"))
        & (F.col(f"a.{annotator_col}") < F.col(f"b.{annotator_col}")),
    ).select(
        F.col(f"a.{label_col}").alias("label_a"), F.col(f"b.{label_col}").alias("label_b")
    )
    # localCheckpoint: pairs feed three aggregations; a plain cache would
    # linger in executor memory after the query returns
    pairs = corpus_checkpoint(pairs, eager=False)
    po = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.avg(F.when(F.col("label_a") == F.col("label_b"), 1.0).otherwise(0.0)).alias("p_observed"),
    )
    side_a = pairs.groupBy(F.col("label_a").alias("label")).agg(F.count("*").alias("n")).select(
        F.lit("a").alias("side"), "label", "n"
    )
    side_b = pairs.groupBy(F.col("label_b").alias("label")).agg(F.count("*").alias("n")).select(
        F.lit("b").alias("side"), "label", "n"
    )
    marg = (
        side_a.unionByName(side_b)
        .groupBy("label")
        .agg(
            F.sum(F.when(F.col("side") == "a", F.col("n")).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("side") == "b", F.col("n")).otherwise(0)).alias("nb"),
        )
    )
    pe = marg.crossJoin(F.broadcast(po.select("n_pairs"))).agg(
        F.sum(
            (F.col("na").cast("double") / F.col("n_pairs"))
            * (F.col("nb").cast("double") / F.col("n_pairs"))
        ).alias("p_expected")
    )
    return po.crossJoin(pe).select(
        "n_pairs",
        round_port(F.col("p_observed"), 6).alias("p_observed"),
        round_port(F.col("p_expected"), 6).alias("p_expected"),
        round_port(
            (F.col("p_observed") - F.col("p_expected")) / (1.0 - F.col("p_expected")), 6
        ).alias("kappa"),
    )


@query(
    "labeled_export_join",
    oracle=f"""
WITH ann AS ({ANNOTATIONS_SQL})
SELECT d.doc_id, d.lang, ann.annotator_id, ann.label,
       CASE WHEN d.n_chars <= 200 THEN 'short' ELSE 'long' END AS length_bucket
FROM ann
JOIN documents d ON ann.item_id = d.doc_id % 499 AND d.doc_id < 499
ORDER BY d.doc_id, ann.annotator_id
""",
    survey="J2,S11",
)
def labeled_export_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The labeled-export join (`v_labeled_reviews`, schema.sql:375-404):
    annotations ⋈ content ⋈ derived columns — the relation the exporter
    writes as JSONL (exporter.py:195-210; sinks live in sources.filesinks)."""
    ann = annotations(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 499)
    return (
        ann.join(docs, ann.item_id == docs.doc_id % 499)
        .select(
            "doc_id",
            "lang",
            "annotator_id",
            "label",
            F.when(F.col("n_chars") <= 200, "short").otherwise("long").alias("length_bucket"),
        )
        .orderBy("doc_id", "annotator_id")
    )


_KRIPPENDORFF_ORACLE = f"""
WITH ann AS ({ANNOTATIONS_SQL}),
item_label AS (
  SELECT item_id, label, COUNT(*) AS n_ic FROM ann GROUP BY item_id, label
), item_m AS (
  SELECT item_id, SUM(n_ic) AS m_i FROM item_label GROUP BY item_id
), pairable AS (
  SELECT il.item_id, il.label, il.n_ic, im.m_i
  FROM item_label il JOIN item_m im USING (item_id)
  WHERE im.m_i >= 2
), obs AS (
  SELECT SUM(CAST(n_ic * (n_ic - 1) AS DOUBLE) / (m_i - 1)) AS agree,
         SUM(n_ic) AS n_values,
         COUNT(DISTINCT item_id) AS n_items
  FROM pairable
), marg AS (
  SELECT label, SUM(n_ic) AS n_c FROM pairable GROUP BY label
), de AS (
  SELECT 1.0 - SUM(CAST(n_c * (n_c - 1) AS DOUBLE))
               / ((SELECT n_values FROM obs) * ((SELECT n_values FROM obs) - 1))
    AS d_expected
  FROM marg
)
SELECT CAST(obs.n_items AS BIGINT) AS n_items,
       CAST(obs.n_values AS BIGINT) AS n_values,
       ROUND((1.0 - obs.agree / obs.n_values) * 1000000.0) / 1000000.0 AS d_observed,
       ROUND(de.d_expected * 1000000.0) / 1000000.0 AS d_expected,
       ROUND((1.0 - (1.0 - obs.agree / obs.n_values) / de.d_expected) * 1000000.0)
         / 1000000.0 AS alpha
FROM obs, de
"""


@query("krippendorff_alpha", oracle=_KRIPPENDORFF_ORACLE, survey="A18-ext")
def krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal data) — the reliability coefficient
    that, unlike Cohen's kappa (two raters, full overlap), handles any
    number of annotators and missing labels, which is how real labeling
    queues behave (the reference's queue assigns overlapping subsets,
    src/labeling/sampler.py:163-186).

    Computed via the coincidence-matrix identities, so no pair explosion:
    within-item agreement sum_c n_ic(n_ic-1)/(m_i-1) and label marginals
    n_c give D_o and D_e with two aggregations over (item,label) counts.
    Scale shape: groupBy(item,label) → groupBy(item) → two scalar
    aggregates; everything map-side combinable, no self-join."""
    ann = annotations(spark, sf_dir)
    item_label = ann.groupBy("item_id", "label").agg(F.count("*").alias("n_ic"))
    w_item = Window.partitionBy("item_id")
    pairable = item_label.withColumn("m_i", F.sum("n_ic").over(w_item)).filter(
        F.col("m_i") >= 2
    )
    obs = pairable.agg(
        F.sum(
            (F.col("n_ic") * (F.col("n_ic") - 1)).cast("double") / (F.col("m_i") - 1)
        ).alias("agree"),
        F.sum("n_ic").alias("n_values"),
        F.count_distinct("item_id").alias("n_items"),
    )
    marg = pairable.groupBy("label").agg(F.sum("n_ic").alias("n_c"))
    de = marg.crossJoin(obs.select("n_values")).agg(
        (
            F.lit(1.0)
            - F.sum((F.col("n_c") * (F.col("n_c") - 1)).cast("double"))
            / (F.first("n_values") * (F.first("n_values") - F.lit(1)))
        ).alias("d_expected")
    )
    d_obs = F.lit(1.0) - F.col("agree") / F.col("n_values")
    return obs.crossJoin(de).select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("n_values").cast("bigint").alias("n_values"),
        round_port(d_obs, 6).alias("d_observed"),
        round_port(F.col("d_expected"), 6).alias("d_expected"),
        round_port(F.lit(1.0) - d_obs / F.col("d_expected"), 6).alias("alpha"),
    )
