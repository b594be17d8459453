"""The reference's five SQL views as DataFrame builders + temp views.

Exact re-expressions of reference: src/database/schema.sql:209-404 on the
review-domain schema (schemas.REVIEW_DOMAIN_SCHEMAS / fixtures.py). Each
builder returns the view's DataFrame; `register_reference_views` exposes
them to Spark SQL under the reference's names so every query the
reference runs against SQLite runs verbatim against this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import (
    length_bucket,
    round_port,
    sentiment_bucket,
)


def v_reviews_with_app(reviews: DataFrame, apps: DataFrame) -> DataFrame:
    """schema.sql:209-216 — reviews enriched with app dim columns."""
    return reviews.join(F.broadcast(apps), "app_id").select(
        reviews["*"],
        F.col("title").alias("app_title"),
        F.col("developer").alias("app_developer"),
        F.col("genre").alias("app_genre"),
    )


def v_reviews_sentiment(reviews: DataFrame) -> DataFrame:
    """schema.sql:219-232 — sentiment + length buckets (P6/P7 ladders)."""
    return reviews.select(
        "*",
        sentiment_bucket(F.col("rating")).alias("sentiment_bucket"),
        length_bucket(F.length(F.col("content"))).alias("length_bucket"),
    )


def v_app_stats(reviews: DataFrame) -> DataFrame:
    """schema.sql:236-249 — the flagship per-app multi-aggregate.

    Output column names match the reference's view EXACTLY
    (review_count/positive_count/negative_count/replied_count/
    earliest_review/latest_review) so reference-side SQL — e.g. the
    sampler's `SELECT review_count FROM v_app_stats`
    (src/labeling/sampler.py:168-182) — runs unchanged."""
    return (
        reviews.groupBy("app_id")
        .agg(
            F.count("*").alias("review_count"),
            round_port(F.avg("rating"), 2).alias("avg_rating"),
            F.sum(F.when(F.col("rating") >= 4, 1).otherwise(0)).alias("positive_count"),
            F.sum(F.when(F.col("rating") <= 2, 1).otherwise(0)).alias("negative_count"),
            F.sum(F.when(F.col("reply_content").isNotNull(), 1).otherwise(0)).alias("replied_count"),
            round_port(F.avg(F.length("content")), 1).alias("avg_content_length"),
            round_port(F.avg("thumbs_up"), 2).alias("avg_thumbs_up"),
            F.min("review_timestamp").alias("earliest_review"),
            F.max("review_timestamp").alias("latest_review"),
        )
        .orderBy("app_id")
    )


def v_daily_stats(reviews: DataFrame) -> DataFrame:
    """schema.sql:252-261 — per-day counts and star extremes
    (review_count, per the reference's column name)."""
    return (
        reviews.groupBy(F.to_date("review_timestamp").alias("review_date"))
        .agg(
            F.count("*").alias("review_count"),
            round_port(F.avg("rating"), 2).alias("avg_rating"),
            F.sum(F.when(F.col("rating") == 5, 1).otherwise(0)).alias("five_star"),
            F.sum(F.when(F.col("rating") == 1, 1).otherwise(0)).alias("one_star"),
        )
        .orderBy("review_date")
    )


def v_labeled_reviews(
    labels: DataFrame, reviews: DataFrame, apps: DataFrame, annotators: DataFrame
) -> DataFrame:
    """schema.sql:375-404 — labels ⋈ reviews ⋈ apps ⋈ annotators (all
    inner, as in the reference) with the reference's full column list and
    the star_label_mismatch flag: a positive human label on a ≤2★ review
    (or negative label on a ≥4★ one)."""
    return (
        labels.join(reviews, "review_id")
        .join(F.broadcast(apps.select("app_id", "title", "genre")), "app_id")
        .join(
            F.broadcast(annotators.select("annotator_id", F.col("name").alias("annotator_name"))),
            "annotator_id",
        )
        .select(
            "label_id",
            "sentiment",
            "confidence",
            "annotator_id",
            "annotator_name",
            "review_id",
            "content",
            "rating",
            "thumbs_up",
            "review_timestamp",
            "app_id",
            F.col("title").alias("app_title"),
            F.col("genre").alias("app_genre"),
            F.length("content").alias("content_length"),
            sentiment_bucket(F.col("rating")).alias("star_sentiment_bucket"),
            F.when(
                (F.col("sentiment").isin("positive", "very_positive") & (F.col("rating") <= 2))
                | (F.col("sentiment").isin("negative", "very_negative") & (F.col("rating") >= 4)),
                1,
            )
            .otherwise(0)
            .alias("star_label_mismatch"),
        )
    )


def register_reference_views(
    spark: SparkSession,
    reviews: DataFrame,
    apps: DataFrame,
    labels: DataFrame | None = None,
    annotators: DataFrame | None = None,
) -> None:
    """Publish the reference view names into the SQL catalog."""
    reviews.createOrReplaceTempView("reviews")
    apps.createOrReplaceTempView("apps")
    v_reviews_with_app(reviews, apps).createOrReplaceTempView("v_reviews_with_app")
    v_reviews_sentiment(reviews).createOrReplaceTempView("v_reviews_sentiment")
    v_app_stats(reviews).createOrReplaceTempView("v_app_stats")
    v_daily_stats(reviews).createOrReplaceTempView("v_daily_stats")
    if labels is not None and annotators is not None:
        labels.createOrReplaceTempView("labels")
        annotators.createOrReplaceTempView("annotators")
        v_labeled_reviews(labels, reviews, apps, annotators).createOrReplaceTempView(
            "v_labeled_reviews"
        )


def pairwise_kappa(labels: DataFrame) -> DataFrame:
    """Cohen's kappa over the double-annotated overlap of a labels
    relation (reference: src/labeling/reporter.py:111-167), on the
    review-domain column names. Delegates to the single shared
    implementation in operators/labeling.pairwise_kappa_stats; the
    catalog query twin with a DuckDB oracle is
    operators/labeling.py:cohens_kappa."""
    from data_ingestion_system_spark.operators.labeling import pairwise_kappa_stats

    return pairwise_kappa_stats(labels, "review_id", "annotator_id", "sentiment")
