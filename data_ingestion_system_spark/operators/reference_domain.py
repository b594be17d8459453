"""Reference-domain queries surfaced in the driver catalog.

These run the reference's own view shapes (views.py) over the generated
review-domain fixtures (fixtures.py). The driver's testdata has no
reviews table — but the fixture generator is pure integer arithmetic on
the row id, so `fixtures.reviews_sql()` reproduces it EXACTLY in DuckDB
(verified column-for-column in tests/test_reference_views.py), letting
the reference's literal view SQL (schema.sql:209-404) serve as a full
value-hash oracle. Only the labeling view stays rows-only (its label
generator uses crc32, which DuckDB lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_system_spark.fixtures import (
    annotators_sql,
    apps_sql,
    generate_annotators,
    generate_apps,
    generate_labels,
    generate_reviews,
    labels_sql,
    reviews_sql,
)
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.views import (
    v_app_stats,
    v_labeled_reviews,
    v_reviews_sentiment,
)

FIXTURE_ROWS = 2000
_REVIEWS_CTE = f"WITH reviews AS ({reviews_sql(FIXTURE_ROWS)})"


@query(
    "ref_v_app_stats",
    oracle=f"""
{_REVIEWS_CTE}
SELECT app_id,
  COUNT(*) AS review_count,
  ROUND(AVG(rating) * 100.0) / 100.0 AS avg_rating,
  CAST(SUM(CASE WHEN rating >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS positive_count,
  CAST(SUM(CASE WHEN rating <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS negative_count,
  CAST(SUM(CASE WHEN reply_content IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS replied_count,
  ROUND(AVG(length(content)) * 10.0) / 10.0 AS avg_content_length,
  ROUND(AVG(thumbs_up) * 100.0) / 100.0 AS avg_thumbs_up,
  MIN(review_timestamp) AS earliest_review,
  MAX(review_timestamp) AS latest_review
FROM reviews GROUP BY app_id ORDER BY app_id
""",
    survey="A1,ref-views",
)
def ref_v_app_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship `v_app_stats` (schema.sql:236-249) on the
    review-domain fixture — per-app rating/reply/length aggregates with
    the reference's exact output column names,
    value-hash-checked against the reference's literal view SQL."""
    return v_app_stats(generate_reviews(spark, FIXTURE_ROWS))


@query(
    "ref_v_reviews_sentiment",
    oracle=f"""
{_REVIEWS_CTE}
SELECT review_id, rating,
  CASE WHEN rating >= 4 THEN 'positive' WHEN rating = 3 THEN 'neutral' ELSE 'negative' END AS sentiment_bucket,
  CASE WHEN length(content) <= 10 THEN 'very_short' WHEN length(content) <= 50 THEN 'short'
       WHEN length(content) <= 200 THEN 'medium' ELSE 'long' END AS length_bucket
FROM reviews ORDER BY review_id
""",
    survey="P6,P7,ref-views",
)
def ref_v_reviews_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`v_reviews_sentiment` (schema.sql:219-232): sentiment + length
    buckets on real review semantics, value-hash-checked."""
    return v_reviews_sentiment(generate_reviews(spark, FIXTURE_ROWS)).select(
        "review_id", "rating", "sentiment_bucket", "length_bucket"
    ).orderBy("review_id")


@query(
    "ref_v_daily_stats",
    oracle=f"""
{_REVIEWS_CTE}
SELECT CAST(review_timestamp AS DATE) AS review_date,
  COUNT(*) AS review_count,
  ROUND(AVG(rating) * 100.0) / 100.0 AS avg_rating,
  CAST(SUM(CASE WHEN rating = 5 THEN 1 ELSE 0 END) AS BIGINT) AS five_star,
  CAST(SUM(CASE WHEN rating = 1 THEN 1 ELSE 0 END) AS BIGINT) AS one_star
FROM reviews GROUP BY 1 ORDER BY review_date
""",
    survey="A2,ref-views",
)
def ref_v_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`v_daily_stats` (schema.sql:252-261) on the fixture,
    value-hash-checked."""
    from data_ingestion_system_spark.views import v_daily_stats

    return v_daily_stats(generate_reviews(spark, FIXTURE_ROWS))


@query(
    "ref_v_labeled_reviews",
    oracle=f"""
{_REVIEWS_CTE},
labels AS ({labels_sql(300)}),
apps AS ({apps_sql()}),
annotators AS ({annotators_sql()})
SELECT l.label_id, l.sentiment, l.confidence, l.annotator_id,
       a.name AS annotator_name, r.review_id, r.content, r.rating,
       r.thumbs_up, r.review_timestamp, app.app_id,
       app.title AS app_title, app.genre AS app_genre,
       CAST(LENGTH(r.content) AS INTEGER) AS content_length,
       CASE WHEN r.rating >= 4 THEN 'positive'
            WHEN r.rating = 3 THEN 'neutral'
            ELSE 'negative' END AS star_sentiment_bucket,
       CAST(CASE WHEN l.sentiment IN ('very_positive', 'positive') AND r.rating <= 2 THEN 1
                 WHEN l.sentiment IN ('very_negative', 'negative') AND r.rating >= 4 THEN 1
                 ELSE 0 END AS INTEGER) AS star_label_mismatch
FROM labels l
JOIN reviews r ON l.review_id = r.review_id
JOIN apps app ON r.app_id = app.app_id
JOIN annotators a ON l.annotator_id = a.annotator_id
ORDER BY l.label_id
""",
    survey="J2,ref-views",
)
def ref_v_labeled_reviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`v_labeled_reviews` (schema.sql:375-404): the reference's 4-way
    labeling join (labels ⋈ reviews ⋈ apps ⋈ annotators, all inner) with
    its full column list and the star_label_mismatch flag. Fully
    value-hash-checked — the labels/apps/annotators fixtures all have
    exact DuckDB SQL twins (fixtures.labels_sql/apps_sql/annotators_sql)."""
    reviews = generate_reviews(spark, FIXTURE_ROWS)
    return v_labeled_reviews(
        generate_labels(spark), reviews, generate_apps(spark), generate_annotators(spark)
    ).orderBy("label_id")
