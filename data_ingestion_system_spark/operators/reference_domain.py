"""Reference-domain queries surfaced in the driver catalog.

These run the reference's own view shapes (views.py) over the generated
review-domain fixtures (fixtures.py) — the driver's testdata has no
reviews table, so these register as rows-only checks; their value-level
parity is established in tests/test_reference_views.py, where the same
generated rows are loaded into DuckDB and compared against the
reference's literal view SQL (schema.sql:209-404).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_system_spark.fixtures import (
    generate_apps,
    generate_labels,
    generate_reviews,
)
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.views import (
    v_app_stats,
    v_labeled_reviews,
    v_reviews_sentiment,
)

FIXTURE_ROWS = 2000


@query("ref_v_app_stats", oracle=None, survey="A1,ref-views")
def ref_v_app_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship `v_app_stats` (schema.sql:236-249) on the
    review-domain fixture — per-app rating/reply/length aggregates."""
    return v_app_stats(generate_reviews(spark, FIXTURE_ROWS))


@query("ref_v_reviews_sentiment", oracle=None, survey="P6,P7,ref-views")
def ref_v_reviews_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`v_reviews_sentiment` (schema.sql:219-232): sentiment + length
    buckets on real review semantics (rating 1-5, content length)."""
    return v_reviews_sentiment(generate_reviews(spark, FIXTURE_ROWS)).select(
        "review_id", "rating", "sentiment_bucket", "length_bucket"
    ).orderBy("review_id")


@query("ref_v_labeled_reviews", oracle=None, survey="J2,ref-views")
def ref_v_labeled_reviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`v_labeled_reviews` (schema.sql:375-404): the 4-way labeling join
    with the star_label_mismatch flag."""
    reviews = generate_reviews(spark, FIXTURE_ROWS)
    return v_labeled_reviews(
        generate_labels(spark), reviews, generate_apps(spark)
    ).orderBy("label_id")
