"""Differential tests for the reference's five views on the review-domain
fixtures: the Spark view builders vs the reference's literal SQL
(schema.sql:209-404) executed by DuckDB over the SAME generated data.
This is the direct parity check on the reference's own shapes.
"""

from __future__ import annotations

import duckdb
import pytest

from conftest import assert_df_matches_oracle
from data_ingestion_system_spark.fixtures import (
    annotators_sql,
    apps_sql,
    generate_annotators,
    generate_apps,
    generate_labels,
    generate_reviews,
    generate_scrape_runs,
    labels_sql,
)
from data_ingestion_system_spark.views import (
    v_app_stats,
    v_daily_stats,
    v_labeled_reviews,
    v_reviews_sentiment,
    v_reviews_with_app,
)


@pytest.fixture(scope="module")
def fixture_duck(spark):
    """DuckDB connection with the generated fixtures registered — both
    engines then query identical rows."""
    con = duckdb.connect()
    reviews = generate_reviews(spark, 2000)
    apps = generate_apps(spark)
    labels = generate_labels(spark)
    annotators = generate_annotators(spark)
    runs = generate_scrape_runs(spark)
    con.register("reviews", reviews.toPandas())
    con.register("apps", apps.toPandas())
    con.register("labels", labels.toPandas())
    con.register("annotators", annotators.toPandas())
    con.register("scrape_runs", runs.toPandas())
    return con, reviews, apps, labels, annotators, runs


def test_generator_sql_twin_is_exact(spark):
    """fixtures.reviews_sql must reproduce generate_reviews bit-for-bit —
    this equality is what licenses the ref_v_* oracle checks."""
    import pandas as pd

    from data_ingestion_system_spark.fixtures import reviews_sql

    sdf = generate_reviews(spark, 500).orderBy("review_id").toPandas()
    ddf = duckdb.connect().execute(reviews_sql(500) + " ORDER BY review_id").fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    for c in sorted(sdf.columns):
        a, b = sdf[c], ddf[c]
        if a.dtype == object:
            assert (a.fillna("__N__") == b.fillna("__N__")).all(), c
        else:
            assert ((a.isna() & b.isna()) | (a == b)).all(), c


def test_fixture_distributions(fixture_duck):
    """The generator must honor the published corpus distributions
    (BASELINE.md) within tolerance."""
    con, *_ = fixture_duck
    five_star, one_star = con.execute(
        "SELECT AVG(CASE WHEN rating=5 THEN 1.0 ELSE 0 END),"
        " AVG(CASE WHEN rating=1 THEN 1.0 ELSE 0 END) FROM reviews"
    ).fetchone()
    assert abs(five_star - 0.586) < 0.03
    assert abs(one_star - 0.247) < 0.03
    null_ver, null_reply = con.execute(
        "SELECT AVG(CASE WHEN app_version IS NULL THEN 1.0 ELSE 0 END),"
        " AVG(CASE WHEN reply_content IS NULL THEN 1.0 ELSE 0 END) FROM reviews"
    ).fetchone()
    assert abs(null_ver - 0.14) < 0.03
    assert null_reply > 0.75
    # replied rows skew negative (docs/database_schema.md:351)
    replied_avg, unreplied_avg = con.execute(
        "SELECT (SELECT AVG(rating) FROM reviews WHERE reply_content IS NOT NULL),"
        " (SELECT AVG(rating) FROM reviews WHERE reply_content IS NULL)"
    ).fetchone()
    assert replied_avg < unreplied_avg


def test_v_reviews_with_app(spark, fixture_duck):
    con, reviews, apps, *_ = fixture_duck
    df = v_reviews_with_app(reviews, apps).orderBy("review_id")
    oracle = """
SELECT r.*, a.title AS app_title, a.developer AS app_developer, a.genre AS app_genre
FROM reviews r JOIN apps a ON r.app_id = a.app_id
ORDER BY review_id
"""
    assert_df_matches_oracle(df, con, oracle)


def test_v_reviews_sentiment(spark, fixture_duck):
    con, reviews, *_ = fixture_duck
    df = v_reviews_sentiment(reviews).select(
        "review_id", "sentiment_bucket", "length_bucket"
    ).orderBy("review_id")
    oracle = """
SELECT review_id,
  CASE WHEN rating >= 4 THEN 'positive' WHEN rating = 3 THEN 'neutral' ELSE 'negative' END AS sentiment_bucket,
  CASE WHEN length(content) <= 10 THEN 'very_short' WHEN length(content) <= 50 THEN 'short'
       WHEN length(content) <= 200 THEN 'medium' ELSE 'long' END AS length_bucket
FROM reviews ORDER BY review_id
"""
    assert_df_matches_oracle(df, con, oracle)


def test_v_app_stats(spark, fixture_duck):
    con, reviews, *_ = fixture_duck
    df = v_app_stats(reviews)
    oracle = """
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
"""
    assert_df_matches_oracle(df, con, oracle)


def test_v_daily_stats(spark, fixture_duck):
    con, reviews, *_ = fixture_duck
    df = v_daily_stats(reviews)
    oracle = """
SELECT CAST(review_timestamp AS DATE) AS review_date,
  COUNT(*) AS review_count,
  ROUND(AVG(rating) * 100.0) / 100.0 AS avg_rating,
  CAST(SUM(CASE WHEN rating = 5 THEN 1 ELSE 0 END) AS BIGINT) AS five_star,
  CAST(SUM(CASE WHEN rating = 1 THEN 1 ELSE 0 END) AS BIGINT) AS one_star
FROM reviews GROUP BY 1 ORDER BY review_date
"""
    assert_df_matches_oracle(df, con, oracle)


def test_v_labeled_reviews(spark, fixture_duck):
    """The reference's literal v_labeled_reviews SQL (schema.sql:375-404)
    vs the Spark builder — full column list, inner annotators join."""
    con, reviews, apps, labels, annotators, _ = fixture_duck
    df = v_labeled_reviews(labels, reviews, apps, annotators).orderBy("label_id")
    oracle = """
SELECT
    l.label_id,
    l.sentiment,
    l.confidence,
    l.annotator_id,
    a.name AS annotator_name,
    r.review_id,
    r.content,
    r.rating,
    r.thumbs_up,
    r.review_timestamp,
    app.app_id,
    app.title AS app_title,
    app.genre AS app_genre,
    CAST(LENGTH(r.content) AS INTEGER) AS content_length,
    CASE
        WHEN r.rating >= 4 THEN 'positive'
        WHEN r.rating = 3 THEN 'neutral'
        ELSE 'negative'
    END AS star_sentiment_bucket,
    CAST(CASE
        WHEN l.sentiment IN ('very_positive', 'positive') AND r.rating <= 2 THEN 1
        WHEN l.sentiment IN ('very_negative', 'negative') AND r.rating >= 4 THEN 1
        ELSE 0
    END AS INTEGER) AS star_label_mismatch
FROM labels l
JOIN reviews r ON l.review_id = r.review_id
JOIN apps app ON r.app_id = app.app_id
JOIN annotators a ON l.annotator_id = a.annotator_id
ORDER BY l.label_id
"""
    assert_df_matches_oracle(df, con, oracle)
    # fixture must contain actual mismatches for the flag to be exercised
    assert df.filter("star_label_mismatch = 1").count() > 0


def test_labels_apps_annotators_sql_twins_are_exact(spark, fixture_duck):
    """labels_sql/apps_sql/annotators_sql must reproduce their Spark
    generators bit-for-bit — this licenses the full-oracle driver check
    on ref_v_labeled_reviews."""
    con = duckdb.connect()
    for twin, df in (
        (labels_sql(300), generate_labels(spark)),
        (apps_sql(), generate_apps(spark).select("app_id", "title", "developer", "genre")),
        (annotators_sql(), generate_annotators(spark)),
    ):
        sdf = df.toPandas()
        key = sdf.columns[0]
        sdf = sdf.sort_values(key).reset_index(drop=True)
        ddf = con.execute(f"SELECT * FROM ({twin}) ORDER BY 1").fetchdf()
        assert sorted(sdf.columns) == sorted(ddf.columns)
        for c in sdf.columns:
            a, b = sdf[c].astype(str), ddf[c].astype(str)
            assert (a == b).all(), f"{key}: column {c} diverges"


def test_anomaly_rules_on_run_history(spark, fixture_duck):
    """The planted duration spike (run 9) and insert drop (run 10) must
    trip the reference's anomaly rules (monitor.py:72-78 thresholds)."""
    con, *_, runs = fixture_duck
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w5 = Window.orderBy("run_id").rowsBetween(-5, -1)
    dur = (
        F.unix_timestamp("completed_at") - F.unix_timestamp("started_at")
    ).cast("double")
    flagged = (
        runs.select(
            "run_id",
            dur.alias("duration"),
            F.col("total_reviews_collected").cast("double").alias("inserted"),
        )
        .select(
            "run_id",
            (F.col("duration") > 2.0 * F.avg("duration").over(w5)).alias("flag_duration"),
            (F.col("inserted") < 0.5 * F.avg("inserted").over(w5)).alias("flag_drop"),
        )
        .collect()
    )
    by_run = {r.run_id: r for r in flagged}
    assert by_run[9].flag_duration is True
    assert by_run[10].flag_drop is True
    assert not any(
        r.flag_duration or r.flag_drop
        for r in flagged
        if r.run_id not in (9, 10) and r.flag_duration is not None
    )


def test_fixture_outputs_match_declared_review_domain_schemas(spark):
    """schemas.REVIEW_DOMAIN_SCHEMAS is the reference's table-shape
    parity contract; every fixture generator must emit EXACTLY those
    columns and Spark types, so the declared schemas cannot drift from
    the frames the engine actually runs on."""
    from data_ingestion_system_spark import fixtures as fx
    from data_ingestion_system_spark.schemas import REVIEW_DOMAIN_SCHEMAS

    pairs = {
        "reviews": fx.generate_reviews(spark, 50),
        "apps": fx.generate_apps(spark),
        "annotators": fx.generate_annotators(spark),
        "labels": fx.generate_labels(spark, 50, 20),
        "scrape_runs": fx.generate_scrape_runs(spark, 3),
    }
    for name, df in pairs.items():
        declared = [
            (f.name, f.dataType.simpleString())
            for f in REVIEW_DOMAIN_SCHEMAS[name].fields
        ]
        assert df.dtypes == declared, f"{name}: {df.dtypes} != {declared}"
