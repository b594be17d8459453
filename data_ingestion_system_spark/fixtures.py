"""Deterministic review-domain fixture generation (FIXTURES.md).

Generates the reference's data model — reviews, apps, labels, scrape_runs
(reference: src/database/schema.sql) — with the published corpus
distributions (docs/summery_deck.md:294-323: bimodal ratings 58.6%/24.7%,
length mix, ~14%/~86% null rates, shared-content duplicates).

Everything derives arithmetically from `spark.range(n)` — no `rand()`:
Spark's rand(seed) is partition-layout-dependent, while Weyl-sequence
arithmetic (id * odd-constant mod m) is deterministic under any
parallelism AND reproducible in DuckDB SQL for differential tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_APPS = 20
BASE_TS = "2024-01-01 00:00:00"

# Weyl multipliers (distinct odd constants → independent-ish uniform draws)
_M = {
    "rating": 2654435761,
    "len": 40503,
    "null1": 69069,
    "null2": 1327217885,
    "thumbs": 179424673,
    "dup": 97,
    "ts": 514229,
}


def _u(mult: int, mod: int = 10000) -> F.Column:
    """Deterministic pseudo-uniform integer in [0, mod) from the row id."""
    return (F.col("id") * mult) % mod


def generate_apps(spark: SparkSession) -> DataFrame:
    """~20-row app dimension (schema.sql:24-41)."""
    return spark.range(N_APPS).select(
        F.format_string("com.example.app%02d", F.col("id") + 1).alias("app_id"),
        F.format_string("App %02d", F.col("id") + 1).alias("title"),
        F.format_string("Dev %d", F.col("id") % 7).alias("developer"),
        F.element_at(
            F.array(*[F.lit(g) for g in
                      ["Communication", "Music", "Games", "Social", "Tools",
                       "Finance", "Shopping", "Productivity"]]),
            (F.col("id") % 8 + 1).cast("int"),
        ).alias("genre"),
        (F.lit(2.6) + (F.col("id") % 18) * 0.1).alias("play_store_rating"),
        (F.lit(100000) + F.col("id") * 95000).alias("play_store_reviews"),
        F.lit("10,000,000+").alias("installs"),
        F.lit(BASE_TS).cast("timestamp").alias("first_scraped_at"),
        F.lit("2024-04-10 00:00:00").cast("timestamp").alias("last_scraped_at"),
    )


_CONTENTS = [
    "good",                                         # single word (22.5% class)
    "ok",
    "nice app",
    "love it works great",
    "this app keeps crashing on startup and support never answers my emails",
    "decent but the latest update broke notifications and drains my battery "
    "much faster than before please fix",
    "absolutely terrible experience the app logs me out every day loses my "
    "settings and the ads are completely out of control i am uninstalling "
    "this right now and telling everyone i know to avoid it until the "
    "developers actually start listening to their users for once",
    "aaaaa",                                        # repeated chars
    "",                                             # empty
    "五星好评",                                      # no latin letters
]


def generate_reviews(spark: SparkSession, n: int = 2000) -> DataFrame:
    """Review fact table with reference distributions (schema.sql:49-75).

    ~35% of rows share content with another row (the duplicate-content
    population, deep_analysis.py:326-344); app volume is skewed (app 1
    gets ~3× app 20); replied rows skew negative (docs/database_schema.md:351).
    """
    df = spark.range(n)
    u_rating = _u(_M["rating"])
    rating = (
        F.when(u_rating < 5860, 5)
        .when(u_rating < 6590, 4)
        .when(u_rating < 7090, 3)
        .when(u_rating < 7520, 2)
        .otherwise(1)
    )
    # skewed app volume via inverse-CDF of a linearly decreasing density
    # f(x) ∝ (3 - 2x) on [0,1): x = (3 - sqrt(9 - 8v))/2, app = floor(20x)+1
    # → P(app 1)/P(app 20) ≈ 2.8, the documented ~3× ramp. (The previous
    # floor(sqrt(u)) % 20 destroyed the ramp — % across a monotone ramp
    # is uniform.)
    _v = _u(_M["len"], 400 * 400).cast("double") / F.lit(160000.0)
    _x = (F.lit(3.0) - F.sqrt(F.lit(9.0) - F.lit(8.0) * _v)) / F.lit(2.0)
    app_idx = F.least(F.floor(F.lit(20.0) * _x) + 1, F.lit(N_APPS)).cast("int")
    content = F.element_at(
        F.array(*[F.lit(c) for c in _CONTENTS]),
        ((F.col("id") * _M["dup"]) % len(_CONTENTS) + 1).cast("int"),
    )
    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(
        mins=(F.col("id") * 71 % (100 * 24 * 60))
    )
    has_reply = _u(_M["null2"]) < F.when(rating <= 2, 3500).otherwise(500)
    return df.select(
        F.md5(F.concat(F.lit("rev:"), F.col("id"))).alias("review_id"),
        F.format_string("com.example.app%02d", app_idx).alias("app_id"),
        F.format_string("user_%d", (F.col("id") * 31) % 997).alias("author"),
        rating.cast("int").alias("rating"),
        content.alias("content"),
        ts.alias("review_timestamp"),
        (ts + F.make_interval(hours=F.lit(4))).alias("scraped_at"),
        F.when(_u(_M["thumbs"]) < 7000, 0)
        .otherwise((F.col("id") * 13) % F.when(rating <= 2, 190).otherwise(10))
        .cast("int")
        .alias("thumbs_up"),
        F.when(_u(_M["null1"]) < 1400, F.lit(None).cast("string"))
        .otherwise(F.format_string("5.%d.0", F.col("id") % 9))
        .alias("app_version"),
        F.when(has_reply, F.lit("Thanks for the feedback, we are looking into it."))
        .otherwise(F.lit(None).cast("string"))
        .alias("reply_content"),
        F.when(has_reply, ts + F.make_interval(days=F.lit(1)))
        .otherwise(F.lit(None).cast("timestamp"))
        .alias("reply_timestamp"),
    )


def reviews_sql(n: int = 2000) -> str:
    """DuckDB CTE body reproducing `generate_reviews(spark, n)` EXACTLY —
    the generator is pure integer arithmetic on the row id, so the SQL
    twin lets the driver's oracle hash-check queries over the review
    domain even though its testdata has no reviews table."""
    contents = ", ".join("'" + c.replace("'", "''") + "'" for c in _CONTENTS)
    return f"""
SELECT
  md5('rev:' || CAST(id AS VARCHAR)) AS review_id,
  printf('com.example.app%02d', CAST(LEAST(FLOOR(20.0 * ((3.0 - SQRT(9.0 - 8.0 * (CAST((id * {_M["len"]}) % 160000 AS DOUBLE) / 160000.0))) / 2.0)) + 1, {N_APPS}) AS BIGINT)) AS app_id,
  printf('user_%d', (id * 31) % 997) AS author,
  CAST(CASE WHEN (id * {_M["rating"]}) % 10000 < 5860 THEN 5
            WHEN (id * {_M["rating"]}) % 10000 < 6590 THEN 4
            WHEN (id * {_M["rating"]}) % 10000 < 7090 THEN 3
            WHEN (id * {_M["rating"]}) % 10000 < 7520 THEN 2
            ELSE 1 END AS INTEGER) AS rating,
  ([{contents}])[CAST((id * {_M["dup"]}) % {len(_CONTENTS)} + 1 AS INTEGER)] AS content,
  TIMESTAMP '{BASE_TS}' + ((id * 71) % {100 * 24 * 60}) * INTERVAL 1 MINUTE AS review_timestamp,
  TIMESTAMP '{BASE_TS}' + ((id * 71) % {100 * 24 * 60}) * INTERVAL 1 MINUTE + INTERVAL 4 HOUR AS scraped_at,
  CAST(CASE WHEN (id * {_M["thumbs"]}) % 10000 < 7000 THEN 0
            ELSE (id * 13) % (CASE WHEN (id * {_M["rating"]}) % 10000 >= 7090 THEN 190 ELSE 10 END)
       END AS INTEGER) AS thumbs_up,
  CASE WHEN (id * {_M["null1"]}) % 10000 < 1400 THEN NULL
       ELSE printf('5.%d.0', id % 9) END AS app_version,
  CASE WHEN (id * {_M["null2"]}) % 10000 < (CASE WHEN (id * {_M["rating"]}) % 10000 >= 7090 THEN 3500 ELSE 500 END)
       THEN 'Thanks for the feedback, we are looking into it.' ELSE NULL END AS reply_content,
  CASE WHEN (id * {_M["null2"]}) % 10000 < (CASE WHEN (id * {_M["rating"]}) % 10000 >= 7090 THEN 3500 ELSE 500 END)
       THEN TIMESTAMP '{BASE_TS}' + ((id * 71) % {100 * 24 * 60}) * INTERVAL 1 MINUTE + INTERVAL 1 DAY
       ELSE NULL END AS reply_timestamp
FROM range({n}) t(id)
"""


SENTIMENTS = ["very_negative", "negative", "neutral", "positive", "very_positive"]
N_ANNOTATORS = 3
LABELS_TS = "2024-04-12 00:00:00"


def generate_annotators(spark: SparkSession) -> DataFrame:
    """Annotator dimension (schema.sql:275-280): id, name, active flag."""
    return spark.range(N_ANNOTATORS).select(
        F.col("id").alias("annotator_id"),
        F.format_string("annotator_%d", F.col("id")).alias("name"),
        F.lit(BASE_TS).cast("timestamp").alias("created_at"),
        F.lit(1).cast("int").alias("is_active"),
    )


def annotators_sql() -> str:
    """DuckDB twin of `generate_annotators` (attribution columns only)."""
    return f"""
SELECT id AS annotator_id,
       printf('annotator_%d', id) AS name,
       TIMESTAMP '{BASE_TS}' AS created_at,
       CAST(1 AS INTEGER) AS is_active
FROM range({N_ANNOTATORS}) t(id)
"""


def apps_sql() -> str:
    """DuckDB twin of `generate_apps` (the columns views join on)."""
    genres = ", ".join(
        "'" + g + "'"
        for g in ["Communication", "Music", "Games", "Social", "Tools",
                  "Finance", "Shopping", "Productivity"]
    )
    return f"""
SELECT printf('com.example.app%02d', id + 1) AS app_id,
       printf('App %02d', id + 1) AS title,
       printf('Dev %d', id % 7) AS developer,
       ([{genres}])[CAST(id % 8 + 1 AS INTEGER)] AS genre
FROM range({N_APPS}) t(id)
"""


def generate_labels(spark: SparkSession, n_reviews: int = 2000, n_labeled: int = 300) -> DataFrame:
    """Labels with ~10% double-annotation incl. disagreements + ties
    (schema.sql:286-307; overlap settings.py:160). label rows reference
    the first `n_labeled` review ids; every ~10th labeled review gets a
    second annotator whose label sometimes disagrees.

    Confidence derives from the review ordinal k via Weyl arithmetic (not
    crc32) so `labels_sql()` can reproduce the table exactly in DuckDB."""
    base = spark.range(n_labeled).select(
        F.col("id").alias("k"),
        F.md5(F.concat(F.lit("rev:"), F.col("id"))).alias("review_id"),
        (F.col("id") % 3).alias("annotator_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in SENTIMENTS]),
            ((F.col("id") * 7) % 5 + 1).cast("int"),
        ).alias("sentiment"),
    )
    second = (
        base.filter(F.col("k") % 10 == 0)
        .select(
            F.col("k"),
            "review_id",
            ((F.col("annotator_id") + 1) % 3).alias("annotator_id"),
            # half the double-annotations disagree (shifted label)
            F.when(
                F.col("k") % 20 == 0,
                F.element_at(
                    F.array(*[F.lit(s) for s in SENTIMENTS]),
                    ((F.col("k") * 7 + 1) % 5 + 1).cast("int"),
                ),
            ).otherwise(F.col("sentiment")).alias("sentiment"),
        )
    )
    both = base.select("k", "review_id", "annotator_id", "sentiment").unionByName(
        second.select("k", "review_id", "annotator_id", "sentiment")
    )
    w = F.row_number().over(Window.orderBy("review_id", "annotator_id"))
    conf_u = (F.col("k") * _M["null1"]) % 100
    return both.select(
        w.cast("long").alias("label_id"),  # reference label_id is a 64-bit rowid
        "review_id",
        "annotator_id",
        "sentiment",
        F.when(conf_u < 70, "high").when(conf_u < 95, "medium").otherwise("low").alias("confidence"),
        F.lit(None).cast("string").alias("notes"),
        F.lit(LABELS_TS).cast("timestamp").alias("created_at"),
    )


def labels_sql(n_labeled: int = 300) -> str:
    """DuckDB CTE body reproducing `generate_labels(spark, n_labeled=n)`
    exactly — same Weyl draws, same row_number() tie order — licensing a
    full value-hash oracle for the labeling view."""
    sentiments = ", ".join("'" + s + "'" for s in SENTIMENTS)
    return f"""
WITH lbase AS (
  SELECT id AS k,
         md5('rev:' || CAST(id AS VARCHAR)) AS review_id,
         id % 3 AS annotator_id,
         ([{sentiments}])[CAST((id * 7) % 5 + 1 AS INTEGER)] AS sentiment
  FROM range({n_labeled}) t(id)
), lsecond AS (
  SELECT k, review_id, (annotator_id + 1) % 3 AS annotator_id,
         CASE WHEN k % 20 = 0
              THEN ([{sentiments}])[CAST((k * 7 + 1) % 5 + 1 AS INTEGER)]
              ELSE sentiment END AS sentiment
  FROM lbase WHERE k % 10 = 0
), lboth AS (
  SELECT * FROM lbase UNION ALL SELECT * FROM lsecond
)
SELECT ROW_NUMBER() OVER (ORDER BY review_id, annotator_id) AS label_id,
       review_id, annotator_id, sentiment,
       CASE WHEN (k * {_M["null1"]}) % 100 < 70 THEN 'high'
            WHEN (k * {_M["null1"]}) % 100 < 95 THEN 'medium'
            ELSE 'low' END AS confidence,
       CAST(NULL AS VARCHAR) AS notes,
       TIMESTAMP '{LABELS_TS}' AS created_at
FROM lboth
"""


def generate_scrape_runs(spark: SparkSession, n_runs: int = 12) -> DataFrame:
    """Sequential run history with one duration spike and one insert drop
    (FIXTURES.md §3 — trips the T6 anomaly rules on purpose)."""
    return spark.range(1, n_runs + 1).select(
        F.col("id").alias("run_id"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(hours=(F.col("id") - 1) * 4)
        ).alias("started_at"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(hours=(F.col("id") - 1) * 4)
            + F.make_interval(
                mins=F.when(F.col("id") == 9, 22).otherwise(9 + (F.col("id") % 3))
            )
        ).alias("completed_at"),
        F.when(F.col("id") == 7, "partial").otherwise("completed").alias("status"),
        F.lit('["com.example.app01","com.example.app02"]').alias("target_apps"),
        F.lit(300).cast("int").alias("reviews_per_app"),
        F.when(F.col("id") == 10, 310)
        .otherwise(7000 - F.col("id") * 450)
        .cast("int")
        .alias("total_reviews_collected"),
        F.lit(20).cast("int").alias("total_apps_processed"),
        F.when(F.col("id") == 7, "timeout on app13").otherwise(F.lit(None)).alias("error_message"),
    )
