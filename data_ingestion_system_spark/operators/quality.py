"""Content-quality predicates — SURVEY.md §2.2 P9/P10.

The reference scans every review in Python applying regex/unicode checks
one row at a time (reference: src/analysis/deep_analysis.py:391-406,
src/analysis/data_quality_analyzer.py:193-200, :400-430). Here each flag
is a Column expression evaluated inside whole-stage codegen — one scan,
no Python in the loop, linearly scalable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import punct_ratio
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


def quality_flag_columns(text: Column) -> dict[str, Column]:
    """The reference's quality-flag battery (deep_analysis.py:391-406) as
    reusable boolean Columns."""
    trimmed = F.trim(text)
    n_words = F.size(F.split(trimmed, r"\s+"))
    return {
        "is_empty": (text.isNull()) | (F.length(trimmed) == 0),
        "is_single_word": (F.length(trimmed) > 0) & (n_words == 1),
        "is_2_3_words": n_words.between(2, 3),
        "is_all_caps": (F.length(trimmed) > 0)
        & (F.upper(trimmed) == trimmed)
        & trimmed.rlike("[A-Za-z]"),
        "has_repeated_chars": text.rlike(r"(.)\1{4,}"),
        "no_latin_letters": (F.length(trimmed) > 0) & ~text.rlike("[a-zA-Z]"),
        "high_punctuation": punct_ratio(text) > 0.3,
        "has_url": text.rlike(r"https?://|www\."),
    }


@query(
    "quality_flags",
    oracle="""
SELECT
  CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
  CAST(SUM(CASE WHEN length(trim(text)) > 0
                 AND length(trim(text)) - length(replace(trim(text), ' ', '')) = 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_single_word,
  CAST(SUM(CASE WHEN upper(trim(text)) = trim(text)
                 AND length(trim(text)) > 0
                 AND regexp_matches(trim(text), '[A-Za-z]')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_all_caps,
  CAST(SUM(CASE WHEN regexp_matches(text, 'aaaaa|bbbbb|ccccc|ddddd|eeeee|fffff|ggggg|hhhhh|iiiii|jjjjj|kkkkk|lllll|mmmmm|nnnnn|ooooo|ppppp|qqqqq|rrrrr|sssss|ttttt|uuuuu|vvvvv|wwwww|xxxxx|yyyyy|zzzzz') THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated_chars,
  CAST(SUM(CASE WHEN length(trim(text)) > 0 AND NOT regexp_matches(text, '[a-zA-Z]')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_no_latin,
  CAST(SUM(CASE WHEN regexp_matches(text, 'https?://|www\\.') THEN 1 ELSE 0 END) AS BIGINT) AS n_url,
  COUNT(*) AS n_total
FROM documents
""",
    survey="P9",
)
def quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-flag census over documents — one pass, all flags as
    SUM(CASE) (deep_analysis.py:391-406 computed these with 8 sequential
    Python list comprehensions over a collected corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    flags = quality_flag_columns(F.col("text"))
    # single-word via space-count to match an oracle expressible without
    # regex-split (the testdata corpus is single-space separated)
    trimmed = F.trim(F.col("text"))
    single_word = (F.length(trimmed) > 0) & (
        F.length(trimmed) - F.length(F.replace(trimmed, F.lit(" "), F.lit(""))) == 0
    )
    # DuckDB's RE2 has no backreferences, so the *registered* query uses an
    # explicit lowercase-alternation for the repeated-char flag on both
    # sides; `quality_flag_columns` keeps the generic `(.)\1{4,}` for
    # engine users (Java regex supports it).
    repeated = F.col("text").rlike("|".join(c * 5 for c in "abcdefghijklmnopqrstuvwxyz"))
    return docs.agg(
        F.sum(flags["is_empty"].cast("int")).alias("n_empty"),
        F.sum(single_word.cast("int")).alias("n_single_word"),
        F.sum(flags["is_all_caps"].cast("int")).alias("n_all_caps"),
        F.sum(repeated.cast("int")).alias("n_repeated_chars"),
        F.sum(flags["no_latin_letters"].cast("int")).alias("n_no_latin"),
        F.sum(flags["has_url"].cast("int")).alias("n_url"),
        F.count("*").alias("n_total"),
    )


def script_column(text: Column) -> Column:
    """First-match script classification (data_quality_analyzer.py:400-430):
    unicode-range rlike checks with fixed priority."""
    return (
        F.when(text.rlike(r"[Ѐ-ӿ]"), "cyrillic")
        .when(text.rlike(r"[؀-ۿ]"), "arabic")
        .when(text.rlike(r"[ऀ-ॿ]"), "devanagari")
        .when(text.rlike(r"[一-鿿぀-ヿ]"), "cjk")
        .when(text.rlike("[a-zA-Z]"), "latin")
        .otherwise("other")
    )


@query(
    "script_detection",
    oracle="""
SELECT CASE
    WHEN regexp_matches(text, '[\\x{0400}-\\x{04FF}]') THEN 'cyrillic'
    WHEN regexp_matches(text, '[\\x{0600}-\\x{06FF}]') THEN 'arabic'
    WHEN regexp_matches(text, '[\\x{0900}-\\x{097F}]') THEN 'devanagari'
    WHEN regexp_matches(text, '[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]') THEN 'cjk'
    WHEN regexp_matches(text, '[a-zA-Z]') THEN 'latin'
    ELSE 'other' END AS script,
  COUNT(*) AS n
FROM documents
GROUP BY 1
ORDER BY script
""",
    survey="P10",
)
def script_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script/encoding census (data_quality_analyzer.py:400-430)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(script_column(F.col("text")).alias("script"))
        .agg(F.count("*").alias("n"))
        .orderBy("script")
    )


@query(
    "high_punctuation_docs",
    oracle="""
SELECT doc_id,
       ROUND((CAST(length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS DOUBLE)
              / length(text)) * 10000.0) / 10000.0 AS punct_ratio
FROM documents
WHERE length(text) > 0
  AND CAST(length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS DOUBLE)
      / length(text) > 0.05
ORDER BY doc_id
""",
    survey="P9",
)
def high_punctuation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Punctuation-ratio predicate as a row filter (deep_analysis.py:398)."""
    docs = load_table(spark, sf_dir, "documents")
    ratio = punct_ratio(F.col("text"))
    return (
        docs.filter((F.length("text") > 0) & (ratio > 0.05))
        .select("doc_id", (F.round(ratio * 10000.0) / 10000.0).alias("punct_ratio"))
        .orderBy("doc_id")
    )
