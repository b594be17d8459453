"""Text normalization for training-data prep — the cleaning pass that
precedes dedup/quality filtering in an LLM pipeline: strip URLs,
collapse whitespace (tabs included), case-fold, trim.

The corpus tables are already clean (synthetic lowercase words), so the
operator runs over a deterministic dirty-text fixture built from the
row id with pure CASE/concat algebra — the same fixture-twin technique
as the review-domain queries (operators/reference_domain.py): the
DuckDB oracle regenerates the identical dirty strings and applies the
identical regex pipeline, so cleaning is value-hash-checked end to end.

Engine parity notes baked in below: DuckDB regexp_replace replaces only
the FIRST match unless given the 'g' flag (Spark always replaces all),
and the tab character enters through chr(9) on both sides to keep the
fixture strings byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query

N_DIRTY = 1000

_URL_RE = r"https?://\S+"
_WS_RE = r"\s+"


def dirty_text(spark: SparkSession, n: int = N_DIRTY) -> DataFrame:
    """(doc_id, raw) rows mixing URLs, runs of spaces, tabs, mixed case,
    and leading/trailing whitespace, all derived from doc_id."""
    i = F.col("id")
    raw = F.concat(
        F.when(i % 4 == 0, F.lit("  ")).otherwise(F.lit("")),
        F.lit("Review "),
        i.cast("string"),
        F.when(i % 3 == 0, F.concat(F.lit(" see https://example.com/p"), i.cast("string"))).otherwise(F.lit("")),
        F.when(i % 2 == 0, F.lit("   Lots   OF   Space")).otherwise(F.lit(" ok")),
        F.when(i % 7 == 0, F.concat(F.expr("chr(9)"), F.lit("tabbed"), F.expr("chr(9)"))).otherwise(F.lit("")),
    )
    return spark.range(n).select(i.alias("doc_id"), raw.alias("raw"))


def dirty_text_sql(n: int = N_DIRTY) -> str:
    """DuckDB twin of `dirty_text` (range(n) → identical strings)."""
    return f"""
SELECT range AS doc_id,
  concat(
    CASE WHEN range % 4 = 0 THEN '  ' ELSE '' END,
    'Review ', CAST(range AS VARCHAR),
    CASE WHEN range % 3 = 0 THEN ' see https://example.com/p' || CAST(range AS VARCHAR) ELSE '' END,
    CASE WHEN range % 2 = 0 THEN '   Lots   OF   Space' ELSE ' ok' END,
    CASE WHEN range % 7 = 0 THEN chr(9) || 'tabbed' || chr(9) ELSE '' END
  ) AS raw
FROM range({n})
"""


def clean_text(raw: F.Column) -> F.Column:
    """URL-strip → whitespace-collapse → lower → trim, all JVM-side."""
    no_url = F.regexp_replace(raw, _URL_RE, " ")
    one_space = F.regexp_replace(no_url, _WS_RE, " ")
    return F.trim(F.lower(one_space))


@query(
    "clean_documents",
    oracle=f"""
WITH dirty AS ({dirty_text_sql()}),
cleaned AS (
  SELECT doc_id, raw,
         trim(lower(regexp_replace(regexp_replace(raw, '{_URL_RE}', ' ', 'g'), '{_WS_RE}', ' ', 'g'))) AS clean_text,
         CASE WHEN regexp_matches(raw, '{_URL_RE}') THEN 1 ELSE 0 END AS had_url
  FROM dirty
)
SELECT doc_id, clean_text, CAST(had_url AS INTEGER) AS had_url,
       CAST(length(raw) - length(clean_text) AS BIGINT) AS removed_chars
FROM cleaned
ORDER BY doc_id
""",
    survey="EXT-text",
)
def clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized text + provenance metrics per document: cleaned string,
    whether a URL was removed, and how many characters cleaning dropped.
    At 100 TB this is a pure narrow map (no shuffle, whole-stage
    codegen); the fixture input stands in for a raw crawl table."""
    dirty = dirty_text(spark)
    cleaned = dirty.select(
        "doc_id",
        "raw",
        clean_text(F.col("raw")).alias("clean_text"),
        F.col("raw").rlike(_URL_RE).cast("int").alias("had_url"),
    )
    return cleaned.select(
        "doc_id",
        "clean_text",
        "had_url",
        (F.length("raw") - F.length("clean_text")).cast("long").alias("removed_chars"),
    ).orderBy("doc_id")
