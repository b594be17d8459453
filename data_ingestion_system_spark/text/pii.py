"""PII detection & redaction — the scrub pass every training-data
pipeline runs before export (emails, phone numbers, IP addresses →
typed placeholder tokens).

The corpus tables contain no PII by construction, so the operator runs
over a deterministic PII fixture derived from the row id (the
fixture-twin technique of text/cleaning.py): the DuckDB oracle
regenerates identical strings and applies identical regexes, so both
the detection counts AND the redacted text are value-hash-checked.

Engine parity notes: patterns stick to the regex subset Java
(Spark) and RE2 (DuckDB) agree on — character classes, `\\d`, bounded
repetition; no backreferences or lookarounds. DuckDB's regexp_replace
needs the 'g' flag to replace all occurrences (Spark always does).

Scale shape: pure narrow map — regexp_extract_all + regexp_replace per
row, whole-stage codegen, no shuffle, no UDF. At 100 TB this is
exactly as parallel as the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query

N_PII = 1000

# Java & RE2 common-subset patterns
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def pii_text(spark: SparkSession, n: int = N_PII) -> DataFrame:
    """(doc_id, raw) rows mixing emails, phones, IPv4s, and clean rows,
    all derived from doc_id."""
    i = F.col("id")
    raw = F.concat(
        F.lit("user note "),
        i.cast("string"),
        F.when(
            i % 3 == 0,
            F.concat(F.lit(" contact bob"), i.cast("string"), F.lit("@mail.com now")),
        ).otherwise(F.lit("")),
        F.when(
            i % 5 == 0,
            F.concat(F.lit(" call 555-010-"), F.lpad((i % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            i % 7 == 0,
            F.concat(F.lit(" from 10.0."), (i % 256).cast("string"), F.lit("."),
                     ((i * 3) % 256).cast("string")),
        ).otherwise(F.lit(" all clear")),
    )
    return spark.range(n).select(i.alias("doc_id"), raw.alias("raw"))


def pii_text_sql(n: int = N_PII) -> str:
    """DuckDB twin of `pii_text`."""
    return f"""
SELECT range AS doc_id,
  concat(
    'user note ', CAST(range AS VARCHAR),
    CASE WHEN range % 3 = 0
         THEN ' contact bob' || CAST(range AS VARCHAR) || '@mail.com now'
         ELSE '' END,
    CASE WHEN range % 5 = 0
         THEN ' call 555-010-' || lpad(CAST(range % 10000 AS VARCHAR), 4, '0')
         ELSE '' END,
    CASE WHEN range % 7 = 0
         THEN ' from 10.0.' || CAST(range % 256 AS VARCHAR) || '.' || CAST((range * 3) % 256 AS VARCHAR)
         ELSE ' all clear' END
  ) AS raw
FROM range({n})
"""


def redact(raw: F.Column) -> F.Column:
    """email → [EMAIL], phone → [PHONE], ip → [IP]. Order matters: the
    phone pattern must run before IP would otherwise never match inside
    it (disjoint here, but the order is part of the contract)."""
    out = F.regexp_replace(raw, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, PHONE_RE, "[PHONE]")
    return F.regexp_replace(out, IP_RE, "[IP]")


@query(
    "pii_redaction",
    oracle=f"""
WITH pii AS ({pii_text_sql()})
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(raw,
         '{EMAIL_RE}', '[EMAIL]', 'g'),
         '{PHONE_RE}', '[PHONE]', 'g'),
         '{IP_RE}', '[IP]', 'g') AS redacted,
       CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{PHONE_RE}')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(raw, '{IP_RE}')) AS INTEGER) AS n_ips
FROM pii
ORDER BY doc_id
""",
    survey="EXT-text",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII redaction with per-kind counts — the export scrub pass,
    with both the counts and the rewritten text hash-verified against
    the oracle's regex engine."""
    pii = pii_text(spark)
    # F.lit(pattern) keeps the regex OUT of Spark SQL string-literal
    # parsing, which would swallow the backslash in \\d
    return pii.select(
        "doc_id",
        redact(F.col("raw")).alias("redacted"),
        F.size(F.regexp_extract_all("raw", F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all("raw", F.lit(IP_RE), F.lit(0))).alias("n_ips"),
    ).orderBy("doc_id")
