"""Multimodal columns: binary payloads + typed metadata (SURVEY.md §7 Stage 6).

Images/audio/video ride through the engine as opaque `binary` columns with
a typed metadata struct; decode / feature-extraction runs as Arrow-batched
Pandas functions over `mapInPandas`. The real decode needs codec libraries
not present in this container, so the decode step is STUBBED:

- `decode_image_stub` raises NotImplementedError (the honest production
  hook), and
- `fake_feature_extractor` is a deterministic stand-in (byte statistics)
  that exercises the actual Spark plumbing — schema, batch iteration,
  partitioning — end to end.

The payload here is the document text utf-8-encoded; at 100 TB the same
plan reads parquet binary columns written by an upstream media fetcher.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_image_stub(payload_bytes: bytes):
    """Production decode hook — requires an image codec (PIL/libjpeg),
    which this container does not ship. STUB."""
    raise NotImplementedError(
        "image decode requires codec libraries not present in this environment; "
        "plug a real decoder in here — the surrounding Spark plumbing is live"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("first8_sum", LongType()),
    ]
)


def make_feature_extractor():
    """Deterministic stand-in feature extractor (per Arrow batch): byte
    count, mean byte value, checksum of the first 8 bytes. Replace the
    body with a real decoder+model without touching the plan.

    Returned as a self-contained closure so cloudpickle serializes it BY
    VALUE: Spark python workers don't necessarily have this package on
    their PYTHONPATH (the grading driver imports __spark_entry__ by path),
    and a by-reference pickle would ModuleNotFoundError on the executor.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "first8_sum": payloads.map(lambda b: int(sum(b[:8]))).astype("int64"),
                }
            )

    return extract


fake_feature_extractor = make_feature_extractor()


@query(
    "multimodal_payload_stats",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY source
ORDER BY source
""",
    survey="EXT-multimodal",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column accounting per source — the storage-budget query a
    media pipeline runs before a backfill."""
    docs = load_table(spark, sf_dir, "documents")
    payload = with_payload(docs).join(docs.select("doc_id", "source"), "doc_id")
    return (
        payload.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_features",
    oracle=None,  # Pandas-UDF pipeline — rows-only driver check; exact
    # value assertions live in tests/test_multimodal.py
    survey="EXT-multimodal",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas feature-extraction pipeline over binary payloads
    (Arrow-batched; the fake extractor is deterministic so tests can
    assert exact values)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = with_payload(docs).select("doc_id", "payload")
    feats = payload.mapInPandas(fake_feature_extractor, schema=FEATURE_SCHEMA)
    return feats.orderBy("doc_id")
