"""Time-travel & change-feed reads over the ingest audit trail.

The reference keeps `review_scrape_log` (reference:
src/database/schema.sql:110-118) precisely so runs can be reconstructed
after the fact; its README reads it only for provenance joins. Here the
same junction table (the provenance parquet dedup_insert_batch writes,
partitioned by batch_id) becomes a full snapshot mechanism:

* `store_as_of(spark, paths, batch_id)` — the deduplicated store as it
  looked after batch N committed: target rows whose key FIRST appeared
  in a batch ≤ N. No copies, no tombstones — the provenance log IS the
  snapshot index, so historical reads cost one semi-join.
* `change_feed(spark, paths, from_batch, to_batch)` — the rows INSERTED
  per batch in (from, to]: the CDC stream a downstream consumer tails
  to stay incremental instead of re-reading the store.

Correctness rests on two invariants dedup_insert_batch already
maintains: the store is append-only with key-level INSERT-OR-IGNORE
(a key's row never changes after first insert), and provenance logs
every fetched key per batch (so MIN(batch_id) per key is its insert
batch — later re-fetches appear at higher batch_ids and don't move the
minimum).

Scale shape: provenance carries (key, batch_id) only — at 100 TB the
semi-join shuffles narrow keys, and batch_id partition pruning cuts the
provenance scan to the requested range. `F.broadcast` is NOT forced:
the key set is store-sized, exactly what AQE should decide on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.streaming.ingest import IngestPaths


def _first_insert_batches(spark: SparkSession, paths: IngestPaths) -> DataFrame:
    """(key, insert_batch): the batch in which each key first appeared."""
    prov = spark.read.parquet(paths.provenance_dir)
    key_col = [c for c in prov.columns if c != "batch_id"][0]
    return prov.groupBy(key_col).agg(F.min("batch_id").alias("insert_batch"))


def store_as_of(spark: SparkSession, paths: IngestPaths, batch_id: int) -> DataFrame:
    """The deduplicated store as of the given batch (inclusive)."""
    first = _first_insert_batches(spark, paths).filter(
        F.col("insert_batch") <= int(batch_id)
    )
    target = spark.read.parquet(paths.target_dir)
    key_col = [c for c in first.columns if c != "insert_batch"][0]
    return target.join(first.select(key_col), key_col, "left_semi")


def change_feed(
    spark: SparkSession, paths: IngestPaths, from_batch: int, to_batch: int
) -> DataFrame:
    """Rows first inserted in batches (from_batch, to_batch], with their
    insert_batch — the incremental slice between two snapshots."""
    first = _first_insert_batches(spark, paths).filter(
        (F.col("insert_batch") > int(from_batch))
        & (F.col("insert_batch") <= int(to_batch))
    )
    target = spark.read.parquet(paths.target_dir)
    key_col = [c for c in first.columns if c != "insert_batch"][0]
    return target.join(first, key_col)
