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
every fetched key per batch with a `quarantined` flag — so
MIN(batch_id) per key over the flag=false rows is its insert batch
(later re-fetches appear at higher batch_ids and don't move the
minimum, and a key quarantined in batch Q then inserted in batch I > Q
is correctly dated I, not Q).

Scale shape: provenance carries (key, batch_id, flag) only — at 100 TB
the semi-join shuffles narrow keys, and the `batch_id <= N` filter is
applied BEFORE the min-aggregate (a key's min is <= N iff it appears
in any partition <= N), so batch_id partition pruning cuts the
provenance scan to the requested range. `F.broadcast` is NOT forced:
the key set is store-sized, exactly what AQE should decide on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.streaming.ingest import IngestPaths


def _first_insert_batches(
    spark: SparkSession, paths: IngestPaths, up_to: int | None = None
) -> DataFrame:
    """(key, insert_batch): the batch each key was first INSERTED in
    (quarantined fetches excluded), optionally restricted to batches
    <= up_to — the pre-aggregate filter is what lets the parquet scan
    prune provenance partitions."""
    prov = spark.read.parquet(paths.provenance_dir)
    if "quarantined" in prov.columns:
        prov = prov.filter(~F.col("quarantined"))
    if up_to is not None:
        prov = prov.filter(F.col("batch_id") <= int(up_to))
    key_col = [c for c in prov.columns if c not in ("batch_id", "quarantined")][0]
    return prov.groupBy(key_col).agg(F.min("batch_id").alias("insert_batch"))


def store_as_of(spark: SparkSession, paths: IngestPaths, batch_id: int) -> DataFrame:
    """The deduplicated store as of the given batch (inclusive)."""
    first = _first_insert_batches(spark, paths, up_to=batch_id)
    target = spark.read.parquet(paths.target_dir)
    key_col = [c for c in first.columns if c != "insert_batch"][0]
    return target.join(first.select(key_col), key_col, "left_semi")


def change_feed(
    spark: SparkSession, paths: IngestPaths, from_batch: int, to_batch: int
) -> DataFrame:
    """Rows first inserted in batches (from_batch, to_batch], with their
    insert_batch — the incremental slice between two snapshots."""
    first = _first_insert_batches(spark, paths, up_to=to_batch).filter(
        F.col("insert_batch") > int(from_batch)
    )
    target = spark.read.parquet(paths.target_dir)
    key_col = [c for c in first.columns if c != "insert_batch"][0]
    return target.join(first, key_col)
