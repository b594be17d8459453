"""Physical write layout — the engine's replacement for SQLite indexes.

The reference tunes 13 B-tree indexes to its query patterns
(reference: src/database/schema.sql:166-201: composite (app_id, rating),
(app_id, review_timestamp), expression and DESC indexes). A columnar
engine gets the same selectivity from layout (SURVEY §4.1):

- hive-partition by the equality-filter key (app_id, date) → partition
  pruning replaces index range scans
- sort within files by the range/sort key (review_timestamp) → parquet
  min/max row-group statistics replace B-tree ordering
- file sizing via repartition over the partition key → no small files

`scan` proves the effect: filters on the partition key appear as
PartitionFilters (directory pruning, zero I/O for pruned partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with index-equivalent layout: one shuffle to co-locate each
    partition value, optional in-file ordering for row-group pruning."""
    out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_within:
        out = out.sortWithinPartitions(*[F.col(c) for c in (partition_by + sort_within)])
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def scan(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
