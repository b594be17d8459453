"""Bucketed table layout — shuffle-free co-located fact joins (SURVEY §4.1).

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides. Bucketing pre-shuffles ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
stored that way, so every later join on that key reads co-located
buckets and the plan carries no Exchange on either side. This is the
columnar analog of the reference pre-building its 13 B-tree indexes at
schema time (reference: src/database/schema.sql:166-201): pay at load
time, win on every query. It composes with `sources/layout.py` —
hive-partition by the pruning key, bucket by the join key.

One file per bucket: the writer first repartitions into ``n_buckets``
partitions on the bucket key. Spark's repartition hash and its bucket
hash are the same function (Murmur3 pmod n), so each write task holds
exactly one bucket's rows and emits exactly one file; without this,
every task writes a sliver of every bucket (tasks x buckets small
files — the classic bucketed-write mistake).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed parquet table in the session catalog.

    ``sort_cols`` additionally orders rows inside each bucket file
    (parquet row-group min/max stats then prune range predicates on the
    sort key, like `layout.write_partitioned`'s sortWithinPartitions).
    """
    out = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = out.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata only flows through
    ``spark.table``, not a direct parquet path read."""
    return spark.table(table)
