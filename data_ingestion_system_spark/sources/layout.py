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


# --- Z-order (Morton) multi-column clustering --------------------------------

Z_BITS = 12  # bits per dimension → 2^24 cells for two columns


def zorder_key(a, b, bits: int = Z_BITS):
    """Morton-interleave two non-negative int columns (each < 2**bits)
    into one locality key: bit i of `a` lands at position 2i, bit i of
    `b` at 2i+1. Pure shift/mask expression algebra — codegen-friendly,
    no UDF.

    Sorting by a single column gives perfect pruning on it and none on
    the other; sorting by the Morton code gives ~sqrt pruning on BOTH —
    the standard lakehouse layout for two-predicate workloads (Delta/
    Iceberg `ZORDER BY`). Values must be pre-bucketed into [0, 2**bits)
    (rank, hash-mod, or quantile bucket)."""
    return zorder_key_n([a, b], bits)


def zorder_key_n(cols: list, bits: int = Z_BITS):
    """K-column Morton interleave: bit i of column j lands at position
    i*k + j, so the composite key cycles one bit from each column per
    level and every file covers a compact k-dimensional box — ~N^(1/k)
    pruning on EVERY clustered column. k*bits must fit a signed long
    (<= 63). The 2-column `zorder_key` is the k=2 instance."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a 63-bit key")
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(one), i * k + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort by the Morton code of (col_a, col_b), so
    every file/row-group covers a compact rectangle of the key space and
    parquet min/max stats prune point/range filters on EITHER column.
    One shuffle (the range exchange); the sort is within partitions."""
    write_zordered_n(df, path, [col_a, col_b], bits, n_files, mode)


def write_zordered_n(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = Z_BITS,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """K-column Z-order write — `write_zordered` for arbitrary column
    count (Delta/Iceberg ZORDER BY c1, ..., ck)."""
    keyed = df.withColumn("__z", zorder_key_n([F.col(c) for c in cols], bits))
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
