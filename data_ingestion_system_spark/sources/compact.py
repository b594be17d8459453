"""Small-file compaction — the OPTIMIZE half of layout management.

Streaming ingestion (foreachBatch appends, `streaming/ingest.py`) and
fine-grained partitioning both accrete small parquet files; at scale,
file-listing and per-file open costs come to dominate scans long before
data volume does (the classic lakehouse "small files problem" — Delta
`OPTIMIZE` / Iceberg `rewrite_data_files`). This module is the engine's
bin-packing rewrite: read the table, size the output file count from
the measured on-disk bytes, rewrite, swap atomically.

Sibling of `sources/layout.py` (partition/Z-order placement decides
WHERE rows go; compaction decides HOW MANY files hold them) — compose
them by passing `sort_within` to keep row-group min/max pruning through
a compaction.

File sizing: `ceil(total_bytes / target_bytes)` output files via
`repartition(n)` — row-count-balanced, which tracks bytes for
homogeneous rows (the parquet-side guard `maxRecordsPerFile` is left to
session config for pathological skew). The swap is two directory
renames with the replaced generation kept until the new one is in
place — a reader holding the old file list keeps reading the backup
generation's inodes (POSIX) and never observes a half-written table.
Object stores without atomic rename need a manifest commit instead
(the `sources/jsonl_sink.py` marker pattern).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # the standard HDFS-era sweet spot


def parquet_file_stats(path: str) -> dict:
    """Driver-side listing of a (possibly hive-partitioned) parquet dir:
    {n_files, total_bytes, max_bytes, min_bytes}. Local-fs walk — an
    object-store deployment swaps this for catalog/manifest listing."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        sizes.extend(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "max_bytes": max(sizes, default=0),
        "min_bytes": min(sizes, default=0),
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_within: list[str] | None = None,
) -> dict:
    """Rewrite `path` into ceil(total/target) parquet files and swap the
    directory in place. Returns {"before": stats, "after": stats,
    "n_output_files": n}. Row content is unchanged (same rows, new
    file boundaries); pass `sort_within` to (re)establish clustering.

    Operates on a FLAT parquet directory: a hive-partitioned table must
    be compacted per partition directory (partition values read back as
    data columns would otherwise be rewritten into an unpartitioned
    layout, losing pruning)."""
    before = parquet_file_stats(path)
    n = max(1, math.ceil(before["total_bytes"] / target_bytes))
    df: DataFrame = spark.read.parquet(path)
    out = df.repartition(n)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    tmp = path.rstrip("/") + ".compact-tmp"
    bak = path.rstrip("/") + ".compact-bak"
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    # two-rename swap: current generation steps aside intact, the new
    # one takes its name; only after both renames does the old data go
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return {
        "before": before,
        "after": parquet_file_stats(path),
        "n_output_files": n,
    }
