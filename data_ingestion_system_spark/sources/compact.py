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
place. This is an OFFLINE maintenance operation: Spark readers are
path-based, not fd-based — a query planned against the old generation
re-opens files by NAME, so a concurrent scan can hit
FileNotFoundException once the old part files are gone. Run it in a
maintenance window (Delta/Iceberg solve the concurrent case with
snapshot manifests, which plain parquet directories don't have). A
crash between the two renames leaves the table parked at
`<path>.compact-bak`; the next compact_parquet (or read attempt via
`recover_compact_swap`) restores it before doing anything else.
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


def recover_compact_swap(path: str) -> bool:
    """Heal a crash between compact_parquet's two renames: if `path` is
    gone but `<path>.compact-bak` exists, the old generation is intact
    under the bak name — restore it. Returns True if a restore ran."""
    bak = path.rstrip("/") + ".compact-bak"
    if not os.path.isdir(path) and os.path.isdir(bak):
        os.rename(bak, path)
        return True
    return False


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
    layout, losing pruning).

    OFFLINE op — see the module docstring for the concurrent-reader and
    crash-window contract."""
    recover_compact_swap(path)
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
