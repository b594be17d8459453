"""Size-bounded, reproducible training-shard export.

Pretraining loaders consume a corpus as numbered shards of bounded size
(WebDataset / Megatron-style): every shard small enough to stream, the
shard assignment stable across re-runs, and the within-shard order
deterministic so a (shard, offset) checkpoint reproduces the exact
sample stream. The reference's exporter writes one file per split
(src/labeling/exporter.py:195-268); this is the at-scale form of S11.

Spark-first mechanics:
- shard id = md5(doc_id) mod n_shards — content-stable hashing, so
  adding documents later moves nothing that already shipped
- `repartition(n, shard_id)` + `sortWithinPartitions` — one shuffle,
  each output file IS one shard, rows inside sorted by doc_id
- `maxRecordsPerFile` as the hard size backstop: a skewed shard splits
  into numbered parts instead of producing an oversized file
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_id(col, n_shards: int):
    """Content-stable shard assignment: md5 of the key mod n_shards
    (conv(md5-prefix) keeps it pure expression algebra)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_shards),
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    n_shards: int = 8,
    max_records_per_file: int = 100_000,
) -> None:
    """Write `df` as n_shards JSONL shard directories, rows sorted by
    key within each shard."""
    sharded = df.withColumn("shard", shard_id(F.col(key_col), n_shards))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("maxRecordsPerFile", max_records_per_file)
        .json(out_dir)
    )


def read_training_shards(spark: SparkSession, out_dir: str, schema: str) -> DataFrame:
    """Read shards back with the shard id restored from the partition
    directory (schema is the payload schema, without `shard`)."""
    return spark.read.schema(schema + ", shard int").json(out_dir)


def shard_manifest(spark: SparkSession, out_dir: str) -> list[dict]:
    """Driver-side manifest of shard directories and file counts — the
    sidecar a loader uses to plan epoch order. Small by construction
    (one entry per shard)."""
    manifest = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard="):
            continue
        path = os.path.join(out_dir, name)
        files = [f for f in os.listdir(path) if f.endswith(".json")]
        manifest.append(
            {"shard": int(name.split("=", 1)[1]), "n_files": len(files), "path": path}
        )
    return manifest
