"""File sources & sinks — SURVEY.md §2.1 (S4–S7, S11–S13).

The reference writes JSON arrays / CSV with in-flight dedup
(reference: src/storage/file_storage.py:46-163) and exports training
data as JSONL × {train,val,test} with a metadata sidecar
(src/labeling/exporter.py:89-108, :195-268). Spark-first:

- JSONL *is* Spark's native json format (one object per line)
- dedup-before-write is `dropDuplicates` on the key — no session id-set
- the metadata sidecar is a small aggregate collected once (the only
  intentional driver-side materialization in the engine)
- multi-format save reuses one cached plan for both writes
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def save_json(df: DataFrame, path: str, key_col: str | None = None, mode: str = "overwrite") -> None:
    """JSONL sink with optional key dedup (file_storage.py:46-81 merges +
    dedups on append; here dedup is explicit and the write is atomic-ish
    per partition)."""
    if key_col:
        df = df.dropDuplicates([key_col])
    df.write.mode(mode).json(path)


def save_csv(df: DataFrame, path: str, key_col: str | None = None, mode: str = "overwrite") -> None:
    """CSV sink with header + dedup (file_storage.py:83-124)."""
    if key_col:
        df = df.dropDuplicates([key_col])
    df.write.mode(mode).option("header", True).csv(path)


def save_multi_format(df: DataFrame, base_path: str, formats: tuple[str, ...] = ("json", "csv"), key_col: str | None = None) -> None:
    """Multi-format save (file_storage.py:126-163): cache once, write N."""
    if key_col:
        df = df.dropDuplicates([key_col])
    df = df.cache()
    try:
        for fmt in formats:
            out = os.path.join(base_path, fmt)
            if fmt == "json":
                df.write.mode("overwrite").json(out)
            elif fmt == "csv":
                df.write.mode("overwrite").option("header", True).csv(out)
            elif fmt == "parquet":
                df.write.mode("overwrite").parquet(out)
            elif fmt == "orc":
                # ORC is in-box in Spark (no extra jar, unlike avro) and
                # the interchange format Hive/Trino deployments ask for
                df.write.mode("overwrite").orc(out)
            else:
                raise ValueError(f"unsupported format {fmt!r}")
    finally:
        df.unpersist()


def load_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-explicit JSONL source (file_storage.py:194-207 /
    db_manager.py:232-260 load path). Never inferSchema (SURVEY §1.3)."""
    return spark.read.schema(schema).json(path)


CORRUPT_COL = "_corrupt_record"


def load_json_with_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Schema-explicit JSONL source that ROUTES malformed lines instead
    of dropping (DROPMALFORMED) or failing the job (FAILFAST): PERMISSIVE
    mode parks each unparseable line in `_corrupt_record`, and the split
    returns (valid, quarantined-raw-lines). The source-side tier of the
    validation stack — syntax here, semantics in
    `operators/integrity.validate` — mirroring the reference's load-path
    error handling (file_storage.py:199-207 catches JSONDecodeError and
    keeps going; here the bad line is preserved for repair, not logged
    away).

    Spark caveat handled: the JSON reader won't SELECT only the corrupt
    column from its internal row, so the split caches the parsed frame
    before filtering (the documented `spark.read.json` corrupt-record
    limitation). The cache is RELEASED before returning: both children
    are pinned by an eager localCheckpoint, so the shared parent does
    not leak a session-lifetime InMemoryRelation per call (quarantine
    loads are repair-scale inputs by contract)."""
    full = StructType(schema.fields).add(CORRUPT_COL, "string")
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    try:
        bad = F.col(CORRUPT_COL).isNotNull()
        valid = parsed.filter(~bad).drop(CORRUPT_COL).localCheckpoint(eager=True)
        quarantined = (
            parsed.filter(bad)
            .select(F.col(CORRUPT_COL).alias("raw_line"))
            .localCheckpoint(eager=True)
        )
    finally:
        parsed.unpersist()
    return valid, quarantined


def export_training_data(
    df: DataFrame,
    out_dir: str,
    split_col: str = "split",
    label_col: str = "label",
    fmt: str = "json",
) -> dict:
    """Training-data export (exporter.py:89-108,195-268): one directory
    per split value + `export_metadata.json` sidecar with per-split label
    distributions. Returns the metadata dict.

    The split column comes from operators.sampling.assign_split
    (deterministic stratified split). Partitioned write = one pass.

    Re-export hygiene: split directories from a PREVIOUS export whose
    split value is absent from this df are removed (a loader globbing
    out_dir must never train on orphaned splits the sidecar doesn't
    describe), and the metadata sidecar lands via tmp + os.replace so a
    crash mid-write can't leave a torn file that looks committed (the
    jsonl_sink marker discipline)."""
    df = df.cache()
    try:
        splits = [r[0] for r in df.select(split_col).distinct().collect()]
        os.makedirs(out_dir, exist_ok=True)
        for entry in os.listdir(out_dir):
            full = os.path.join(out_dir, entry)
            if os.path.isdir(full) and entry not in splits:
                shutil.rmtree(full)
        for s in sorted(splits):
            part = df.filter(F.col(split_col) == s).drop(split_col)
            out = os.path.join(out_dir, s)
            if fmt == "json":
                part.write.mode("overwrite").json(out)
            else:
                part.write.mode("overwrite").option("header", True).csv(out)
        dist_rows = (
            df.groupBy(split_col, label_col).count().orderBy(split_col, label_col).collect()
        )
        metadata: dict = {"splits": {}, "total": 0}
        for r in dist_rows:
            split_meta = metadata["splits"].setdefault(r[split_col], {"count": 0, "labels": {}})
            split_meta["labels"][str(r[label_col])] = r["count"]
            split_meta["count"] += r["count"]
            metadata["total"] += r["count"]
        sidecar = os.path.join(out_dir, "export_metadata.json")
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            json.dump(metadata, f, indent=2, sort_keys=True)
        os.replace(tmp, sidecar)
        return metadata
    finally:
        df.unpersist()
