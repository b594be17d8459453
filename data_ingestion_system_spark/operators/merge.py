"""Keyed MERGE / upsert library — SURVEY.md §2.1 S9–S10, §4.2.2.

The reference's write protocols:
- `INSERT OR IGNORE` for reviews (reference: src/database/db_manager.py:141-230)
  with inserted/skipped counters from cursor.rowcount (:223-224)
- `INSERT ... ON CONFLICT DO UPDATE` for app metadata (db_manager.py:98-139)

On a lakehouse table (Delta/Iceberg) both are literal MERGE statements;
this container has plain parquet, so the library implements the same
semantics with the anti-join/union + atomic-directory-swap protocol and
returns the same counters. The streaming path (streaming.ingest) reuses
`insert_ignore`.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MergeResult:
    inserted: int
    updated: int
    skipped: int


def _swap_write(df: DataFrame, target_dir: str) -> None:
    """Write to a sibling temp dir then atomically swap — the parquet
    stand-in for a transactional table commit."""
    tmp = f"{target_dir}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{target_dir}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def insert_ignore(
    spark: SparkSession, new_rows: DataFrame, target_dir: str, key: str
) -> MergeResult:
    """INSERT OR IGNORE: append rows whose key is absent; collisions skip.
    Equivalent MERGE: WHEN NOT MATCHED THEN INSERT."""
    new_rows = new_rows.dropDuplicates([key])
    fetched = new_rows.count()
    if os.path.exists(target_dir):
        existing = spark.read.parquet(target_dir).select(key)
        to_insert = new_rows.join(existing, key, "left_anti")
        inserted = to_insert.count()
        to_insert.write.mode("append").parquet(target_dir)
    else:
        inserted = fetched
        new_rows.write.mode("overwrite").parquet(target_dir)
    return MergeResult(inserted=inserted, updated=0, skipped=fetched - inserted)


def upsert(
    spark: SparkSession, new_rows: DataFrame, target_dir: str, key: str
) -> MergeResult:
    """ON CONFLICT DO UPDATE: new key → insert, existing key → replace row.
    Equivalent MERGE: WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT."""
    new_rows = new_rows.dropDuplicates([key])
    n_new = new_rows.count()
    if not os.path.exists(target_dir):
        new_rows.write.mode("overwrite").parquet(target_dir)
        return MergeResult(inserted=n_new, updated=0, skipped=0)
    existing = spark.read.parquet(target_dir)
    updated = existing.join(new_rows.select(key), key, "left_semi").count()
    kept = existing.join(new_rows.select(key), key, "left_anti")
    merged = kept.unionByName(new_rows)
    _swap_write(merged, target_dir)
    return MergeResult(inserted=n_new - updated, updated=updated, skipped=0)


@dataclass
class FullMergeResult:
    inserted: int
    updated: int
    deleted: int
    untouched: int


def merge_apply(
    spark: SparkSession,
    source: DataFrame,
    target_dir: str,
    key: str,
    *,
    update_condition=None,
    delete_condition=None,
    insert_condition=None,
) -> FullMergeResult:
    """Full three-clause MERGE onto a parquet target:

        MERGE INTO target USING source ON target.key = source.key
        WHEN MATCHED     [AND delete_condition] THEN DELETE
        WHEN MATCHED     [AND update_condition] THEN UPDATE SET *
        WHEN NOT MATCHED [AND insert_condition] THEN INSERT *

    Clause precedence mirrors the SQL standard (and Delta/Iceberg):
    DELETE is evaluated before UPDATE for matched rows; a matched row
    satisfying neither condition is left untouched. Conditions are
    Column predicates over the SOURCE row (pass None for
    unconditional). The rewrite is two anti/semi joins + a union and
    ONE atomic directory swap — never a per-row loop, and the target
    is read once.

    Counters are computed from the same joined frame that drives the
    rewrite, so they cannot drift from what was written (the T3 audit
    invariant). Source rows duplicated on the key are rejected — MERGE
    semantics are undefined under multi-match (Delta raises; so do we).
    """
    dup = source.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(f"MERGE source has duplicate keys on {key!r}")

    # SQL clause conditions treat NULL as false (a NULL WHEN MATCHED AND
    # <cond> does not fire the clause but DOES cascade to the next one),
    # so each predicate is null-guarded: otherwise ~t_delete & t_update
    # would itself be NULL and silently drop the row from UPDATE.
    def _guarded(cond, default):
        return F.coalesce(cond, F.lit(False)) if cond is not None else F.lit(default)

    t_update = _guarded(update_condition, True)
    t_delete = _guarded(delete_condition, False)
    t_insert = _guarded(insert_condition, True)

    if not os.path.exists(target_dir):
        to_insert = source.filter(t_insert)
        inserted = to_insert.count()
        to_insert.write.mode("overwrite").parquet(target_dir)
        return FullMergeResult(inserted=inserted, updated=0, deleted=0, untouched=0)

    existing = spark.read.parquet(target_dir)
    matched_src = source.join(existing.select(key), key, "left_semi")
    deletes = matched_src.filter(t_delete).select(key)
    updates = matched_src.filter(~t_delete & t_update)
    inserts = source.join(existing.select(key), key, "left_anti").filter(t_insert)

    n_del = deletes.count()
    n_upd = updates.count()
    n_ins = inserts.count()
    n_matched = matched_src.count()

    touched_keys = deletes.unionByName(updates.select(key))
    survivors = existing.join(touched_keys, key, "left_anti")
    merged = survivors.unionByName(updates).unionByName(inserts)
    _swap_write(merged, target_dir)
    return FullMergeResult(
        inserted=n_ins,
        updated=n_upd,
        deleted=n_del,
        untouched=n_matched - n_del - n_upd,
    )
