"""Small-file compaction: file-count reduction, content preservation,
clustering pass-through."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.sources.compact import (
    compact_parquet,
    parquet_file_stats,
)


def _fragmented_table(spark, path, n_rows=2000, n_files=40):
    spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(n_files).write.mode("overwrite").parquet(path)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, path)
    before_rows = sorted(r.id for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_bytes=10**9)  # everything fits one file

    assert stats["before"]["n_files"] >= 40
    assert stats["after"]["n_files"] == 1
    assert stats["after"]["total_bytes"] > 0
    # same rows, new boundaries — nothing lost, nothing fabricated
    after = spark.read.parquet(path)
    assert sorted(r.id for r in after.collect()) == before_rows
    assert after.select(F.sum(F.length("payload"))).first()[0] == 2000 * 32


def test_compaction_respects_target_sizing(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _fragmented_table(spark, path)
    total = parquet_file_stats(path)["total_bytes"]
    # ask for ~4 output files worth of target
    stats = compact_parquet(spark, path, target_bytes=max(1, total // 4))
    assert 2 <= stats["after"]["n_files"] <= 8
    assert stats["after"]["n_files"] == stats["n_output_files"]


def test_compaction_keeps_sort_within_clustering(spark, tmp_path):
    path = str(tmp_path / "frag3")
    _fragmented_table(spark, path)
    compact_parquet(spark, path, target_bytes=10**9, sort_within=["id"])
    # one output file, sorted within -> reading back in file order is sorted
    rows = [r.id for r in spark.read.parquet(path).collect()]
    assert rows == sorted(rows)


def test_no_temp_or_backup_dirs_left_behind(spark, tmp_path):
    path = str(tmp_path / "frag4")
    _fragmented_table(spark, path)
    compact_parquet(spark, path, target_bytes=10**9)
    leftovers = [p.name for p in tmp_path.iterdir()]
    assert leftovers == ["frag4"]


def test_crash_between_renames_recovers(spark, tmp_path):
    """A crash between compact's two renames leaves the table parked at
    .compact-bak; the next compact (or recover_compact_swap) restores
    it before doing anything else."""
    import os

    from data_ingestion_system_spark.sources.compact import (
        compact_parquet,
        recover_compact_swap,
    )

    path = str(tmp_path / "t")
    spark.range(100).write.parquet(path)
    # simulate the crash window: first rename done, second never ran
    os.rename(path, path + ".compact-bak")
    assert recover_compact_swap(path) is True
    assert spark.read.parquet(path).count() == 100
    # and compact_parquet self-heals the same state
    os.rename(path, path + ".compact-bak")
    out = compact_parquet(spark, path, target_bytes=1 << 30)
    assert out["after"]["n_files"] >= 1
    assert spark.read.parquet(path).count() == 100
    assert not os.path.isdir(path + ".compact-bak")
