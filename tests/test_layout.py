"""Partitioned-layout tests: partition pruning must be visible in the
plan (PartitionFilters) — the engine's index-equivalence claim (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.plans.inspect import formatted_plan
from data_ingestion_system_spark.sources.layout import scan, write_partitioned
from data_ingestion_system_spark.tables import load_table


def test_partition_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, ["o_orderstatus"], sort_within=["o_orderdate"])

    df = scan(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    # the equality predicate must land in PartitionFilters (directory
    # pruning), not in PushedFilters (row-group filtering)
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "o_orderstatus" in pf

    expected = orders.filter("o_orderstatus = 'F'").count()
    assert df.count() == expected


def test_partitioned_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["o_orderstatus"])
    back = scan(spark, path)
    assert back.count() == orders.count()
    # partition column survives the roundtrip (hive-style directory col)
    assert set(back.select("o_orderstatus").distinct().toPandas()["o_orderstatus"]) == {
        "F", "O", "P",
    }
