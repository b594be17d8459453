"""Bucketed-layout joins (sources/bucketing.py): the shuffle must
disappear from the plan, and results must match the plain join.

The contrast pair is the point: the same sort-merge join compiled from
plain parquet reads carries an Exchange on each side; compiled from two
tables bucketed on the join key with equal bucket counts it carries
none. At 100 TB that difference is the whole cost of the query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.plans.inspect import simple_plan
from data_ingestion_system_spark.sources.bucketing import read_bucketed, write_bucketed
from data_ingestion_system_spark.tables import load_table

N_BUCKETS = 4
T_LI = "t_bucketing_lineitem"
T_ORD = "t_bucketing_orders"


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, T_LI, ["l_orderkey"], N_BUCKETS, sort_cols=["l_orderkey"])
    write_bucketed(orders, T_ORD, ["o_orderkey"], N_BUCKETS, sort_cols=["o_orderkey"])
    yield li, orders
    spark.sql(f"DROP TABLE IF EXISTS {T_LI}")
    spark.sql(f"DROP TABLE IF EXISTS {T_ORD}")


def _merge_join(left, right):
    return left.hint("merge").join(
        right.hint("merge"), left.l_orderkey == right.o_orderkey
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = _merge_join(read_bucketed(spark, T_LI), read_bucketed(spark, T_ORD))
    plan = simple_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed co-located join must not shuffle"


def test_plain_join_shuffles_both_sides(spark, bucketed_tables):
    li, orders = bucketed_tables
    plan = simple_plan(_merge_join(li, orders))
    assert plan.count("Exchange hashpartitioning") >= 2


def test_one_file_per_bucket(spark, bucketed_tables):
    files = spark.sql(f"SHOW TABLE EXTENDED LIKE '{T_LI}'")
    # count data files via the input_file_name of the scan instead of
    # parsing catalog output: exactly one parquet file per bucket
    n_files = (
        read_bucketed(spark, T_LI)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert n_files == N_BUCKETS, files.first()


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    li, orders = bucketed_tables
    bucketed = _merge_join(
        read_bucketed(spark, T_LI), read_bucketed(spark, T_ORD)
    ).groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    plain = _merge_join(li, orders).groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    a = sorted(map(tuple, bucketed.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b
