"""Salted aggregation/join must be result-identical to the direct forms."""

from __future__ import annotations

from data_ingestion_system_spark.operators.skew import salted_agg_count, salted_join_skew_side
from data_ingestion_system_spark.tables import load_table


def test_salted_count_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {r.l_suppkey: r["count"] for r in li.groupBy("l_suppkey").count().collect()}
    salted = {r.l_suppkey: r["count"] for r in salted_agg_count(li, "l_suppkey").collect()}
    assert salted == direct


def test_salted_join_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority").toDF(
        "l_orderkey", "o_orderpriority"
    )
    direct = li.join(orders, "l_orderkey").count()
    salted = salted_join_skew_side(li, orders, "l_orderkey").count()
    assert salted == direct
