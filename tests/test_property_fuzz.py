"""Property-based differential fuzzing (hypothesis).

The reference's query surface is a *parameterized family* (get_reviews'
dynamic filters, db_manager.py:331-394), so testing one parameter
combination is weak evidence. Here hypothesis drives the same builder
through random parameter space and every plan is compared against a
freshly-generated DuckDB statement — the engine's strongest correctness
property: ∀ params, Spark(params) ≡ SQL(params).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import TEST_SF_DIR, assert_df_matches_oracle
from data_ingestion_system_spark.operators.filters import get_lineitems
from data_ingestion_system_spark.tables import load_table

COLS = "l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount, l_extendedprice, l_shipdate"


def oracle_for(returnflag, min_q, max_q, has_discount, min_price, limit, offset):
    conds = []
    if returnflag is not None:
        conds.append(f"l_returnflag = '{returnflag}'")
    if min_q is not None:
        conds.append(f"l_quantity >= {min_q}")
    if max_q is not None:
        conds.append(f"l_quantity <= {max_q}")
    if has_discount is True:
        conds.append("l_discount <> 0")
    elif has_discount is False:
        conds.append("l_discount = 0")
    if min_price is not None:
        conds.append(f"l_extendedprice * (1 - l_discount) >= {min_price}")
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    lim = f"LIMIT {limit}" if limit is not None else ""
    off = f"OFFSET {offset}" if offset else ""
    return f"""
SELECT {COLS} FROM lineitem {where}
ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
{lim} {off}
"""


@pytest.fixture(scope="module")
def fuzz_env(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{TEST_SF_DIR}/lineitem.parquet')"
    )
    li = load_table(spark, TEST_SF_DIR, "lineitem").select(*[c.strip() for c in COLS.split(",")])
    li = li.cache()
    li.count()
    return con, li


GROUP_KEYS = {
    "l_returnflag": "l_returnflag",
    "l_linenumber": "l_linenumber",
    "qty_bucket": "CASE WHEN l_quantity <= 25 THEN 'lo' ELSE 'hi' END",
}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    key=st.sampled_from(sorted(GROUP_KEYS)),
    min_q=st.one_of(st.none(), st.integers(1, 40)),
    want_avg=st.booleans(),
    want_minmax=st.booleans(),
    cond_flag=st.sampled_from(["R", "A", "N"]),
)
def test_grouped_agg_family(fuzz_env, key, min_q, want_avg, want_minmax, cond_flag):
    """Random grouped-aggregation plans (the A1/A12 family) vs generated SQL."""
    from pyspark.sql import functions as F

    from data_ingestion_system_spark.functions.scalar import round_port

    con, li = fuzz_env
    df = li
    conds = []
    if min_q is not None:
        df = df.filter(F.col("l_quantity") >= min_q)
        conds.append(f"l_quantity >= {min_q}")
    key_sql = GROUP_KEYS[key]
    aggs = [F.count("*").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == cond_flag, 1).otherwise(0)).alias("n_flag")]
    sel = [f"{key_sql} AS grp", "COUNT(*) AS n",
           f"CAST(SUM(CASE WHEN l_returnflag = '{cond_flag}' THEN 1 ELSE 0 END) AS BIGINT) AS n_flag"]
    if want_avg:
        aggs.append(round_port(F.avg("l_extendedprice"), 4).alias("avg_price"))
        sel.append("ROUND(AVG(l_extendedprice) * 10000.0) / 10000.0 AS avg_price")
    if want_minmax:
        aggs.append(F.min("l_shipdate").alias("min_ship"))
        aggs.append(F.max("l_shipdate").alias("max_ship"))
        sel.append("MIN(l_shipdate) AS min_ship")
        sel.append("MAX(l_shipdate) AS max_ship")
    grp_col = (
        F.col(key)
        if key != "qty_bucket"
        else F.when(F.col("l_quantity") <= 25, "lo").otherwise("hi")
    )
    df = df.groupBy(grp_col.alias("grp")).agg(*aggs).orderBy("grp")
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    oracle = f"SELECT {', '.join(sel)} FROM lineitem {where} GROUP BY {key_sql} ORDER BY grp"
    assert_df_matches_oracle(df, con, oracle)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    join_type=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    qty_cut=st.integers(1, 50),
    price_cut=st.sampled_from([0, 30000, 80000]),
)
def test_join_family(fuzz_env, join_type, qty_cut, price_cut):
    """Random join plans (J1/J5/J6 family): lineitem ⋈ a filtered slice of
    itself on l_orderkey, across join types, vs generated SQL."""
    from pyspark.sql import functions as F

    con, li = fuzz_env
    right = li.filter(
        (F.col("l_quantity") >= qty_cut) & (F.col("l_extendedprice") >= price_cut)
    ).select("l_orderkey").distinct()
    left = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    right_sql = (
        f"SELECT DISTINCT l_orderkey FROM lineitem"
        f" WHERE l_quantity >= {qty_cut} AND l_extendedprice >= {price_cut}"
    )
    if join_type in ("left_semi", "left_anti"):
        df = left.join(right, "l_orderkey", join_type).groupBy("l_returnflag").count()
        op = "IN" if join_type == "left_semi" else "NOT IN"
        oracle = f"""
SELECT l_returnflag, COUNT(*) AS count FROM lineitem
WHERE l_orderkey {op} ({right_sql})
GROUP BY l_returnflag ORDER BY l_returnflag
"""
    else:
        df = left.join(right, "l_orderkey", join_type).groupBy("l_returnflag").agg(
            F.count("*").alias("count")
        )
        jt = "JOIN" if join_type == "inner" else "LEFT JOIN"
        oracle = f"""
SELECT l_returnflag, COUNT(*) AS count
FROM lineitem l {jt} ({right_sql}) r ON l.l_orderkey = r.l_orderkey
GROUP BY l_returnflag ORDER BY l_returnflag
"""
    assert_df_matches_oracle(df.orderBy("l_returnflag"), con, oracle)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    partition=st.sampled_from(["l_returnflag", "l_linenumber"]),
    order_col=st.sampled_from(["l_extendedprice", "l_quantity", "l_shipdate"]),
    desc=st.booleans(),
    k=st.integers(1, 4),
    fn=st.sampled_from(["row_number", "rank", "dense_rank"]),
)
def test_window_rank_family(fuzz_env, partition, order_col, desc, k, fn):
    """Random ranking-window plans (the W4/W7 family) vs generated SQL.
    Ordering always carries (l_orderkey, l_linenumber) tiebreakers so
    rank functions are deterministic (SURVEY §4.2.4)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    con, li = fuzz_env
    direction = "DESC" if desc else "ASC"
    order_sql = f"{order_col} {direction}, l_orderkey ASC, l_linenumber ASC"
    spark_order = [
        F.col(order_col).desc() if desc else F.col(order_col).asc(),
        F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    ]
    w = Window.partitionBy(partition).orderBy(*spark_order)
    fcol = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[fn]()
    df = (
        li.select(
            F.col(partition).alias("grp"), "l_orderkey", "l_linenumber",
            fcol.over(w).alias("r"),
        )
        .filter(F.col("r") <= k)
        .orderBy("grp", "r", "l_orderkey", "l_linenumber")
    )
    oracle = f"""
SELECT grp, l_orderkey, l_linenumber, r FROM (
  SELECT {partition} AS grp, l_orderkey, l_linenumber,
         CAST({fn}() OVER (PARTITION BY {partition} ORDER BY {order_sql}) AS INTEGER) AS r
  FROM lineitem
) t WHERE r <= {k}
ORDER BY grp, r, l_orderkey, l_linenumber
"""
    assert_df_matches_oracle(df, con, oracle)


@settings(
    max_examples=18,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    partition=st.sampled_from(["l_returnflag", "l_linenumber"]),
    order_col=st.sampled_from(["l_shipdate", "l_quantity", "l_extendedprice"]),
    width=st.integers(1, 8),
    closed=st.booleans(),
    fn=st.sampled_from(["sum", "avg", "min", "max", "count"]),
)
def test_window_frame_family(fuzz_env, partition, order_col, width, closed, fn):
    """Random ROWS-frame aggregate windows (the W6/W8 running/trailing
    family): trailing frames of random width, open (excluding current
    row, the history-z-score shape) or closed (running-total shape),
    over a total order so frame contents are engine-independent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_ingestion_system_spark.functions.scalar import round_port

    con, li = fuzz_env
    hi = 0 if closed else -1
    frame_sql = f"ROWS BETWEEN {width} PRECEDING AND {'CURRENT ROW' if closed else '1 PRECEDING'}"
    order_sql = f"{order_col} ASC, l_orderkey ASC, l_linenumber ASC"
    w = (
        Window.partitionBy(partition)
        .orderBy(F.asc(order_col), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .rowsBetween(-width, hi)
    )
    fcol = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
    }[fn](F.col("l_quantity"))
    agg_sql = f"{fn}(l_quantity)"
    df = li.select(
        F.col(partition).alias("grp"),
        "l_orderkey",
        "l_linenumber",
        round_port(fcol.over(w).cast("double"), 6).alias("v"),
    ).orderBy("grp", "l_orderkey", "l_linenumber")
    oracle = f"""
SELECT {partition} AS grp, l_orderkey, l_linenumber,
       ROUND(CAST({agg_sql} OVER (PARTITION BY {partition} ORDER BY {order_sql}
             {frame_sql}) AS DOUBLE) * 1000000.0) / 1000000.0 AS v
FROM lineitem
ORDER BY grp, l_orderkey, l_linenumber
"""
    assert_df_matches_oracle(df, con, oracle)


@settings(
    max_examples=18,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(
        ["union_all", "union", "except", "except_all", "intersect", "intersect_all"]
    ),
    flag_b=st.sampled_from(["R", "A", "N"]),
    qty_a=st.integers(1, 40),
    qty_b=st.integers(1, 40),
)
def test_setops_family(fuzz_env, op, flag_b, qty_a, qty_b):
    """Random set-operation plans (the O3-O6 family) over two filtered
    low-cardinality projections (duplicates guaranteed, so ALL vs
    DISTINCT semantics actually differ) vs generated SQL. The oracle
    compare is a sorted-multiset hash, so duplicate multiplicity is part
    of the property."""
    con, li = fuzz_env
    proj = ["l_returnflag", "l_linenumber"]
    a = li.filter(li.l_quantity >= qty_a).select(*proj)
    b = li.filter((li.l_quantity <= qty_b) & (li.l_returnflag == flag_b)).select(*proj)
    sql_a = f"SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_quantity >= {qty_a}"
    sql_b = (
        "SELECT l_returnflag, l_linenumber FROM lineitem"
        f" WHERE l_quantity <= {qty_b} AND l_returnflag = '{flag_b}'"
    )
    spark_ops = {
        "union_all": lambda: a.union(b),
        "union": lambda: a.union(b).distinct(),
        "except": lambda: a.subtract(b),
        "except_all": lambda: a.exceptAll(b),
        "intersect": lambda: a.intersect(b),
        "intersect_all": lambda: a.intersectAll(b),
    }
    sql_ops = {
        "union_all": "UNION ALL",
        "union": "UNION",
        "except": "EXCEPT",
        "except_all": "EXCEPT ALL",
        "intersect": "INTERSECT",
        "intersect_all": "INTERSECT ALL",
    }
    df = spark_ops[op]().orderBy(*proj)
    oracle = f"({sql_a}) {sql_ops[op]} ({sql_b}) ORDER BY l_returnflag, l_linenumber"
    assert_df_matches_oracle(df, con, oracle)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    returnflag=st.sampled_from([None, "R", "A", "N"]),
    min_q=st.one_of(st.none(), st.integers(1, 30)),
    max_q=st.one_of(st.none(), st.integers(20, 50)),
    has_discount=st.sampled_from([None, True, False]),
    min_price=st.one_of(st.none(), st.sampled_from([1000, 20000, 60000])),
    limit=st.one_of(st.none(), st.sampled_from([7, 50])),
    offset=st.sampled_from([0, 13]),
)
def test_dynamic_filter_family(fuzz_env, returnflag, min_q, max_q, has_discount, min_price, limit, offset):
    con, li = fuzz_env
    # Spark offset() without limit needs limit anyway for driver compare;
    # builder applies offset before limit like SQL LIMIT/OFFSET
    df = get_lineitems(
        li,
        returnflag=returnflag,
        min_quantity=min_q,
        max_quantity=max_q,
        has_discount=has_discount,
        min_price=min_price,
        limit=limit,
        offset=offset,
    )
    oracle = oracle_for(returnflag, min_q, max_q, has_discount, min_price, limit, offset)
    assert_df_matches_oracle(df, con, oracle)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    enum_on=st.booleans(),
    allowed=st.sets(st.sampled_from(["A", "N", "R"]), min_size=1, max_size=3),
    lo=st.one_of(st.none(), st.integers(1, 30)),
    hi=st.one_of(st.none(), st.integers(10, 50)),
    null_qty=st.booleans(),
)
def test_validation_split_family(fuzz_env, enum_on, allowed, lo, hi, null_qty):
    """Random CHECK-rule suites through validate() vs generated SQL —
    ∀ rules, the valid-side aggregate equals the SQL WHERE with SQL
    CHECK NULL semantics (NULL predicates pass)."""
    from pyspark.sql import functions as F

    from data_ingestion_system_spark.operators.integrity import (
        Rule,
        enum_check,
        range_check,
        validate,
    )

    con, li = fuzz_env
    src = li
    sql_conds = []
    rules: list[Rule] = []
    qty = "l_quantity"
    if null_qty:
        # inject NULLs so the CHECK NULL-pass semantics are exercised
        src = src.withColumn(
            qty, F.when(F.col("l_orderkey") % 7 == 0, None).otherwise(F.col(qty))
        )
        qty_sql = "CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END"
    else:
        qty_sql = "l_quantity"
    if enum_on:
        vals = sorted(allowed)
        rules.append(enum_check("l_returnflag", vals))
        in_list = ", ".join(f"'{v}'" for v in vals)
        sql_conds.append(f"(l_returnflag IN ({in_list}) OR l_returnflag IS NULL)")
    if lo is not None and hi is not None and lo <= hi:
        rules.append(range_check(qty, lo, hi))
        sql_conds.append(f"(({qty_sql}) BETWEEN {lo} AND {hi} OR ({qty_sql}) IS NULL)")
    if not rules:
        rules.append(enum_check("l_returnflag", ["A", "N", "R"]))
        sql_conds.append("(l_returnflag IN ('A', 'N', 'R') OR l_returnflag IS NULL)")

    valid, quar = validate(src, rules)
    got = valid.agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.sum("l_orderkey").alias("key_sum"),
    )
    where = " AND ".join(sql_conds)
    oracle = f"""
SELECT COUNT(*) AS n_valid, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
FROM lineitem WHERE {where}
"""
    assert_df_matches_oracle(got, con, oracle)
    # conservation: every row lands on exactly one side
    assert valid.count() + quar.count() == src.count()
