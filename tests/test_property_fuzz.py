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
