"""SQL entry-point parity: identical ANSI SQL text executed by BOTH
engines (spark.sql over registered temp views vs DuckDB) must agree.

This is the §3.1 CLI-query path (the reference hands SQL strings to
SQLite; our engine hands them to Spark SQL) — proving the catalog
registration works and that the engine speaks the shared ANSI subset.
"""

from __future__ import annotations

import pytest

from conftest import assert_df_matches_oracle
from data_ingestion_system_spark.tables import register_views

# statements valid in BOTH Spark SQL and DuckDB, verbatim
DUAL_ENGINE_SQL = {
    "per_nation_stats": """
SELECT n_name,
  COUNT(*) AS order_count,
  ROUND(AVG(o_totalprice) * 100.0) / 100.0 AS avg_price,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    "daily": """
SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-06-01'
GROUP BY CAST(o_orderdate AS DATE)
ORDER BY d
""",
    "topk": """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC
LIMIT 12
""",
    "window_rank": """
SELECT lang, doc_id, rn FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) t
WHERE rn <= 3
ORDER BY lang, rn
""",
    "exists_semi": """
SELECT p_brand, COUNT(*) AS n
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
GROUP BY p_brand
ORDER BY p_brand
""",
}


@pytest.mark.parametrize("name", sorted(DUAL_ENGINE_SQL))
def test_same_sql_both_engines(spark, duck, sf_dir, name):
    register_views(spark, sf_dir)
    sql = DUAL_ENGINE_SQL[name]
    assert_df_matches_oracle(spark.sql(sql), duck, sql)
