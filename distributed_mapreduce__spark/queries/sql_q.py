"""Pure-SQL entry point: the same engine capabilities via ``spark.sql``
over registered views (Catalyst produces the same plans either way;
this query exists to pin the SQL API surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.tables import register_views

# TPC-H Q3 flavor: unshipped-order revenue by order, top 10.
_SQL = """
    SELECT o_orderkey,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
"""


@register("sql_unshipped_revenue", oracle=_SQL)
def sql_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-SQL text identical to the DuckDB oracle — the engine's SQL
    surface runs ANSI queries as-is (decimal casts and deterministic
    ORDER BY keep the LIMIT cross-engine stable)."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_SQL)
