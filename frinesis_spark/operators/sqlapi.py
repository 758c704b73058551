"""SQL-string API surface: the engine accepts ANSI SQL, not only the
DataFrame DSL.

``catalog.register_views`` publishes every table as a temp view; the
queries here run through ``spark.sql`` end-to-end (parser → analyzer →
Catalyst → same physical plans as the DSL — SQL and DataFrame code
compile to identical logical plans, so everything proven about the DSL
surface transfers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from frinesis_spark.catalog import register_views
from frinesis_spark.functions.numeric import oracle_dsum

# TPC-H Q3 shape (shipping-priority revenue) restricted to the columns
# the synthetic schema carries. Decimal-cast sum keeps the aggregate
# order-independent (functions/numeric.py rationale); top-10 carries a
# total-order tie-break.
_Q3 = f"""
    SELECT l_orderkey,
           {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 via the SQL-string entry point.

    Scale notes are the physical plan's, not the API's: the
    customer⋈orders side broadcasts (dim filter first), the
    lineitem⋈orders join shuffles on orderkey, and the top-10 is a
    TakeOrdered — no global sort materialization.
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q3)


QUERIES = {"sql_tpch_q3": q_sql_tpch_q3}

# The oracle is the same ANSI text (CAST syntax identical in DuckDB);
# matching results prove parser+planner agreement on a multi-join
# aggregate, not just expression parity.
ORACLE = {"sql_tpch_q3": _Q3}
