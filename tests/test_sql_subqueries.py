"""Plan-shape tests for the correlated-subquery SQL suite.

Value parity vs DuckDB is covered by test_oracle_parity.py; these pin
the *physical* property that makes the queries scale: Catalyst
decorrelates every subquery into a join (left semi / left anti /
join-against-preaggregate), so no plan ever re-executes an inner query
per outer row.
"""

import io
from contextlib import redirect_stdout

import pytest


def _plan(spark, sf_dir, name):
    from frinesis_spark.operators import sqlapi

    df = sqlapi.QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q4")
    assert "LeftSemi" in plan
    # The orders date filter must reach the scan, not sit above the join.
    assert "PushedFilters" in plan


def test_q17_scalar_subquery_becomes_preagg_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q17")
    # The correlated AVG decorrelates to an aggregate on l_partkey
    # joined back to the outer lineitem — two lineitem scans, at least
    # one extra HashAggregate, and no per-row subquery node.
    assert plan.count("Scan parquet") >= 2
    assert "HashAggregate" in plan
    assert "Subquery" not in plan.split("== Physical Plan ==")[1].split("(1)")[0]


def test_q21_double_exists_becomes_semi_plus_anti(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q21")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q22_not_exists_becomes_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q22")
    assert "LeftAnti" in plan


# --- r6 completion shapes (Q2/Q7/Q8/Q11/Q12/Q15/Q16) ---------------------


def _no_per_row_subquery(plan):
    # The first physical node must not be a Subquery re-execution; all
    # subqueries decorrelate to joins/scalar-broadcasts.
    return "Subquery" not in plan.split("== Physical Plan ==")[1].split("(1)")[0]


def test_q2_correlated_min_becomes_preagg_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q2")
    # min-per-partkey is computed ONCE as an aggregate and joined back
    # (lineitem appears at least twice), never re-run per outer row.
    assert plan.count("Scan parquet") >= 2
    assert "HashAggregate" in plan
    assert _no_per_row_subquery(plan)


def test_q11_having_scalar_becomes_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q11")
    # The HAVING threshold is one scalar computed once; the dims
    # broadcast into both copies of the chain.
    assert "BroadcastHashJoin" in plan
    assert _no_per_row_subquery(plan)


def test_q15_max_revenue_scalar_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q15")
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan
    assert _no_per_row_subquery(plan)


def test_q16_not_in_becomes_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_tpch_q16")
    assert "LeftAnti" in plan


def test_tpch_suite_complete_22():
    """The classic 22-query TPC-H suite is fully covered, every query
    with a DuckDB oracle on the identical ANSI text."""
    from frinesis_spark.operators import sqlapi

    expected = {f"sql_tpch_q{i}" for i in range(1, 23)}
    assert expected <= set(sqlapi.QUERIES)
    assert expected <= set(sqlapi.ORACLE)
