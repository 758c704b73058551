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
