"""Automated plan-quality invariants over the ENTIRE registry (r11).

PLANS.md records per-query plan audits, but a human regenerates and
reads it; nothing FAILED if a refactor quietly introduced a cartesian
product or a row-at-a-time Python UDF. This suite turns the three
scale-killer anti-patterns into hard test failures, scanning every
registered query's compiled plan (planning only — no execution beyond
the index builds some queries perform at DataFrame-construction time),
plus spot positive invariants (pushed filters, broadcasts) on queries
whose whole point is that plan shape.

Audit result pinned here (r11, all 141 queries at sf0.01):
CartesianProduct: none. BatchEvalPython (row Python UDF): none.
BroadcastNestedLoopJoin: exactly the four declared cross-join scorers.
"""

from __future__ import annotations

import pytest

from frinesis_spark import planfp, registry

# Queries whose plans legitimately contain a nested-loop/cross join:
# the declared dimension-only cross (join_cross_dims) and the exact
# top-k / recall-grader scorers, which score a tiny query side against
# the corpus by design (pruned cross join — see similarity.py).
_BNLJ_ALLOWED = {
    "join_cross_dims",
    "similarity_topk_cosine",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
}


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    """Compiled plan text per registered query, one planning pass."""
    out = {}
    for name, fn in registry.queries().items():
        out[name] = planfp.plan_text(fn(spark, sf_dir))
    return out


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, t in all_plans.items() if "CartesianProduct" in t]
    assert offenders == [], offenders


def test_no_row_python_udf_anywhere(all_plans):
    """BatchEvalPython = row-at-a-time Python UDF (the 10-100x slow
    path). ArrowEvalPython (pandas_udf) and Arrow mapInPandas nodes
    are the sanctioned Python escape hatches and don't match this."""
    offenders = [n for n, t in all_plans.items() if "BatchEvalPython" in t]
    assert offenders == [], offenders


def test_nested_loop_joins_only_where_declared(all_plans):
    offenders = sorted(
        n
        for n, t in all_plans.items()
        if "BroadcastNestedLoopJoin" in t and n not in _BNLJ_ALLOWED
    )
    assert offenders == [], offenders
    # the allowlist must not rot: every allowed name still HAS one
    stale = sorted(
        n
        for n in _BNLJ_ALLOWED
        if n in all_plans and "BroadcastNestedLoopJoin" not in all_plans[n]
    )
    assert stale == [], f"allowlist entries without a BNLJ: {stale}"


def test_filters_reach_the_scan(all_plans):
    """The pushdown guard: these queries exist to prove filters reach
    the parquet scan; an empty PushedFilters list on them means a
    refactor broke pushdown for everyone."""
    for name in ("project_filter", "sql_tpch_q6", "filter_in_between_like"):
        t = all_plans[name]
        import re

        assert re.search(r"PushedFilters: \[[^\]]", t), (
            f"{name}: no pushed filters reach the scan"
        )


def test_dimension_joins_broadcast(all_plans):
    for name in ("join_broadcast", "join_multiway_star"):
        assert "BroadcastHashJoin" in all_plans[name], (
            f"{name}: dimension join is not broadcasting"
        )
