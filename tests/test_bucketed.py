"""Physical-plan property of the bucketed layout: when a join/agg
needs distribution on the bucket key and broadcast is off the table
(the 100 TB fact-fact situation), the layout replaces the shuffle —
NO Exchange in the plan.

At test scale Spark rightly prefers a broadcast join (orders is tiny),
which bypasses bucketing — so these tests disable broadcast to force
the plan shape the layout exists for.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from frinesis_spark.sinks.files import bucketed_join_tables


@contextmanager
def _no_broadcast(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    bucketed_join_tables(spark, sf_dir)
    return spark


def test_bucketed_join_has_no_exchange(bucketed, sf_dir):
    spark = bucketed
    with _no_broadcast(spark):
        o = spark.table("orders_bucketed")
        li = spark.table("lineitem_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "o_orderstatus", "l_extendedprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert "Bucketed: true" in plan, plan


def test_bucketed_agg_on_bucket_key_has_no_exchange(bucketed):
    spark = bucketed
    from pyspark.sql import functions as F

    agg = spark.table("orders_bucketed").groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"agg on bucket key still shuffles:\n{plan}"
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_unbucketed(bucketed, sf_dir):
    """Same join result with and without the bucketed layout."""
    spark = bucketed
    from frinesis_spark.catalog import table
    from pyspark.sql import functions as F

    with _no_broadcast(spark):
        via_buckets = (
            spark.table("lineitem_bucketed")
            .join(
                spark.table("orders_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        ).collect()
    plain = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    ).collect()
    assert sorted(map(tuple, via_buckets)) == sorted(map(tuple, plain))


def test_compaction_reduces_file_count(spark, sf_dir):
    """The compactor must actually consolidate layout: 64 fragments in,
    ≤4 parquet data files out, rows preserved exactly (content parity
    vs the oracle is covered by test_oracle_parity; this pins the
    layout effect an aggregate can't see)."""
    import glob
    import os

    from frinesis_spark.catalog import table
    from frinesis_spark.sinks.files import (
        _FRAGMENT_FILES,
        _sink_dir,
        q_sink_compacted_parquet,
    )

    q_sink_compacted_parquet(spark, sf_dir).collect()
    frag = glob.glob(os.path.join(_sink_dir("lineitem_fragmented"), "part-*"))
    comp = glob.glob(os.path.join(_sink_dir("lineitem_compacted"), "part-*"))
    assert len(frag) == _FRAGMENT_FILES
    assert 1 <= len(comp) <= 4
    n = spark.read.parquet(_sink_dir("lineitem_compacted")).count()
    assert n == table(spark, sf_dir, "lineitem").count()
