"""Every registered query vs its DuckDB oracle (the driver's t2 check,
run locally at sf0.001 for speed; set SPARK_GRAFT_TEST_SF_DIR=/root/
testdata/sf0.01 to replicate the driver exactly)."""

import pytest

from tests.parity import assert_frames_match


def _registry():
    from frinesis_spark import registry

    return registry.queries(), registry.oracle_sql()


QUERIES, ORACLE = _registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # materializes the plan


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, duck, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(ORACLE[name]).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_approx_distinct_within_error_bound(spark, duck, sf_dir):
    """agg_approx_distinct has no hash oracle (HLL implementations
    differ engine-to-engine), but the ESTIMATE is still checkable: each
    HLL++ count at rsd=0.01 must sit within a conservative relative
    tolerance of DuckDB's exact COUNT(DISTINCT). Catches a broken
    sketch (off-by-10x, wrong column) that a rows-only check misses."""
    est = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = duck.execute(
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS parts,
               COUNT(DISTINCT l_orderkey) AS orders
        FROM lineitem GROUP BY l_returnflag
        """
    ).fetchall()
    assert len(exact) == len(est)
    for flag, parts, orders in exact:
        for got, want in [
            (est[flag]["approx_parts"], parts),
            (est[flag]["approx_orders"], orders),
        ]:
            # rsd=0.01 → ~1% standard error; 5 sigma + small-count slack
            assert abs(got - want) <= max(0.05 * want, 10), (
                f"{flag}: estimate {got} vs exact {want}"
            )
