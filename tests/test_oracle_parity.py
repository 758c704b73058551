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
