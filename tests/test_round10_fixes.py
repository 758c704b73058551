"""Round-10 fix pins.

Currently: the fuzzy-dedup hot-block cap (r9 verdict item 3) — a
planted shared-prefix corpus exercises both cap regimes (refine by the
next 4 chars; drop refined blocks still over the cap) while the normal
fixture stays bit-identical (covered by test_oracle_parity, since the
fixtures' largest block is 7 rows vs the 512 cap).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.parity import assert_frames_match

# Blocking geometry mirrored from dedup.py — the test breaks loudly if
# the constants drift apart from the corpus construction below.
_CAP = 512
_PFX_LEN = 8
_SALT = 4


def _hot_corpus():
    """Three families in one corpus:

    * normal: a 2-doc block far under the cap (pairs unchanged);
    * refined: 520 docs sharing the 8-char prefix + length bucket
      (over the cap) but split by chars 9-12 into 40 subgroups of 13 —
      the refinement regime keeps within-subgroup near-dup pairs and
      (by contract) blocks cross-subgroup ones apart;
    * dropped: 520 docs sharing prefix AND chars 9-12 AND length
      bucket — the refined block is still over the cap and is dropped
      from pairing entirely (the boilerplate-prefix pathological case).
    """
    docs = [
        (1, "NORMBLK " + "a" * 50),
        (2, "NORMBLK " + "a" * 25 + "b" * 25),  # distance 25 → IN
    ]
    # refined family: "BOILERPL" + 4-char subgroup salt + fixed filler
    # + 4-char per-doc tail (same length → same ÷10 bucket)
    for i in range(520):
        sub = i % 40
        docs.append((1000 + i, f"BOILERPL{sub:04d}" + "x" * 40 + f"{i:04d}"))
    # dropped family: identical first 12 chars, same length
    for i in range(520):
        docs.append((2000 + i, "HTMLBOILDOCT" + "y" * 40 + f"{i:04d}"))
    return docs


@pytest.fixture()
def hot_docs(spark, monkeypatch):
    import frinesis_spark.operators.dedup as dedup_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(_hot_corpus(), "doc_id long, text string")
    real_table = catalog.table
    monkeypatch.setattr(
        dedup_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    return docs


def test_fuzzy_hot_block_cap_differential(spark, hot_docs):
    from frinesis_spark.operators import dedup

    assert dedup._BLOCK_CAP == _CAP and dedup._PREFIX == _PFX_LEN
    assert dedup._SALT_CHARS == _SALT

    spark_pdf = dedup.QUERIES["dedup_fuzzy_editdist"](
        spark, "crafted://hotblock"
    ).toPandas()
    duck = duckdb.connect()
    duck.register("documents", hot_docs.toPandas())
    duck_pdf = duck.sql(dedup.ORACLE["dedup_fuzzy_editdist"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "dedup_fuzzy_editdist")

    pairs = {
        tuple(r) for r in spark_pdf[["doc_a", "doc_b"]].itertuples(index=False)
    }
    # normal regime untouched by the cap
    assert (1, 2) in pairs
    # refinement regime: within-subgroup near-dups survive (docs 1000
    # and 1040 share subgroup 0, differ only in the 4-char tail)...
    assert (1000, 1040) in pairs
    # ...and every surviving hot-family pair respects the refined
    # blocking (same chars 9-12), i.e. same subgroup mod 40
    hot = [(a, b) for a, b in pairs if a >= 1000 and b < 2000]
    assert hot and all((a - 1000) % 40 == (b - 1000) % 40 for a, b in hot)
    # dropped regime: the still-over-cap refined block contributes
    # ZERO pairs — bounded work, by contract, however skewed the corpus
    assert not [p for p in pairs if p[0] >= 2000 or p[1] >= 2000]


def test_fuzzy_hot_block_bound_is_quadratic_proof(spark, hot_docs):
    """The cap's work bound: no surviving block exceeds _BLOCK_CAP
    rows, so per-block pair work is ≤ cap² regardless of corpus skew.
    Asserted on the planted corpus by recomputing the surviving block
    sizes the query's own contract defines."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frinesis_spark.operators import dedup

    d = hot_docs.select(
        "doc_id",
        F.substring("text", 1, dedup._PREFIX).alias("pfx"),
        F.expr(f"CAST(length(text) DIV {dedup._LEN_BUCKET} AS INT)").alias(
            "lb"
        ),
        "text",
    )
    d = d.withColumn(
        "n1", F.count(F.lit(1)).over(Window.partitionBy("pfx", "lb"))
    )
    d = d.withColumn(
        "pfx2",
        F.when(
            F.col("n1") > dedup._BLOCK_CAP,
            F.substring("text", dedup._PREFIX + 1, dedup._SALT_CHARS),
        ).otherwise(F.lit("")),
    )
    surviving = (
        d.groupBy("pfx", "lb", "pfx2")
        .count()
        .where(F.col("count") <= dedup._BLOCK_CAP)
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert surviving <= dedup._BLOCK_CAP


# --- sf1 findings: decimal→double cast divergence + quantile ulp ---------


def test_decimal_double_cast_diverges_above_2_53_units():
    """Pin the r10 sf1 finding itself: DuckDB casts DECIMAL→DOUBLE via
    int128→double THEN ÷10^scale (two roundings) while Spark/Python
    round the exact decimal once — they split by 1 ulp once the
    scaled value exceeds 2^53. If DuckDB ever becomes correctly
    rounded, this probe fails and dsum's scaled-int64 detour can be
    retired."""
    import decimal

    v = "28107398295.191474"  # the sf1 sum_charge that flipped the hash
    d = duckdb.sql(f"SELECT CAST(CAST('{v}' AS DECIMAL(28,6)) AS DOUBLE)").fetchone()[0]
    py = float(decimal.Decimal(v))
    assert d != py  # the divergence dsum now routes around
    # the shared deterministic path: exact int64 units → one int→double
    # conversion → one division; equals DuckDB's two-step here and is
    # what BOTH engines now compute
    units = 28107398295191474
    assert d == float(units) / 1e6


def test_dsum_scaled_path_matches_oracle_above_2_53(spark):
    """dsum and oracle_dsum agree bitwise on a sum ABOVE 2^53 scale-6
    units — the regime the old decimal→double cast diverged in."""
    import duckdb as ddb

    from frinesis_spark.functions.numeric import dsum, oracle_dsum

    # 4M rows of 7044.999999 ≈ 2.8e10 (the sf1 magnitude) — built
    # arithmetically, not by shipping 4M rows through the JVM
    n, val = 4_000_000, 7044.999999
    sdf = (
        spark.range(n)
        .selectExpr(f"CAST({val} AS DOUBLE) AS v")
        .agg(dsum("v").alias("s"))
        .toPandas()
    )
    dd = ddb.sql(
        f"SELECT {oracle_dsum('v')} AS s "
        f"FROM (SELECT {val}::DOUBLE AS v FROM range({n}))"
    ).df()
    assert float(sdf.s[0]) == float(dd.s[0])
    assert abs(float(sdf.s[0])) > 2**53 / 1e6  # genuinely in the regime


def test_rolling_quantile_equal_bounds_ulp(spark, monkeypatch):
    """The 36-rows-in-a-million sf1 case: a trailing frame whose p90
    interpolation bounds are EQUAL duplicates — DuckDB's
    l·(1-f)+u·f puts ulp junk on an exact value (99.51 →
    99.51000000000002), Spark's l+(u-l)·f does not. ROUND(6) on both
    sides folds it; this pins the crafted frame end-to-end."""
    import datetime

    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    # one series, 10 rows; frame = trailing 50 ⇒ whole prefix. Values
    # place TWO copies of 99.51 at the p90 interpolation bounds.
    base = datetime.datetime(2024, 1, 1)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 99.51, 99.51]
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        ts_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    spark_pdf = ts_mod.QUERIES["window_rolling_quantile"](
        spark, "crafted://quantile"
    ).toPandas()
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    duck_pdf = duck.sql(ts_mod.ORACLE["window_rolling_quantile"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "window_rolling_quantile")
    last = spark_pdf.sort_values("event_id").iloc[-1]
    assert last["p90_trailing"] == 99.51  # exact, no ulp junk


def test_register_views_invalidates_on_inprocess_rewrite(
    spark, tmp_path, monkeypatch
):
    """r10 review wave: a fixture regenerated IN-PROCESS at the same
    path must re-register its view (stat-signature invalidation — the
    same hazard events_ts_unit guards one layer down); an untouched
    table stays cached, and force=True on a SUBSET leaves the other
    tables' registration records intact."""
    import shutil
    import time as _time

    from frinesis_spark import catalog

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for t in ("region", "nation"):
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")

    calls = []
    real_table = catalog.table

    def counting_table(sp, dd, name):
        calls.append(name)
        return real_table(sp, dd, name)

    monkeypatch.setattr(catalog, "table", counting_table)
    monkeypatch.setattr(catalog, "_VIEWS_CACHE", {})

    tables = ("region", "nation")
    catalog.register_views(spark, d, tables=tables)
    assert calls == ["region", "nation"]
    catalog.register_views(spark, d, tables=tables)
    assert calls == ["region", "nation"]  # cache hit

    # rewrite ONE table in-process (new mtime/size)
    _time.sleep(0.01)
    shutil.copy(f"{src}/part.parquet", f"{d}/region.parquet")
    catalog.register_views(spark, d, tables=tables)
    assert calls == ["region", "nation", "region"]  # only the rewrite

    # force on a subset re-registers that subset only
    catalog.register_views(spark, d, tables=("nation",), force=True)
    assert calls == ["region", "nation", "region", "nation"]
    catalog.register_views(spark, d, tables=tables)
    assert calls == ["region", "nation", "region", "nation"]  # all cached
