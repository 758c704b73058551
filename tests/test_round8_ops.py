"""Round-8 new operators: invariants and crafted-frame differentials
beyond the driver's fixture-level oracle rows.

- join_bloom_prefilter: the prefilter must be a small SUPERSET of true
  matches (no false negatives ever; bounded false positives).
- text_url_canonicalize: canonical-form invariants + idempotence +
  the dedup-key property (messy variants of one page collapse).
- time_resample_interp: crafted-geometry differential vs the DuckDB
  oracle (point exactly on a grid hour, duplicate timestamps, long
  gaps) + betweenness invariant.
- analytics_ab_test: crafted-frame differential vs a hand-computed
  Welch t.
- agg_mode_frequent: the declared tie-break, proven on a planted tie.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.parity import assert_frames_match


def test_bloom_prefilter_superset_and_pruning(spark, sf_dir):
    from frinesis_spark.operators.relational import bloom_survivor_count

    n_fact, n_surv = bloom_survivor_count(spark, sf_dir)
    # True matches: lineitems of URGENT orders.
    from frinesis_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        "o_orderpriority = '1-URGENT'"
    )
    n_true = li.join(
        o, li["l_orderkey"] == o["o_orderkey"], "left_semi"
    ).count()
    assert n_surv >= n_true, "bloom produced a false negative"
    # k=1, m=2^20 vs ~matching-keys build side: FPR well under 5%.
    assert n_surv - n_true <= max(0.05 * n_fact, 10), (
        f"false positives {n_surv - n_true} of {n_fact}"
    )
    assert n_surv < 0.5 * n_fact, "prefilter pruned nothing"


def test_url_canonicalize_invariants(spark, sf_dir):
    from frinesis_spark.operators.text import QUERIES, canonicalize_url

    pdf = QUERIES["text_url_canonicalize"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for u in pdf["canon_url"]:
        assert "#" not in u
        assert "utm_" not in u and "fbclid" not in u and "gclid" not in u
        assert not u.endswith("/") and not u.endswith("?")
        scheme_host = u.split("/", 3)[2]
        assert scheme_host == scheme_host.lower()
        assert not scheme_host.startswith("www.")
        assert ":443" not in scheme_host and ":80" not in scheme_host
    # hosts/paths extracted, never empty for these synthesized shapes
    assert (pdf["host"].str.len() > 0).all()
    assert (pdf["path"].str.startswith("/")).all()

    # Idempotence + dedup-key property on hand-picked messy variants:
    # all four spellings of one page collapse to ONE canonical key.
    variants = spark.createDataFrame(
        [
            ("HTTPS://WWW.Site.COM:443/a/b/?utm_source=x",),
            ("https://site.com/a/b?utm_campaign=y&utm_medium=z",),
            ("https://Site.com/a/b/#section-2",),
            ("https://www.site.com/a/b",),
        ],
        "u string",
    )
    once = variants.select(canonicalize_url("u").alias("c"))
    twice = once.select(canonicalize_url("c").alias("c"))
    got_once = [r["c"] for r in once.collect()]
    got_twice = [r["c"] for r in twice.collect()]
    assert got_once == got_twice, "canonicalization is not idempotent"
    assert set(got_once) == {"https://site.com/a/b"}


def test_resample_interp_crafted_geometry(spark, monkeypatch):
    """Point exactly ON a grid hour (exact passthrough), duplicate
    timestamps (event_id tie-break), a 10-hour gap (every grid point
    interpolates the same segment), and NULL values (dropped)."""
    import datetime as dt

    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    B = dt.datetime(2007, 1, 1, 0, 0, 0)
    E = [
        # series 'a': points at 00:30, 02:00 (exactly on grid), 12:30
        (1, B + dt.timedelta(minutes=30), 1, "a", 10.0, "{}"),
        (2, B + dt.timedelta(hours=2), 1, "a", 20.0, "{}"),
        (3, B + dt.timedelta(hours=12, minutes=30), 1, "a", 62.0, "{}"),
        # series 'b': duplicate timestamps — higher event_id wins as
        # the carried neighbor on both engines
        (4, B + dt.timedelta(minutes=10), 2, "b", 1.0, "{}"),
        (5, B + dt.timedelta(minutes=10), 2, "b", 3.0, "{}"),
        (6, B + dt.timedelta(hours=3, minutes=50), 2, "b", 11.0, "{}"),
        # null value: must be invisible to the interpolation
        (7, B + dt.timedelta(hours=1), 2, "b", None, "{}"),
    ]
    events = spark.createDataFrame(
        E,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        ts_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = ts_mod.QUERIES["time_resample_interp"](
        spark, "crafted://interp"
    ).toPandas()
    duck_pdf = duck.sql(ts_mod.ORACLE["time_resample_interp"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "time_resample_interp")

    a = spark_pdf[spark_pdf["event_type"] == "a"].set_index("hour_ts")
    # grid = 01:00 .. 12:00; 02:00 is an exact point
    assert len(a) == 12
    h2 = a.loc[B + dt.timedelta(hours=2), "v_interp"]
    assert h2 == 20.0
    # 07:00 sits in the 02:00→12:30 segment: 20 + 42*(5h/10.5h)
    h7 = a.loc[B + dt.timedelta(hours=7), "v_interp"]
    assert abs(h7 - (20.0 + 42.0 * (5.0 / 10.5))) < 1e-12
    # betweenness everywhere
    assert ((a["v_interp"] >= 10.0) & (a["v_interp"] <= 62.0)).all()
    b = spark_pdf[spark_pdf["event_type"] == "b"]
    # duplicate-ts tie: prev neighbor is event 5 (value 3.0)
    v1 = b.set_index("hour_ts").loc[
        B + dt.timedelta(hours=1), "v_interp"
    ]
    expect = 3.0 + (11.0 - 3.0) * (50 / 220)  # 00:10→03:50 segment
    assert abs(v1 - expect) < 1e-12


def test_ab_test_matches_hand_welch(spark, monkeypatch):
    import math

    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    import datetime as dt

    B = dt.datetime(2007, 1, 1)
    rows = []
    va = [10.25, 11.5, 9.75, 10.0, 12.25]  # users 0,2,4,.. (variant A)
    vb = [13.5, 12.75, 14.25, 13.0]  # users 1,3,.. (variant B)
    eid = 0
    for i, v in enumerate(va):
        eid += 1
        rows.append((eid, B, 2 * i, "t", v, "{}"))
    for i, v in enumerate(vb):
        eid += 1
        rows.append((eid, B, 2 * i + 1, "t", v, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        ts_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = ts_mod.QUERIES["analytics_ab_test"](
        spark, "crafted://ab"
    ).toPandas()
    duck_pdf = duck.sql(ts_mod.ORACLE["analytics_ab_test"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "analytics_ab_test")

    r = spark_pdf.iloc[0]
    ma = sum(va) / len(va)
    mb = sum(vb) / len(vb)
    sa = sum((x - ma) ** 2 for x in va) / (len(va) - 1)
    sb = sum((x - mb) ** 2 for x in vb) / (len(vb) - 1)
    t = (mb - ma) / math.sqrt(sa / len(va) + sb / len(vb))
    assert r["n_a"] == 5 and r["n_b"] == 4
    assert abs(r["mean_a"] - ma) < 1e-9
    assert abs(r["t_stat"] - t) < 1e-9
    assert abs(r["lift"] - (mb / ma - 1)) < 1e-12


def test_mode_tie_break_is_declared(spark, monkeypatch):
    """Planted tie: two priorities with equal counts — the ASC
    priority must win on both engines."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    orders = spark.createDataFrame(
        [
            (1, "O", "3-MEDIUM", 1.0),
            (2, "O", "3-MEDIUM", 1.0),
            (3, "O", "1-URGENT", 1.0),
            (4, "O", "1-URGENT", 1.0),
            (5, "O", "5-LOW", 1.0),
            (6, "F", "5-LOW", 1.0),
        ],
        "o_orderkey long, o_orderstatus string, "
        "o_orderpriority string, o_totalprice double",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: orders if n == "orders" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("orders", orders.toPandas())
    spark_pdf = rel_mod.QUERIES["agg_mode_frequent"](
        spark, "crafted://mode"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["agg_mode_frequent"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_mode_frequent")
    by_status = spark_pdf.set_index("o_orderstatus")
    assert by_status.loc["O", "mode_priority"] == "1-URGENT"  # ASC tie win
    assert by_status.loc["O", "mode_count"] == 2
    assert abs(by_status.loc["O", "mode_share"] - 0.4) < 1e-12


def test_compressed_roundtrip_codecs_agree(spark, sf_dir):
    from frinesis_spark.sources.files import QUERIES

    pdf = QUERIES["source_compressed_roundtrip"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert pdf["codecs_agree"].all()


def test_ewma_hand_computed(spark, monkeypatch):
    """Tiny series with a NULL mid-stream and a truncated head: EWMA
    must skip the NULL in both numerator and weight mass, and heads
    use the shorter frame."""
    import datetime as dt

    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    B = dt.datetime(2007, 1, 1)
    E = [
        (1, B + dt.timedelta(minutes=1), 1, "s", 10.0, "{}"),
        (2, B + dt.timedelta(minutes=2), 1, "s", 20.0, "{}"),
        (3, B + dt.timedelta(minutes=3), 1, "s", None, "{}"),
        (4, B + dt.timedelta(minutes=4), 1, "s", 40.0, "{}"),
    ]
    events = spark.createDataFrame(
        E,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        ts_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = ts_mod.QUERIES["window_ewma_smooth"](
        spark, "crafted://ewma"
    ).toPandas()
    duck_pdf = duck.sql(ts_mod.ORACLE["window_ewma_smooth"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "window_ewma_smooth")
    got = dict(zip(spark_pdf["event_id"], spark_pdf["ewma"]))
    a = 0.8
    assert got[1] == 10.0  # head: frame of one
    assert abs(got[2] - (20 + a * 10) / (1 + a)) < 1e-6
    # row 3: own value NULL — weight mass excludes lag0
    assert abs(got[3] - (a * 20 + a * a * 10) / (a + a * a)) < 1e-6
    # row 4: NULL at lag1 skipped
    assert abs(
        got[4] - (40 + a * a * 20 + a**3 * 10) / (1 + a * a + a**3)
    ) < 1e-6


def test_interval_buckets_edge_semantics(spark, monkeypatch):
    """Boundary contract: a session ENDING exactly at c_start overlaps
    (c_start <= s_end); a session STARTING exactly at c_end does NOT
    (s_start < c_end strict); both engines agree."""
    import datetime as dt

    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    D = dt.datetime(2007, 3, 5)  # one day → campaigns 09-11 and 15-17
    E = [
        # session A: 08:40 .. 09:00:00 exactly → overlaps 9h campaign
        (1, D + dt.timedelta(hours=8, minutes=40), 1, "x", 1.0, "{}"),
        (2, D + dt.timedelta(hours=9), 1, "x", 2.0, "{}"),
        # session B (user 2): starts exactly 11:00 → NOT in 9-11h
        (3, D + dt.timedelta(hours=11), 2, "x", 4.0, "{}"),
        (4, D + dt.timedelta(hours=11, minutes=10), 2, "x", 8.0, "{}"),
        # session C (user 3): inside 15-17h
        (5, D + dt.timedelta(hours=15, minutes=30), 3, "x", 16.0, "{}"),
    ]
    events = spark.createDataFrame(
        E,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        ts_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = ts_mod.QUERIES["join_interval_buckets"](
        spark, "crafted://iv"
    ).toPandas()
    duck_pdf = duck.sql(ts_mod.ORACLE["join_interval_buckets"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "join_interval_buckets")
    by = spark_pdf.set_index("campaign_id")
    assert by.loc["2007-03-05#9", "n_sessions"] == 1  # A only, not B
    assert by.loc["2007-03-05#9", "value_sum_total"] == 3.0
    assert by.loc["2007-03-05#15", "n_sessions"] == 1
    assert by.loc["2007-03-05#15", "value_sum_total"] == 16.0
