"""Differential sweep wave 3: multimodal byte-boundary edges and the
funnel stage machine's ordering/tie contract.

Same method as test_differential.py — the registered oracle SQL runs
against crafted frames that hit contract edges the benign fixture
can't: empty payloads, multi-byte UTF-8 (octet vs char length), frame
boundaries at exact multiples of the frame size, same-timestamp funnel
steps, and out-of-order stage arrivals.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from tests.parity import assert_frames_match

# ------------------------------------------------------------ multimodal

_MM_DOCS = [
    (1, ""),  # empty payload: 0 bytes, 1 fake frame, md5('')
    (2, "é漢x"),  # multi-byte UTF-8: 6 octets ≠ 3 chars
    (3, "a" * 63),  # one byte under the 64-byte frame size
    (4, "b" * 64),  # exactly one frame unit → n_frames rolls to 2
    (5, "c" * 65),  # one byte over
    (6, "d" * 700),  # many frames: sampled indices 0,3,6,9
    (7, "tab\tand\nnewline"),  # control chars survive the byte path
]


@pytest.fixture()
def crafted_mm(spark, monkeypatch):
    import frinesis_spark.operators.multimodal as mm_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in _MM_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        mm_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    return duck


def _diff_mm(spark, duck, name):
    from frinesis_spark.operators import multimodal

    spark_pdf = multimodal.QUERIES[name](spark, "crafted://mm").toPandas()
    duck_pdf = duck.sql(multimodal.ORACLE[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


def test_multimodal_decode_byte_edges(spark, crafted_mm):
    pdf = _diff_mm(spark, crafted_mm, "multimodal_decode")
    by_id = pdf.set_index("doc_id")
    # Octet length, not char length, drives the fake dimensions.
    assert by_id.loc[2, "n_bytes"] == 6
    # Empty payload decodes to the 1×1 degenerate image, md5 of b''.
    assert by_id.loc[1, "width"] == 1 and by_id.loc[1, "height"] == 1
    assert by_id.loc[1, "content_hash"] == "d41d8cd98f00b204e9800998ecf8427e"


def test_multimodal_resize_degenerate(spark, crafted_mm):
    pdf = _diff_mm(spark, crafted_mm, "multimodal_resize")
    # Every thumbnail fits the 128 box and never collapses below 1 px.
    assert (pdf["out_width"] <= 128).all() and (pdf["out_width"] >= 1).all()
    assert (pdf["out_height"] <= 128).all() and (pdf["out_height"] >= 1).all()


def test_multimodal_frame_sample_boundaries(spark, crafted_mm):
    pdf = _diff_mm(spark, crafted_mm, "multimodal_frame_sample")
    frames = pdf.groupby("doc_id")["frame_idx"].apply(list).to_dict()
    # 0 and 63 bytes: one frame; exactly 64 rolls to a 2-frame clip
    # (still only index 0 sampled at stride 3); 700 B → 0,3,6,9.
    assert frames[1] == [0] and frames[3] == [0]
    assert frames[4] == [0] and frames[5] == [0]
    assert sorted(frames[6]) == [0, 3, 6, 9]


# ---------------------------------------------------------------- funnel


def _fts(minute: int) -> datetime.datetime:
    return datetime.datetime(2002, 5, 1, 10, minute, 0)


_FUNNEL_EVENTS = [
    # user 1: clean full funnel
    (1, _fts(0), 1, "view"),
    (2, _fts(1), 1, "click"),
    (3, _fts(2), 1, "purchase"),
    # user 2: click at the SAME ts as view — strict > rejects it and
    # there is no later click → stalls at stage 1
    (4, _fts(0), 2, "view"),
    (5, _fts(0), 2, "click"),
    # user 3: click arrives BEFORE the first view → stage 1 only
    (6, _fts(0), 3, "click"),
    (7, _fts(1), 3, "view"),
    # user 4: purchase before the click → stops at stage 2
    (8, _fts(0), 4, "purchase"),
    (9, _fts(1), 4, "view"),
    (10, _fts(2), 4, "click"),
    # user 5: same-ts click+purchase after a view: click counts (its
    # ts > view's), purchase needs ts > click's ts and fails → stage 2
    (11, _fts(0), 5, "view"),
    (12, _fts(1), 5, "click"),
    (13, _fts(1), 5, "purchase"),
    # user 6: only non-funnel events → excluded from n_users entirely
    (14, _fts(0), 6, "signup"),
    # user 7: repeated views then a late full run — earliest view
    # anchors, later steps still progress
    (15, _fts(5), 7, "view"),
    (16, _fts(1), 7, "view"),
    (17, _fts(6), 7, "click"),
    (18, _fts(7), 7, "purchase"),
]


@pytest.fixture()
def crafted_funnel(spark, monkeypatch):
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in _FUNNEL_EVENTS],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    return duck


def test_llm_prep_survives_empty_doc(spark, monkeypatch):
    """Review find: pipeline_llm_prep's alpha_ratio divided by
    length(text) with a bare '/', so one empty document (a failed
    extraction) killed the whole job with ANSI DIVIDE_BY_ZERO while
    the oracle silently dropped the row. try_divide now: both engines
    drop the empty doc, the job survives."""
    import frinesis_spark.operators.text as text_mod
    from frinesis_spark import catalog

    good = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [
            (1, good.strip(), "en", "s", len(good)),
            (2, "", "en", "s", 0),  # failed extraction
            (3, "!!! ??? 123 " * 10, "en", "s", 120),  # low alpha
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        text_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    spark_pdf = text_mod.QUERIES["pipeline_llm_prep"](
        spark, "crafted://empty"
    ).toPandas()
    duck_pdf = duck.sql(text_mod.ORACLE["pipeline_llm_prep"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "pipeline_llm_prep")
    assert set(spark_pdf["doc_id"]) == {1}  # only the clean doc survives


def test_running_frame_null_date_ordering(spark, monkeypatch):
    """Review find (the window_first_last class, missed by the first
    sweep): the running frame's ascending nullable date key now pins
    NULLS LAST, matching the oracle engines' default."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    orders = spark.createDataFrame(
        [
            (1, 7, "O", 10.0, datetime.datetime(2024, 1, 1), "1-URGENT"),
            (2, 7, "O", 20.0, None, "1-URGENT"),  # NULL date: LAST
            (3, 7, "O", 30.0, datetime.datetime(2024, 2, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: orders if n == "orders" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("orders", orders.toPandas())
    spark_pdf = rel_mod.QUERIES["window_running_frame"](
        spark, "crafted://nulldate"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["window_running_frame"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "window_running_frame")
    by = spark_pdf.set_index("o_orderkey")
    # The NULL-dated order sorts last: it sees the full running sum.
    assert by.loc[2, "running_spend"] == 60.0
    assert by.loc[2, "prev_price"] == 30.0


def test_stats_argmin_price_tie(spark, monkeypatch):
    """Review find: min_by/max_by on the bare price was
    tie-nondeterministic (engines disagreed on the winner). The
    struct MIN/MAX form declares the tie-break: lowest orderkey at
    the min price, highest at the max."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    li = spark.createDataFrame(
        [
            ("A", 1.0, 5.0, 20, 1),
            ("A", 2.0, 5.0, 10, 2),  # min-price tie: key 10 wins
            ("A", 3.0, 9.0, 40, 3),
            ("A", 4.0, 9.0, 30, 4),  # max-price tie: key 40 wins
        ],
        "l_returnflag string, l_quantity double, l_extendedprice double, "
        "l_orderkey long, l_linenumber long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: li if n == "lineitem" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("lineitem", li.toPandas())
    spark_pdf = rel_mod.QUERIES["agg_stats_corr"](
        spark, "crafted://pricetie"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["agg_stats_corr"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_stats_corr")
    row = spark_pdf.iloc[0]
    assert row["cheapest_orderkey"] == 10
    assert row["priciest_orderkey"] == 40


def test_variant_shred_long_min_does_not_crash(spark, monkeypatch):
    """Review find: the doubling-safe magnitude guard used ABS, and
    ABS(LONG_MIN) itself raises ARITHMETIC_OVERFLOW on both engines —
    the guard was a member of the job-kill class it guards against.
    Now a two-sided range compare: the LONG_MIN row is dropped, the
    job survives, engines agree."""
    import frinesis_spark.operators.scalar as scalar_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [
            (1, '{"k": -9223372036854775808}', "view"),  # LONG_MIN
            (2, '{"k": 9223372036854775807}', "view"),  # LONG_MAX
            (3, '{"k": 41}', "click"),  # survives the gate
            (4, '{"k": -4611686018427387904}', "view"),  # -2^62: dropped
        ],
        "event_id long, props string, event_type string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        scalar_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = scalar_mod.QUERIES["scalar_variant_shred"](
        spark, "crafted://longmin"
    ).toPandas()
    duck_pdf = duck.sql(scalar_mod.ORACLE["scalar_variant_shred"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "scalar_variant_shred")
    # Only the in-range row participates.
    assert set(spark_pdf["vtype"]) == {"click"}
    assert spark_pdf.iloc[0]["sum_k2"] == 82


def test_cumulative_distinct_null_user(spark, monkeypatch):
    """Review find: a NULL user_id triple was counted as a distinct
    user by Spark's distinct but ignored by the oracle's
    COUNT(DISTINCT). The declared contract (a NULL is not a user) now
    filters it on both engines."""
    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [
            (1, _fts(0), 10, "view", 1.0, "{}"),
            (2, _fts(1), None, "view", 1.0, "{}"),  # anonymous
            (3, _fts(2), 11, "view", 1.0, "{}"),
        ],
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
    spark_pdf = ts_mod.QUERIES["analytics_cumulative_distinct"](
        spark, "crafted://nulluser"
    ).toPandas()
    duck_pdf = duck.sql(
        ts_mod.ORACLE["analytics_cumulative_distinct"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "analytics_cumulative_distinct")
    assert spark_pdf.iloc[0]["dau"] == 2  # the NULL row is not a user


def test_m4_pre_epoch_bucket_floors(spark, monkeypatch):
    """Review find: the Spark bucket used a double→long CAST, which
    truncates toward zero — a pre-1970 timestamp landed one bucket
    high vs the oracle's flooring integer division. Now FLOOR on both
    engines."""
    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [
            (1, datetime.datetime(1969, 12, 31, 23, 59, 0), 1,
             "tick", 4.0, "{}"),
            (2, datetime.datetime(1969, 12, 31, 23, 50, 0), 1,
             "tick", 6.0, "{}"),
            (3, datetime.datetime(1970, 1, 1, 0, 1, 0), 1,
             "tick", 8.0, "{}"),
        ],
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
    spark_pdf = ts_mod.QUERIES["time_downsample_m4"](
        spark, "crafted://preepoch"
    ).toPandas()
    duck_pdf = duck.sql(ts_mod.ORACLE["time_downsample_m4"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "time_downsample_m4")
    # The two pre-epoch points share the 23:45 bucket; the post-epoch
    # point opens 00:00 — truncation would have merged all three.
    starts = sorted(r.isoformat() for r in spark_pdf["bucket_ts"])
    assert starts == ["1969-12-31T23:45:00", "1970-01-01T00:00:00"]


def test_bool_bitwise_null_and_negative(spark, monkeypatch):
    """Boolean/bitwise aggregates on crafted groups: NULLs inside the
    predicates (ignored by EVERY/BOOL_OR on both engines), an all-NULL
    group (aggregate yields NULL, COUNT still counts rows), negative
    integers through BIT_AND/OR/XOR (two's-complement identical), and
    a single-row group (bit aggs are identities)."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    rows = [
        # group A: mixed signs and NULL quantity rows
        ("A", 5.0, 0.10, 3),
        ("A", None, 0.00, -7),
        ("A", 2.0, None, 12),
        # group B: every value NULL except the bit column's negatives
        ("B", None, None, -1),
        ("B", None, None, -2),
        # group C: single row
        ("C", -1.0, 0.05, 6),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_quantity double, l_discount double, "
        "l_linenumber long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: li if n == "lineitem" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("lineitem", li.toPandas())
    spark_pdf = rel_mod.QUERIES["agg_bool_bitwise"](
        spark, "crafted://bits"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["agg_bool_bitwise"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_bool_bitwise")
    by = spark_pdf.set_index("l_returnflag")
    # NULL predicates are ignored: A's non-NULL quantities are all > 0.
    assert bool(by.loc["A", "all_qty_positive"]) is True
    # -1 & -2 in two's complement = -2; -1 | -2 = -1.
    assert by.loc["B", "lineno_bit_and"] == -2
    assert by.loc["B", "lineno_bit_or"] == -1
    # All-NULL predicate group: the boolean verdicts are NULL, the
    # row count is not.
    import pandas as pd

    assert pd.isna(by.loc["B", "all_qty_positive"])
    assert by.loc["B", "n_rows"] == 2
    # Single-row group: every bit aggregate is the value itself.
    assert (
        by.loc["C", "lineno_bit_and"]
        == by.loc["C", "lineno_bit_or"]
        == by.loc["C", "lineno_bit_xor"]
        == 6
    )


def test_scalar_date_math_edge_dates(spark, monkeypatch):
    """The date/math scalar suite on crafted ORDERS rows the fixture's
    1995-2001 window never produces: leap day, a century NON-leap
    (1900-02-28 + the 28th being month-end), epoch day, far-future
    year, and timestamps one µs before midnight (datediff must count
    calendar-date difference, not elapsed 24 h blocks) — plus sqrt(0),
    a sub-dollar price and a price at the ceil boundary."""
    import frinesis_spark.operators.scalar as scalar_mod
    from frinesis_spark import catalog

    rows = [
        (1, 1, "O", 0.0, datetime.datetime(2000, 2, 29, 12, 0), "1-URGENT"),
        (2, 1, "F", 0.5, datetime.datetime(1900, 2, 28, 0, 0), "5-LOW"),
        (3, 1, "P", 100.0, datetime.datetime(1970, 1, 1, 0, 0), "3-MEDIUM"),
        # one µs before midnight: still the SAME calendar day
        (4, 1, "O", 99.99,
         datetime.datetime(2001, 12, 31, 23, 59, 59, 999999), "2-HIGH"),
        (5, 1, "F", 12345.678, datetime.datetime(2199, 6, 15, 6, 30), ""),
        (6, 1, "P", 1000.0, datetime.datetime(1999, 12, 31, 23, 59, 59),
         "4-NOT SPECIFIED"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        scalar_mod,
        "table",
        lambda s, d, n: orders if n == "orders" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("orders", orders.toPandas())
    spark_pdf = scalar_mod.QUERIES["scalar_string_date_math"](
        spark, "crafted://dates"
    ).toPandas()
    duck_pdf = duck.sql(
        scalar_mod.ORACLE["scalar_string_date_math"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "scalar_string_date_math")
    by_id = spark_pdf.set_index("o_orderkey")
    # 23:59:59.999999 on Dec 31 is still 1 calendar day before Jan 1.
    assert by_id.loc[4, "days_to_2002"] == 1
    # Leap day's month truncation lands on Feb 1 of a leap year.
    assert by_id.loc[1, "order_month_start"].month == 2
    assert by_id.loc[1, "price_sqrt"] == 0.0
    # ceil at an exact boundary does not round up past it.
    assert by_id.loc[6, "price_centi_ceil"] == 10


def test_rolling_quantile_edges(spark, monkeypatch):
    """Rolling quantile on a crafted series: NULL values inside the
    frame (ignored by BOTH engines' interpolating quantile), frames
    shorter than the nominal width, duplicate values, and interpolation
    midpoints that are not exactly representable halves."""
    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    vals = [1.1, None, 2.3, 2.3, -7.7, None, 0.3, 9.9, 0.1]
    events = spark.createDataFrame(
        [
            (i, _fts(i), 1, "tick" if i % 2 == 0 else "tock", v, "{}")
            for i, v in enumerate(vals)
        ],
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
    spark_pdf = ts_mod.QUERIES["window_rolling_quantile"](
        spark, "crafted://roll"
    ).toPandas()
    duck_pdf = duck.sql(ts_mod.ORACLE["window_rolling_quantile"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "window_rolling_quantile")
    import pandas as pd

    by_id = spark_pdf.set_index("event_id")
    # Frame of one non-NULL value: the quantile IS that value.
    assert by_id.loc[0, "med_trailing"] == 1.1
    # An all-NULL frame yields NULL on both engines.
    assert pd.isna(by_id.loc[1, "med_trailing"])
    # NULLs inside the frame are ignored: tock frame [None, 2.3] → 2.3.
    assert by_id.loc[3, "med_trailing"] == 2.3
    # Even-count frame interpolates between the middle values:
    # tick frame [1.1, 2.3, -7.7, 0.3] → (0.3 + 1.1) / 2, ROUND(6)
    # since r10 (the query folds cross-engine interpolation ulp —
    # raw FP here is 0.7000000000000001, the contract value is 0.7).
    assert by_id.loc[6, "med_trailing"] == 0.7


def test_funnel_ordering_and_ties(spark, crafted_funnel):
    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["funnel_conversion"](
        spark, "crafted://funnel"
    ).toPandas()
    duck_pdf = crafted_funnel.sql(
        relational.ORACLE["funnel_conversion"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "funnel_conversion")
    row = spark_pdf.iloc[0]
    # users 1..5 and 7 have funnel events; 6 has none
    assert row["n_users"] == 6
    assert row["reached_view"] == 6  # every funnel user eventually views
    assert row["reached_click"] == 4  # users 1, 4, 5, 7
    assert row["reached_purchase"] == 2  # users 1, 7
