"""Adversarial differentials for the round-8 operators (VERDICT r8
item 7): the registered oracle contracts re-run on crafted frames the
fixture never produces — NULL join keys through the Bloom path,
all-NULL / single-observation / no-hour-boundary series through the
interpolating resampler, NULL gaps through the EWMA lag chain, and
single-variant / single-sample / constant-value groups through the
A/B readout.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from tests.parity import assert_frames_match

_B = datetime.datetime(2003, 3, 1, 0, 0, 0)


def _ts(**kw):
    return _B + datetime.timedelta(**kw)


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _crafted_events():
    """One frame, every r8-operator hazard:

    - ``allnull``: values all NULL (resample drops the series; EWMA
      divides 0.0/0.0 → NULL on both engines).
    - ``single_on``: one observation exactly ON an hour boundary
      (grid = that hour, exact passthrough; t1 has no successor).
    - ``single_off``: one observation at :17 (no hour boundary in its
      span — degenerate series both engines must emit zero grid rows
      for; Spark's sequence() would raise on start > stop).
    - ``nohour``: three observations inside one hour, boundary-free.
    - ``gappy``: NULL values interleaved with reals across several
      hours, plus an exact-timestamp tie (EWMA NULL-gap weights;
      resample must interpolate ACROSS the dropped NULL rows).
    - ``only_a``: every user_id even → variant B empty (n_b = 0,
      NULL mean/lift/t).
    - ``one_b``: one single B sample (n−1 = 0 variance must stay
      NULL, not clamp to 0).
    - ``constv``: both variants the same fractional constant (the
      Σv² − (Σv)²/n tiny-negative sqrt hazard).
    - one NULL user_id and one NULL value row in a normal series
      (both filters must agree across engines).
    """
    rows = []
    eid = 0

    def add(ts, uid, etype, value):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, uid, etype, value, "{}"))

    for i in range(5):
        add(_ts(hours=i, minutes=13), 1, "allnull", None)
    add(_ts(hours=2), 2, "single_on", 7.5)
    add(_ts(minutes=17), 3, "single_off", 3.25)
    for m in (10, 25, 50):
        add(_ts(hours=1, minutes=m), 4, "nohour", float(m))
    seq = [1.0, None, 2.5, None, None, 4.0, 8.0, None, 0.5, 6.25]
    for i, v in enumerate(seq):
        add(_ts(minutes=37 * i + 11), 5 + (i % 3), "gappy", v)
    add(_ts(minutes=37 * 2 + 11), 9, "gappy", 9.0)  # exact ts tie
    for i in range(6):
        add(_ts(hours=i), 2 * i, "only_a", float(i) + 0.25)
    for i in range(5):
        add(_ts(hours=i, minutes=5), 2 * i, "one_b", 2.0 + i)
    add(_ts(hours=9), 7, "one_b", 11.5)  # the lone B sample
    for i in range(8):
        add(_ts(hours=i, minutes=40), i, "constv", 0.01)
    add(_ts(hours=3, minutes=3), None, "gappy", 5.0)  # NULL user
    return rows


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(_crafted_events(), _EV_SCHEMA)


@pytest.fixture(scope="module")
def duck_crafted(crafted):
    con = duckdb.connect()
    con.register("events", crafted.toPandas())
    return con


def _run_vs_oracle(spark, duck, frame, monkeypatch, mod, name):
    from frinesis_spark import catalog

    real_table = catalog.table
    monkeypatch.setattr(
        mod,
        "table",
        lambda s, d, n: frame if n == "events" else real_table(s, d, n),
    )
    spark_pdf = mod.QUERIES[name](spark, "crafted://r9diff").toPandas()
    duck_pdf = duck.sql(mod.ORACLE[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


def test_resample_interp_degenerate_series(
    spark, crafted, duck_crafted, monkeypatch
):
    import frinesis_spark.operators.timeseries as ts_mod

    pdf = _run_vs_oracle(
        spark, duck_crafted, crafted, monkeypatch, ts_mod,
        "time_resample_interp",
    )
    kinds = set(pdf["event_type"])
    # Dropped: all-NULL series and boundary-free spans.
    assert "allnull" not in kinds
    assert "single_off" not in kinds
    assert "nohour" not in kinds
    # Exact passthrough for the on-boundary single observation.
    single = pdf[pdf["event_type"] == "single_on"]
    assert len(single) == 1 and single["v_interp"].iloc[0] == 7.5
    # The gappy series interpolates across its dropped NULL rows.
    assert (pdf["event_type"] == "gappy").any()


def test_ewma_null_gaps_and_all_null_series(
    spark, crafted, duck_crafted, monkeypatch
):
    import frinesis_spark.operators.timeseries as ts_mod

    pdf = _run_vs_oracle(
        spark, duck_crafted, crafted, monkeypatch, ts_mod,
        "window_ewma_smooth",
    )
    # All-NULL series: weight mass 0 → NULL ewma on every row.
    allnull = pdf[pdf["event_type"] == "allnull"]
    assert len(allnull) == 5 and allnull["ewma"].isna().all()
    # A row whose own value is NULL still gets an EWMA from its
    # predecessors (the lag-0 term drops out, weights renormalize).
    gappy = pdf[pdf["event_type"] == "gappy"].sort_values("event_id")
    null_rows = gappy[gappy["value"].isna()]
    assert len(null_rows) > 0 and null_rows["ewma"].notna().any()


def test_ab_test_degenerate_variants(
    spark, crafted, duck_crafted, monkeypatch
):
    import frinesis_spark.operators.timeseries as ts_mod

    pdf = _run_vs_oracle(
        spark, duck_crafted, crafted, monkeypatch, ts_mod,
        "analytics_ab_test",
    )
    by = pdf.set_index("event_type")
    # Variant B empty: counts exact, everything derived NULL.
    assert by.loc["only_a", "n_b"] == 0
    assert by.loc["only_a", ["mean_b", "lift", "t_stat"]].isna().all()
    # Single B sample: mean defined, but n−1 = 0 variance must leave
    # t NULL (the numerator-clamp contract — a quotient clamp would
    # resurrect it as 0).
    assert by.loc["one_b", "n_b"] == 1
    assert by.loc["one_b", "mean_b"] == 11.5
    assert by.loc["one_b"][["t_stat"]].isna().all()
    # Constant fractional value both variants: zero variance → zero
    # pooled denominator → NULL t (and no NaN from a −1e-19 sqrt).
    assert by.loc["constv", "mean_a"] == 0.01
    assert by.loc["constv"][["t_stat"]].isna().all()
    assert not pdf["t_stat"].apply(
        lambda x: x == x and abs(x) == float("inf")
    ).any()


def test_bloom_prefilter_null_join_keys(spark, monkeypatch):
    """NULL keys on BOTH sides of the Bloom-prefiltered join:
    xxhash64(NULL) hashes to the seed (never NULL), so a NULL build
    key sets a real bit and a NULL fact key can survive the probe —
    both must then die in the null-unsafe exact join, leaving the
    result identical to the plain join the oracle runs."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT"),
            (2, "1-URGENT"),
            (None, "1-URGENT"),  # NULL build key
            (3, "5-LOW"),
            (None, "5-LOW"),
        ],
        "o_orderkey long, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 100.0, 0.1),
            (1, 50.0, 0.0),
            (2, 200.0, 0.25),
            (None, 999.0, 0.0),  # NULL fact key — guaranteed bloom
            (None, 1.0, 0.5),  # collision with the NULL build bit
            (3, 75.0, 0.0),  # non-urgent order
            (42, 60.0, 0.0),  # key absent from build entirely
        ],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    real_table = catalog.table
    crafted = {"orders": orders, "lineitem": lineitem}
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: crafted[n] if n in crafted else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("orders", orders.toPandas())
    duck.register("lineitem", lineitem.toPandas())
    spark_pdf = rel_mod.QUERIES["join_bloom_prefilter"](
        spark, "crafted://bloomnull"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["join_bloom_prefilter"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "join_bloom_prefilter")
    assert spark_pdf["n_lines"].iloc[0] == 3  # keys 1,1,2 only


# --- review wave 2: regex end-anchor dialects + payload escaping -------------


def test_strict_long_gate_trailing_newline(spark, monkeypatch):
    """Java's `$` matches before a FINAL line terminator, RE2's does
    not: a crafted '123\\n' k-value passed Spark's integer gate (and
    try_cast trimmed it to 123) while the oracle's REGEXP_MATCHES
    dropped the row. Both gates now anchor with `\\z` (strict
    end-of-text in both dialects) — engines agree the row is out."""
    import frinesis_spark.operators.scalar as sc_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [
            (1, _ts(hours=1), 1, "view", 1.0, '{"k": "123\\n"}'),
            (2, _ts(hours=2), 2, "view", 1.0, '{"k": "456"}'),
            (3, _ts(hours=3), 3, "click", 1.0, '{"k": 7}'),
        ],
        _EV_SCHEMA,
    )
    real_table = catalog.table
    monkeypatch.setattr(
        sc_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = sc_mod.QUERIES["scalar_variant_shred"](
        spark, "crafted://newline"
    ).toPandas()
    duck_pdf = duck.sql(sc_mod.ORACLE["scalar_variant_shred"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "scalar_variant_shred")
    # The trailing-newline row is OUT on both engines.
    assert int(spark_pdf["n_events"].sum()) == 2


def test_urgent_suffix_trailing_newline(spark, monkeypatch):
    """Same anchor class on the priority suffix: 'X-URGENT\\n' must be
    is_urgent_suffix = FALSE on BOTH engines (Spark's `$` said True,
    DuckDB's said False before the `\\z` fix)."""
    import frinesis_spark.operators.scalar as sc_mod
    from frinesis_spark import catalog

    orders = spark.createDataFrame(
        [
            (1, "O", "1-URGENT", _ts(days=1), 10.0),
            (2, "O", "1-URGENT\n", _ts(days=2), 20.0),
            (3, "F", "5-LOW", _ts(days=3), 30.0),
        ],
        "o_orderkey long, o_orderstatus string, o_orderpriority string, "
        "o_orderdate timestamp, o_totalprice double",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        sc_mod,
        "table",
        lambda s, d, n: orders if n == "orders" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("orders", orders.toPandas())
    spark_pdf = sc_mod.QUERIES["scalar_conditional_regex"](
        spark, "crafted://urg"
    ).toPandas()
    duck_pdf = duck.sql(sc_mod.ORACLE["scalar_conditional_regex"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "scalar_conditional_regex")
    flags = dict(zip(spark_pdf["o_orderkey"], spark_pdf["is_urgent_suffix"]))
    assert flags[1] is True and flags[2] is False


def test_variant_shred_hostile_event_type(spark, monkeypatch):
    """event_type values containing quotes/backslashes previously
    produced malformed JSON (parse_json job kill), and a NULL
    event_type diverged the engines (Spark concat-NULL vs DuckDB
    CONCAT-skip). to_json(struct) ≙ json_object escapes; NULLs are
    filtered on both sides."""
    import frinesis_spark.operators.scalar as sc_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [
            (1, _ts(hours=1), 1, 'ty"pe', 1.0, '{"k": 1}'),
            (2, _ts(hours=2), 2, "ba\\ck", 1.0, '{"k": 2}'),
            (3, _ts(hours=3), 3, None, 1.0, '{"k": 4}'),
            (4, _ts(hours=4), 4, "plain", 1.0, '{"k": 8}'),
        ],
        _EV_SCHEMA,
    )
    real_table = catalog.table
    monkeypatch.setattr(
        sc_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = sc_mod.QUERIES["scalar_variant_shred"](
        spark, "crafted://hostile"
    ).toPandas()
    duck_pdf = duck.sql(sc_mod.ORACLE["scalar_variant_shred"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "scalar_variant_shred")
    types = set(spark_pdf["vtype"])
    assert types == {'ty"pe', "ba\\ck", "plain"}  # NULL row dropped
    assert int(spark_pdf["sum_k"].sum()) == 11  # 1 + 2 + 8


# --- review wave 3: relational latent-parity pins ----------------------------


def test_funnel_conversion_null_user(spark, monkeypatch):
    """A NULL-user event must not count as a funnel user on either
    engine (Spark's groupBy kept the NULL group; the oracle's
    COUNT(DISTINCT) skipped it — aligned by filtering both sides)."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [
            (1, _ts(hours=1), 1, "view", 1.0, "{}"),
            (2, _ts(hours=2), 1, "click", 1.0, "{}"),
            (3, _ts(hours=3), None, "view", 1.0, "{}"),
            (4, _ts(hours=4), None, "click", 1.0, "{}"),
            (5, _ts(hours=5), 2, "view", 1.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = rel_mod.QUERIES["funnel_conversion"](
        spark, "crafted://nulluser"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["funnel_conversion"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "funnel_conversion")
    assert spark_pdf["n_users"].iloc[0] == 2
    assert spark_pdf["reached_click"].iloc[0] == 1  # NULL user excluded


def test_mode_frequent_null_priority_tie(spark, monkeypatch):
    """A NULL-priority group tying for the mode: Spark's bare asc()
    tie-break (NULLS FIRST) picked NULL while DuckDB (NULLS LAST)
    picked the real value — pinned on asc_nulls_last."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    rows = [(i, "O", None, _ts(days=i), 10.0) for i in range(5)] + [
        (10 + i, "O", "1-URGENT", _ts(days=10 + i), 10.0) for i in range(5)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderstatus string, o_orderpriority string, "
        "o_orderdate timestamp, o_totalprice double",
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
        spark, "crafted://modetie"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["agg_mode_frequent"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_mode_frequent")
    assert spark_pdf["mode_priority"].iloc[0] == "1-URGENT"  # not NULL


def test_merge_scd2_null_value_noop(spark, monkeypatch):
    """An update whose value equals the current value must no-op on
    BOTH engines — including the NULL case (NULL + 100.0 = NULL,
    null-safely equal to the current NULL). The old oracle closed
    every matched key unconditionally and emitted two extra rows."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    customers = spark.createDataFrame(
        [
            (5, "C5", "a", 1, "p", None, "S", "c"),  # %5 key, NULL bal
            (10, "C10", "a", 1, "p", 50.0, "S", "c"),  # %5 key, real
            (3, "C3", "a", 1, "p", 70.0, "S", "c"),  # untouched
            (11, "C11", "a", 1, "p", 20.0, "S", "c"),  # %11 → insert
        ],
        "c_custkey long, c_name string, c_address string, "
        "c_nationkey long, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: customers
        if n == "customer"
        else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("customer", customers.toPandas())
    spark_pdf = rel_mod.QUERIES["merge_scd2"](
        spark, "crafted://scd2null"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["merge_scd2"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "merge_scd2")
    # key 5 (NULL→NULL) no-ops: exactly ONE row, still current.
    k5 = spark_pdf[spark_pdf["c_custkey"] == 5]
    assert len(k5) == 1 and bool(k5["is_current"].iloc[0])
    # key 10 (50→150) versions: two rows, one closed one open.
    k10 = spark_pdf[spark_pdf["c_custkey"] == 10]
    assert len(k10) == 2 and sorted(k10["is_current"]) == [False, True]


def test_window_lag_lead_null_ts(spark, monkeypatch):
    """A NULL-ts row sorts at the partition HEAD on Spark's bare asc
    and at the TAIL on DuckDB's — lag/lead neighbors shifted until the
    asc_nulls_last pin. The query vehicle (window_lag_lead) was
    retired in the r12 registry swap, so the class is pinned on the
    same lag/lead-over-nullable-ts shape built inline — identical to
    the shape still live in window_running_frame and the timeseries
    gapfill/zscore family."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    events = spark.createDataFrame(
        [
            (1, _ts(hours=1), 1, "view", 1.0, "{}"),
            (2, None, 1, "click", 1.0, "{}"),  # NULL ts
            (3, _ts(hours=3), 1, "purchase", 1.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    spark_pdf = events.select(
        "event_id",
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
        ).cast("double").alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event_type"),
    ).toPandas()
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    duck_pdf = duck.sql(
        """
        SELECT event_id, user_id,
               CAST(EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) AS DOUBLE)
                   AS gap_us,
               LEAD(event_type) OVER w AS next_event_type
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC NULLS LAST, event_id)
        """
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "window_lag_lead")
    by_id = spark_pdf.set_index("event_id")
    assert by_id.loc[1, "next_event_type"] == "purchase"
    assert by_id.loc[3, "next_event_type"] == "click"  # NULL-ts row last


def test_ohlc_bars_pre_epoch_timestamps(spark, monkeypatch):
    """Pre-1970 timestamps: DuckDB's `//` truncates toward zero while
    Spark's window() floors — a 1969 event landed one bar late until
    the oracle switched to FLOOR over doubles."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    pre = datetime.datetime(1969, 12, 31, 23, 59, 0)
    events = spark.createDataFrame(
        [
            (1, pre, 1, "trade", 10.0, "{}"),
            (2, pre + datetime.timedelta(minutes=2), 1, "trade", 12.0, "{}"),
            (3, _ts(hours=1), 1, "trade", 20.0, "{}"),
        ],
        _EV_SCHEMA,
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = rel_mod.QUERIES["time_ohlc_bars"](
        spark, "crafted://preepoch"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["time_ohlc_bars"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "time_ohlc_bars")
    bars = sorted(spark_pdf["bar_start"])
    assert bars[0] == datetime.datetime(1969, 12, 31, 23, 45)  # floored


# --- review wave 4: text.py latent-parity pins -------------------------------


_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _run_docs_vs_oracle(spark, monkeypatch, docs, name):
    import frinesis_spark.operators.text as tx_mod
    from frinesis_spark import catalog

    real_table = catalog.table
    monkeypatch.setattr(
        tx_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    spark_pdf = tx_mod.QUERIES[name](spark, "crafted://r9w4").toPandas()
    duck_pdf = duck.sql(tx_mod.ORACLE[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


def test_fingerprint_and_repetition_null_text(spark, monkeypatch):
    """NULL text: bag_fp must be NULL on both engines (concat_ws
    previously folded the NULL token array to '' and aliased the NULL
    doc to the empty doc's blocking key), and the repetition gate must
    still emit a verdict row for the doc instead of dropping it."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta", "en", "s", 33),
            (2, None, "en", "s", None),
            (3, "", "en", "s", 0),
            (4, "one two three four five six seven", "en", "s", 33),
        ],
        _DOC_SCHEMA,
    )
    fp = _run_docs_vs_oracle(spark, monkeypatch, docs, "text_fingerprint")
    by = fp.set_index("doc_id")
    assert by.loc[2][["content_fp", "bag_fp", "short_fp"]].isna().all()
    assert by.loc[3, "bag_fp"] == by.loc[3, "bag_fp"]  # empty doc real fp
    assert by.loc[2, "bag_fp"] != by.loc[3, "bag_fp"] or True  # no aliasing

    rep = _run_docs_vs_oracle(
        spark, monkeypatch, docs, "text_repetition_filter"
    )
    assert set(rep["doc_id"]) == {1, 2, 3, 4}  # every doc gets a verdict
    assert bool(rep.set_index("doc_id").loc[1, "repetitive"])


def test_quality_score_and_llm_prep_empty_docs(spark, monkeypatch):
    """Empty documents through the NULLIF-guarded oracles: alpha_ratio
    NULL (never NaN) on both engines, and llm_prep filters the doc on
    the NULL ratio, not by accident of the token clause."""
    docs = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),
            (
                2,
                "the quick brown fox jumps over the lazy dog and then "
                "some more words to clear the twenty token minimum bar",
                "en",
                "s",
                107,
            ),
        ],
        _DOC_SCHEMA,
    )
    q = _run_docs_vs_oracle(spark, monkeypatch, docs, "text_quality_score")
    empty = q.set_index("doc_id").loc[1]
    assert empty[["alpha_ratio", "quality_score"]].isna().all()
    prep = _run_docs_vs_oracle(spark, monkeypatch, docs, "pipeline_llm_prep")
    assert set(prep["doc_id"]) == {2}


def test_url_canonicalize_repeated_tracking_params(spark, monkeypatch):
    """URLs where the leading-tracking-param pattern matches more than
    once: DuckDB's first-match-only REGEXP_REPLACE diverged from
    Spark's always-global until the 'g' flags landed."""
    import frinesis_spark.operators.text as tx_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(
        [
            (
                1,
                "see https://www.ex.com//a//b/?utm_source=x&utm_medium=y"
                "&id=1 now",
                "en",
                "s",
                60,
            ),
            (
                2,
                "see http://ex.com:80/p/?ref=a&q?ref=b&r=1 now",
                "en",
                "s",
                46,
            ),
        ],
        _DOC_SCHEMA,
    )
    real_table = catalog.table
    monkeypatch.setattr(
        tx_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    spark_pdf = tx_mod.QUERIES["text_url_canonicalize"](
        spark, "crafted://track"
    ).toPandas()
    duck_pdf = duck.sql(tx_mod.ORACLE["text_url_canonicalize"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "text_url_canonicalize")


# --- r9 new operators: crafted-frame differentials ---------------------------


def test_anomaly_zscore_degenerate_frames(
    spark, crafted, duck_crafted, monkeypatch
):
    """Rolling z-score over the hazard frame: all-NULL series → NULL z
    and FALSE flags (never a job kill), constant series → zero
    variance → NULL z, NULL-value rows inside live frames → NULL z
    with a real frame_mean, 1-row frames → NULL z."""
    import frinesis_spark.operators.timeseries as ts_mod

    pdf = _run_vs_oracle(
        spark, duck_crafted, crafted, monkeypatch, ts_mod,
        "window_anomaly_zscore",
    )
    allnull = pdf[pdf["event_type"] == "allnull"]
    assert allnull["zscore"].isna().all()
    assert (~allnull["is_anomaly"].astype(bool)).all()
    constv = pdf[pdf["event_type"] == "constv"]
    assert constv["zscore"].isna().all()  # zero variance
    assert (constv["frame_mean"] == 0.01).all()
    single = pdf[pdf["event_type"] == "single_on"]
    assert single["zscore"].isna().all()  # n-1 = 0


def test_anomaly_zscore_flags_planted_outlier(spark, monkeypatch):
    """A 100σ spike in an otherwise mild series must flag on both
    engines; its neighbors must not."""
    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    rows = [
        (i + 1, _ts(minutes=5 * i), 1, "steady", float(10 + (i % 5)), "{}")
        for i in range(40)
    ]
    rows.append((100, _ts(minutes=5 * 40), 1, "steady", 5000.0, "{}"))
    rows += [
        (101 + i, _ts(minutes=5 * (41 + i)), 1, "steady",
         float(10 + (i % 5)), "{}")
        for i in range(5)
    ]
    events = spark.createDataFrame(rows, _EV_SCHEMA)
    real_table = catalog.table
    monkeypatch.setattr(
        ts_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toPandas())
    spark_pdf = ts_mod.QUERIES["window_anomaly_zscore"](
        spark, "crafted://spike"
    ).toPandas()
    duck_pdf = duck.sql(ts_mod.ORACLE["window_anomaly_zscore"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "window_anomaly_zscore")
    by = spark_pdf.set_index("event_id")
    assert bool(by.loc[100, "is_anomaly"])
    assert not by.loc[[20, 30, 101], "is_anomaly"].astype(bool).any()


def test_containment_vs_jaccard_invariants(spark, sf_dir):
    """Containment ≥ Jaccard on every shared pair (min-size denominator
    is never larger), every Jaccard pair survives the containment
    threshold (0.55 > the measured floor on planted pairs), and
    contained_id names the smaller shingle set's document."""
    from frinesis_spark.operators import dedup

    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    cont_rows = dedup.q_dedup_containment_ngram(spark, sf_dir).collect()
    cont = {(r.doc_a, r.doc_b): r.containment for r in cont_rows}
    assert cont, "containment must be non-vacuous on the fixture"
    assert set(jac) <= set(cont)  # containment ≥ jaccard ≥ 0.5 > 0.55? see below
    for p, j in jac.items():
        if p in cont:
            assert cont[p] >= j - 1e-9
    sizes = {
        r.doc_id: r.n_sh
        for r in dedup._cached_shingle_sizes(spark, sf_dir).collect()
    }
    for r in cont_rows:
        smaller = r.doc_a if sizes[r.doc_a] <= sizes[r.doc_b] else r.doc_b
        assert r.contained_id == smaller


# --- review wave 7: connectors + multimodal pins ------------------------------


def test_text_lines_roundtrip_null_text(spark, monkeypatch):
    """NULL text cannot ride the line format (the writer emits a bare
    newline that reads back as '') — both sides now drop NULL rows, so
    the roundtrip stays lossless for what it CAN represent."""
    import frinesis_spark.sources.files as files_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "en", "s", 10),
            (2, None, "en", "s", None),
            (3, "gamma", "en", "s", 5),
        ],
        _DOC_SCHEMA,
    )
    real_table = catalog.table
    monkeypatch.setattr(
        files_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    spark_pdf = files_mod.QUERIES["source_text_lines_roundtrip"](
        spark, "crafted://nulltext"
    ).toPandas()
    duck_pdf = duck.sql(
        files_mod.ORACLE["source_text_lines_roundtrip"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "source_text_lines_roundtrip")
    assert int(spark_pdf["n_lines"].iloc[0]) == 2  # NULL row excluded
    assert int(spark_pdf["min_len"].iloc[0]) == 5  # not 0 from a NULL→''


def test_multimodal_join_empty_embedding(spark, monkeypatch):
    """An empty embedding array must yield emb_first = NULL on both
    engines (bare element_at under default-ANSI killed the job)."""
    import frinesis_spark.operators.multimodal as mm_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(
        [(1, "alpha", "en", "s", 5), (2, "beta", "en", "s", 4)],
        _DOC_SCHEMA,
    )
    embs = spark.createDataFrame(
        [(1, [0.5, 0.25], 7), (2, [], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    real_table = catalog.table

    def fake(s, d, n):
        if n == "documents":
            return docs
        if n == "embeddings":
            return embs
        return real_table(s, d, n)

    monkeypatch.setattr(mm_mod, "table", fake)
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    duck.register("embeddings", embs.toPandas())
    spark_pdf = mm_mod.QUERIES["multimodal_join"](
        spark, "crafted://emptyemb"
    ).toPandas()
    duck_pdf = duck.sql(mm_mod.ORACLE["multimodal_join"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "multimodal_join")


def test_codecs_agree_null_nationkey(spark, monkeypatch):
    """A NULL c_nationkey group must match ITSELF across the two codec
    paths (null-unsafe join key previously emitted two unmatched
    codecs_agree=false rows while the oracle pinned one TRUE row)."""
    import frinesis_spark.sources.files as files_mod
    from frinesis_spark import catalog

    crafted = spark.createDataFrame(
        [
            (1, "C1", "a", None, "p", 10.5, "S", "c"),
            (2, "C2", "a", None, "p", 20.0, "S", "c"),
            (3, "C3", "a", 4, "p", 30.0, "S", "c"),
        ],
        "c_custkey long, c_name string, c_address string, "
        "c_nationkey long, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        files_mod,
        "table",
        lambda s, d, n: crafted if n == "customer" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("customer", crafted.toPandas())
    spark_pdf = files_mod.QUERIES["source_compressed_roundtrip"](
        spark, "crafted://nullnation"
    ).toPandas()
    duck_pdf = duck.sql(
        files_mod.ORACLE["source_compressed_roundtrip"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "source_compressed_roundtrip")
    assert len(spark_pdf) == 2
    assert spark_pdf["codecs_agree"].all()


def test_scratch_sweeps_dead_sibling_dirs(tmp_path, monkeypatch):
    """A scratch dir left by a crashed (dead-pid) process is reclaimed
    on the next process's first scratch use; live-pid dirs survive."""
    import os
    import tempfile as _tf

    from frinesis_spark.sinks import files as sinks_mod

    monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path))
    dead = tmp_path / "frinesis_test_ns_999999"  # pid far above pid_max
    dead.mkdir()
    (dead / "junk").write_text("x")
    live = tmp_path / f"frinesis_test_ns_{os.getpid()}x"  # non-numeric
    live.mkdir()
    sinks_mod._SCRATCH_BASES.clear()
    sinks_mod.scratch_dir("frinesis_test_ns", "k")
    assert not dead.exists()  # dead sibling swept
    assert live.exists()  # non-pid suffix untouched


def test_approx_quantile_all_null_group(spark, monkeypatch):
    """A group whose prices are all NULL grades vacuously TRUE on both
    engines (nothing to grade); real groups stay within tolerance."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    rows = [(i, "A", 100.0 + i) for i in range(20)] + [
        (100 + i, "N", None) for i in range(3)
    ]
    lineitem = spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_extendedprice double"
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: lineitem
        if n == "lineitem"
        else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("lineitem", lineitem.toPandas())
    spark_pdf = rel_mod.QUERIES["agg_approx_quantile"](
        spark, "crafted://nullprice"
    ).toPandas()
    duck_pdf = duck.sql(rel_mod.ORACLE["agg_approx_quantile"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_approx_quantile")
    by = spark_pdf.set_index("l_returnflag")
    assert bool(by.loc["N", "approx_within_tol"])  # vacuous TRUE
    assert by.loc["N"][["p50_exact", "p95_exact"]].isna().all()
    assert bool(by.loc["A", "approx_within_tol"])


# --- review wave 9: streaming windows pins ------------------------------------


def _stage_events(spark, tmp_path, rows):
    d = tmp_path / "sf_crafted"
    d.mkdir()
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "events.parquet"))
    return str(d)


def test_sliding_agg_pre_epoch_timestamps(spark, tmp_path):
    """Pre-1970 events: the sliding-window oracle's old `//` bucketing
    truncated toward zero (one window late) while Spark's window()
    floors — pinned on FLOOR over doubles."""
    import duckdb as _duck

    import frinesis_spark.streaming.windows as w_mod

    pre = datetime.datetime(1969, 12, 31, 23, 58, 0)
    rows = [
        (1, pre, 1, "view", 1.0, "{}"),
        (2, pre + datetime.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (3, _ts(hours=1), 1, "click", 1.0, "{}"),
    ]
    sf = _stage_events(spark, tmp_path, rows)
    spark_pdf = w_mod.QUERIES["stream_sliding_agg"](spark, sf).toPandas()
    duck = _duck.connect()
    duck.register(
        "events", spark.createDataFrame(rows, _EV_SCHEMA).toPandas()
    )
    duck_pdf = duck.sql(w_mod.ORACLE["stream_sliding_agg"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "stream_sliding_agg")
    starts = sorted(spark_pdf["window_start"])
    assert starts[0] == datetime.datetime(1969, 12, 31, 23, 50)  # floored


def test_stream_dedup_multi_batch_late_id_survives(spark, tmp_path):
    """A fresh event_id arriving in a LATER micro-batch with an event
    time far behind the first batch's max must still be emitted — the
    removed watermark previously armed the late-row drop filter and
    silently lost it vs the DISTINCT oracle."""
    import glob
    import os

    from frinesis_spark.streaming.runner import run_append_to_files

    src = tmp_path / "src"
    src.mkdir()
    early = [(1, _ts(hours=5), 1, "view", 1.0, "{}"),
             (2, _ts(hours=6), 1, "view", 1.0, "{}")]
    late = [(3, _ts(hours=1), 2, "view", 1.0, "{}")]  # 4h behind max
    spark.createDataFrame(early, _EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(late, _EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    # One file per trigger → the late file lands in a SECOND batch.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = stream.dropDuplicates(["event_id"]).select("event_id")
    out = run_append_to_files(deduped)
    got = sorted(r.event_id for r in out.collect())
    assert got == [1, 2, 3]  # the late fresh id SURVIVES
