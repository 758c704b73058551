"""Adversarial dual-engine differential tests.

The driver's oracle check runs on the benign synthetic fixture (ASCII
prose, all-long JSON values, single spaces). These tests re-run the
SAME oracle SQL contract on a crafted corpus that the fixture never
exercises — empty strings, single words, runs of spaces, unicode,
boilerplate repetition, PII overlaps, and the whole zoo of JSON value
shapes — so an engine-semantics divergence (the class the r6 review
found in TRY_CAST rounding) surfaces here before fixture drift ever
could.

Known shared assumption (both engines, documented not tested):
``events.props`` is well-formed JSON — DuckDB's JSON_KEYS raises on
malformed input where Spark's from_json yields NULL, so the contract
starts at valid JSON.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.parity import assert_frames_match

# Adversarial documents: (doc_id, text)
_DOCS = [
    (1, "plain words that look entirely ordinary here"),
    (2, ""),  # empty text → one empty-string token on both engines
    (3, "solo"),  # single word: no bigrams
    (4, "double  space   runs       collapse nowhere"),  # empty tokens
    (5, "héllo wörld naïve café crème"),  # latin unicode
    (6, "数据 处理 管道 数据 处理"),  # CJK tokens
    (7, "spam spam spam spam spam spam spam spam"),  # pure boilerplate
    (8, "contact jane.doe@example.com or 555-123-4567 now"),  # PII
    (9, "customer@example.com emailed the customer again"),  # overlap
    (10, "tok " * 600 + "tail"),  # 601 tokens: straddles pack slots
    (11, "a b a b a b a b a b a b"),  # dominant bigram
    (12, "MiXeD CaSe MiXeD case tokens"),  # case-sensitive counting
]

# Adversarial events: (event_id, props) — every JSON value shape the
# per-key long conversion must treat identically on both engines.
_EVENTS = [
    (1, '{"k": 3}'),  # plain long
    (2, '{"k": "7"}'),  # long-as-string
    (3, '{"k": 3.5}'),  # non-integral: NULL (DuckDB TRY_CAST would round)
    (4, '{"k": 3.0}'),  # integral float literal: still NULL by the gate
    (5, '{"k": 1e3}'),  # exponent form: NULL
    (6, '{"k": "+5", "j": 1}'),  # signed string
    (7, '{"k": -6}'),  # negative long
    (8, '{"k": 99999999999999999999999}'),  # BIGINT overflow → NULL
    (9, '{"k": "notanumber"}'),
    (10, '{"k": true}'),  # boolean: NULL
    (11, '{"k": null, "m": 2}'),  # null value: key still counts
    (12, '{"k": {"nested": 1}}'),  # object value: NULL, key counts
    (13, "{}"),  # empty object: zero keys
    (14, '{"other": 1}'),  # k absent
]


@pytest.fixture()
def crafted(spark, monkeypatch):
    """Route every module's catalog.table to the crafted frames and
    register the same data as DuckDB views."""
    import frinesis_spark.operators.scalar as scalar_mod
    import frinesis_spark.operators.text as text_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in _DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    events = spark.createDataFrame(_EVENTS, "event_id long, props string")
    real_table = catalog.table

    def fake_table(s, d, n):
        if n == "documents":
            return docs
        if n == "events":
            return events
        return real_table(s, d, n)

    for mod in (scalar_mod, text_mod):
        monkeypatch.setattr(mod, "table", fake_table)

    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    duck.register("events", events.toPandas())
    return duck


def _diff(spark, duck, queries, oracle, name):
    spark_pdf = queries[name](spark, "crafted://").toPandas()
    duck_pdf = duck.sql(oracle[name]).df()
    assert len(spark_pdf) > 0
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


def test_repetition_filter_adversarial(spark, crafted):
    from frinesis_spark.operators import text

    pdf = _diff(spark, crafted, text.QUERIES, text.ORACLE,
                "text_repetition_filter")
    # Every crafted doc gets a verdict — including empty + single-word.
    assert set(pdf["doc_id"]) == {d[0] for d in _DOCS}


def test_pii_scrub_adversarial(spark, crafted):
    from frinesis_spark.operators import text

    pdf = _diff(spark, crafted, text.QUERIES, text.ORACLE, "text_pii_scrub")
    by_id = pdf.set_index("doc_id")
    assert by_id.loc[8, "n_redactions"] == 2  # email + phone
    # 1 email + 1 standalone term; the 'customer' INSIDE the email is
    # not double-counted (counts follow the chained replacements).
    assert by_id.loc[9, "n_redactions"] == 2


def test_pack_sequences_adversarial(spark, crafted):
    from frinesis_spark.operators import text

    pdf = _diff(spark, crafted, text.QUERIES, text.ORACLE,
                "tokenize_pack_sequences")
    # The 601-token doc participates like any other (concat-and-chunk
    # allows straddling), and every offset is in range.
    assert (pdf["pack_offset"] < text._PACK_CTX).all()
    assert (pdf["pack_offset"] >= 0).all()


def test_scalar_array_map_json_adversarial(spark, crafted):
    from frinesis_spark.operators import scalar

    pdf = _diff(spark, crafted, scalar.QUERIES, scalar.ORACLE,
                "scalar_array_map_json")
    by_id = pdf.set_index("row_id")
    # The value-shape zoo, by the shared integer-literal-gate contract:
    assert by_id.loc[1, "k_map"] == 3
    assert by_id.loc[2, "k_map"] == 7  # long-as-string converts
    for rid in (3, 4, 5, 8, 9, 10, 11, 12):
        assert by_id.loc[rid, ["k_map", "k_json"]].isna().all(), rid
    assert by_id.loc[6, "k_map"] == 5 and by_id.loc[7, "k_map"] == -6
    assert by_id.loc[11, "n_keys"] == 2  # null-valued key still counts
    assert by_id.loc[12, "n_keys"] == 1


# --- dedup operators on a crafted near-dup corpus -------------------------

_BOILER = "the quick brown fox jumps over the lazy dog near the river bank"
_DEDUP_DOCS = [
    # exact-duplicate family (3 copies)
    (1, _BOILER + " one extra"),
    (2, _BOILER + " one extra"),
    (3, _BOILER + " one extra"),
    # near-dup family: long shared prefix, short distinct tails
    (4, _BOILER + " alpha beta gamma delta epsilon"),
    (5, _BOILER + " alpha beta gamma delta zeta"),
    # unrelated docs
    (6, "completely different content goes in this document body here"),
    (7, "yet another unrelated piece of text with its own words"),
    # shorter than one shingle (2 words) — zero pair potential
    (8, "two words"),
    # unicode near-dups
    (9, "héllo wörld naïve café crème brûlée déjà vu encore une fois"),
    (10, "héllo wörld naïve café crème brûlée déjà vu encore une minute"),
    # eval docs (doc_id % 100 == 0) for decontamination
    (100, _BOILER + " alpha beta gamma delta epsilon"),
    (200, "completely unrelated eval prompt that matches nothing else"),
]


@pytest.fixture()
def crafted_dedup(spark, monkeypatch):
    import frinesis_spark.operators.dedup as dedup_mod
    from frinesis_spark import catalog
    from frinesis_spark.caches import clear_derived_caches

    clear_derived_caches()
    docs = spark.createDataFrame(_DEDUP_DOCS, "doc_id long, text string")
    real_table = catalog.table
    monkeypatch.setattr(
        dedup_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    yield duck
    clear_derived_caches()


def _diff_dedup(spark, duck, name, sf_dir):
    from frinesis_spark.operators import dedup

    spark_pdf = dedup.QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.sql(dedup.ORACLE[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


def test_dedup_exact_adversarial(spark, crafted_dedup):
    pdf = _diff_dedup(spark, crafted_dedup, "dedup_exact", "diff://exact")
    by_min = pdf.set_index("doc_id")
    assert by_min.loc[1, "n_copies"] == 3  # the triplet collapses to min id
    assert by_min.loc[4, "n_copies"] == 2  # doc 4 ≡ eval doc 100 (planted)
    assert (pdf["n_copies"] == 1).sum() == len(_DEDUP_DOCS) - 5


def test_dedup_ngram_jaccard_adversarial(spark, crafted_dedup):
    pdf = _diff_dedup(spark, crafted_dedup, "dedup_ngram_jaccard",
                      "diff://ngram")
    pairs = {tuple(r) for r in pdf[["doc_a", "doc_b"]].itertuples(index=False)}
    # The exact triplet yields all three jaccard-1.0 pairs; the tailed
    # near-dups and unicode near-dups cross the 0.5 threshold too.
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    assert (4, 5) in pairs and (9, 10) in pairs
    # Unrelated and sub-shingle docs pair with nothing.
    flat = {d for p in pairs for d in p}
    assert not {6, 7, 8} & flat


def test_dedup_cluster_cc_adversarial(spark, crafted_dedup):
    pdf = _diff_dedup(spark, crafted_dedup, "dedup_cluster_cc",
                      "diff://cc")
    by_doc = pdf.set_index("doc_id")
    # One component per family, labeled by its min doc_id. Note docs 4/5
    # share their prefix with eval doc 100 AND the triplet's boiler
    # opening, so components reflect the 0.5-threshold graph exactly as
    # the oracle's recursive reachability computes it.
    assert by_doc.loc[2, "cluster_id"] == by_doc.loc[1, "cluster_id"]
    assert by_doc.loc[3, "cluster_id"] == by_doc.loc[1, "cluster_id"]
    assert by_doc.loc[5, "cluster_id"] == by_doc.loc[4, "cluster_id"]
    assert by_doc.loc[10, "cluster_id"] == by_doc.loc[9, "cluster_id"]


def test_dedup_decontaminate_adversarial(spark, crafted_dedup):
    pdf = _diff_dedup(spark, crafted_dedup, "dedup_decontaminate",
                      "diff://decon")
    flagged = set(pdf["doc_id"])
    # Eval doc 100 contaminates the shared-prefix family (1-5 all carry
    # ≥3 of its shingles); eval doc 200 matches nothing; eval docs
    # themselves and unrelated docs never appear.
    assert {4, 5} <= flagged
    assert not {100, 200, 6, 7, 8} & flagged


# --- timeseries operators on crafted edge-case events ---------------------

from datetime import datetime as _dt  # noqa: E402


def _ev(eid, ts, uid, value):
    return (eid, ts, uid, "click", value, "{}")


_TS_EVENTS = [
    # user 7 (gapfill-eligible: 7 % 7 == 0): a 30-hour silence inside
    # the span → LOCF must carry one hourly sum across 29 empty hours.
    _ev(1, _dt(2000, 1, 1, 0, 5), 7, 10.0),
    _ev(2, _dt(2000, 1, 1, 0, 40), 7, 2.5),
    _ev(3, _dt(2000, 1, 2, 6, 15), 7, -4.0),  # negative value
    # user 14 (also gapfill-eligible): single event → 1-hour span,
    # one session of duration 0.
    _ev(4, _dt(2000, 1, 1, 12, 0), 14, 0.0),
    # user 3 (NOT gapfill-eligible — must be absent from gapfill):
    # gap of EXACTLY 30 minutes (stays in one session: the split is
    # strictly greater-than), then 30 minutes + 1 µs (splits).
    _ev(5, _dt(2000, 1, 1, 9, 0, 0), 3, 1.0),
    _ev(6, _dt(2000, 1, 1, 9, 30, 0), 3, 1.0),
    _ev(7, _dt(2000, 1, 1, 10, 0, 0, 1), 3, 1.0),
    # user 5: two events with IDENTICAL timestamps (event_id breaks
    # the tie deterministically), plus a null value the sums skip.
    _ev(8, _dt(2000, 1, 8, 8, 0), 5, 3.0),
    _ev(9, _dt(2000, 1, 8, 8, 0), 5, None),
    # retention: user 5 first-seen week of 2000-01-03, active again
    # exactly three weeks later.
    _ev(10, _dt(2000, 1, 24, 9, 0), 5, 1.0),
]


@pytest.fixture()
def crafted_events(spark, monkeypatch):
    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        _TS_EVENTS,
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
    return duck


def _diff_ts(spark, duck, name):
    from frinesis_spark.operators import timeseries

    spark_pdf = timeseries.QUERIES[name](spark, "crafted://ts").toPandas()
    duck_pdf = duck.sql(timeseries.ORACLE[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


def test_gapfill_locf_adversarial(spark, crafted_events):
    pdf = _diff_ts(spark, crafted_events, "time_gapfill_locf")
    assert set(pdf["user_id"]) == {7, 14}  # mod-7 filter applied
    u7 = pdf[pdf["user_id"] == 7].sort_values("hour")
    assert len(u7) == 31  # hours 00:00 Jan 1 .. 06:00 Jan 2 inclusive
    # The empty hours exist (n_events 0) and carry the LOCF sum forward.
    empty = u7[u7["n_events"] == 0]
    assert len(empty) == 29
    assert (empty["locf_value_sum"] == 12.5).all()  # 10.0 + 2.5 carried
    assert empty["value_sum"].isna().all()  # raw observation stays null


def test_session_islands_adversarial(spark, crafted_events):
    pdf = _diff_ts(spark, crafted_events, "window_session_islands")
    u3 = pdf[pdf["user_id"] == 3].sort_values("session_seq")
    # Exactly-30-minute gap does NOT split; 30 min + 1 µs DOES.
    assert list(u3["n_events"]) == [2, 1]
    u5 = pdf[pdf["user_id"] == 5]
    # Identical-timestamp events share one session; the null value is
    # skipped by the sum but counted as an event.
    first = u5.sort_values("session_seq").iloc[0]
    assert first["n_events"] == 2 and first["value_sum"] == 3.0
    u14 = pdf[pdf["user_id"] == 14]
    assert len(u14) == 1 and u14.iloc[0]["duration_seconds"] == 0.0


def test_retention_cohort_adversarial(spark, crafted_events):
    pdf = _diff_ts(spark, crafted_events, "analytics_retention_cohort")
    u5_cohort = pdf[(pdf["week_offset"] == 3)]
    # User 5 returns exactly three weeks after first sight.
    assert len(u5_cohort) == 1
    assert u5_cohort.iloc[0]["retention_rate"] == 1.0


# --- streaming operators on a crafted out-of-order replay -----------------

# One hour-boundary event, a microsecond-before-boundary event, an
# exactly-30-minute session gap, duplicate event_ids, an inclusive
# interval-join boundary, and events inside the final watermark horizon
# — written OUT OF ORDER into a single replay file (one micro-batch).
_STREAM_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (6, _dt(2000, 3, 1, 12, 0, 0), 1, "click", -1.0, "{}"),  # max ts
    (1, _dt(2000, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),  # hour boundary
    (100, _dt(2000, 3, 1, 10, 20, 0), 3, "click", 2.0, "{}"),  # dup id
    (2, _dt(2000, 3, 1, 10, 30, 0), 1, "purchase", 5.0, "{}"),
    (4, _dt(2000, 3, 1, 9, 59, 59, 999999), 2, "click", 1.5, "{}"),
    (3, _dt(2000, 3, 1, 10, 5, 0), 2, "view", 2.0, "{}"),
    (100, _dt(2000, 3, 1, 10, 10, 0), 3, "click", 1.0, "{}"),  # dup id
    (5, _dt(2000, 3, 1, 11, 0, 0), 2, "purchase", 0.5, "{}"),
    (7, _dt(2000, 3, 1, 11, 55, 0), 4, "click", 3.0, "{}"),  # in wm horizon
]


@pytest.fixture(scope="module")
def crafted_stream_dir(tmp_path_factory):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("stream_events")
    pdf = pd.DataFrame(
        _STREAM_EVENTS,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(d / "events.parquet"))
    duck = duckdb.connect()
    duck.register("events", pdf)
    return str(d), duck


def _diff_stream(spark, name, sf_dir, duck):
    from frinesis_spark.streaming import windows

    spark_pdf = windows.QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.sql(windows.ORACLE[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


@pytest.mark.parametrize(
    "name",
    [
        "stream_tumbling_agg",
        "stream_sliding_agg",
        "stream_session_window",
        "stream_watermark_late",
        "stream_dedup_stateful",
        "stream_stream_join",
        "stream_foreach_batch_upsert",
    ],
)
def test_streaming_adversarial(spark, crafted_stream_dir, name):
    sf_dir, duck = crafted_stream_dir
    pdf = _diff_stream(spark, name, sf_dir, duck)
    if name == "stream_dedup_stateful":
        # the duplicated id 100 is emitted exactly once
        assert sorted(pdf["event_id"]) == [1, 2, 3, 4, 5, 6, 7, 100]
    if name == "stream_stream_join":
        # ONE pair: the exactly-30-minute purchase is inclusive; the
        # 55-minute one is out of the interval.
        assert len(pdf) == 1 and pdf.iloc[0]["user_id"] == 1
    if name == "stream_session_window":
        # user 1's exactly-30-minute gap MERGES (probed Spark
        # semantics: a session splits only when the gap STRICTLY
        # exceeds the threshold — this test originally carried the >=
        # assumption and caught the oracle diverging); the 12:00 event
        # opens the second session.
        assert (pdf["user_id"] == 1).sum() == 2
        assert (pdf["user_id"] == 3).sum() == 1  # 10-min gap merges
    if name == "stream_watermark_late":
        # watermark = 12:00 - 10min: the [11:00, 12:00) and [12:00, …)
        # windows are suppressed; the 09:xx and 10:xx windows emit.
        starts = set(pdf["window_start"].dt.hour)
        assert 9 in starts and 10 in starts
        assert 11 not in starts and 12 not in starts


# --- embedding operators with a zero-norm vector --------------------------

# Real embedding corpora contain zero vectors (padding rows, failed
# encodes). vec_id < 10 forms the query set; vec 1 is the all-zero
# query, vec 20 the all-zero candidate. Identical/negated/orthogonal
# vectors pin the exact cosine values ±1/0.
_EMB = [
    (0, [1.0, 0.0, 0.0], 0),
    (1, [0.0, 0.0, 0.0], 0),  # zero-norm QUERY
    (2, [0.6, 0.8, 0.0], 0),
    (20, [0.0, 0.0, 0.0], 1),  # zero-norm candidate
    (21, [1.0, 0.0, 0.0], 1),  # identical to query 0 → cos 1.0
    (22, [-1.0, 0.0, 0.0], 1),  # negated → cos -1.0
    (23, [0.0, 1.0, 0.0], 1),  # orthogonal to query 0 → cos 0.0
    (24, [0.6, 0.8, 0.0], 1),
    (25, [3.0, 4.0, 0.0], 1),  # same direction as 2/24, longer
]


@pytest.fixture()
def crafted_embeddings(spark, monkeypatch):
    import frinesis_spark.operators.dedup as dedup_mod
    import frinesis_spark.operators.similarity as sim_mod
    from frinesis_spark import catalog

    emb = spark.createDataFrame(
        _EMB, "vec_id long, embedding array<float>, label int"
    )
    real_table = catalog.table
    for mod in (sim_mod, dedup_mod):
        monkeypatch.setattr(
            mod,
            "table",
            lambda s, d, n: emb if n == "embeddings" else real_table(s, d, n),
        )
    duck = duckdb.connect()
    duck.register("embeddings", emb.toPandas())
    return duck


def test_topk_cosine_zero_norm_adversarial(spark, crafted_embeddings):
    """Before the r6 try_divide fix this CRASHED the whole job with
    ANSI DIVIDE_BY_ZERO on the zero-norm rows; now zero-norm cosines
    are NULL on both engines and rank last deterministically."""
    from frinesis_spark.operators import similarity

    spark_pdf = similarity.QUERIES["similarity_topk_cosine"](
        spark, "crafted://emb"
    ).toPandas()
    duck_pdf = crafted_embeddings.sql(
        similarity.ORACLE["similarity_topk_cosine"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "similarity_topk_cosine")
    q0 = spark_pdf[spark_pdf["query_id"] == 0].sort_values("rank")
    assert q0.iloc[0]["neighbor_id"] == 21  # identical vector wins
    assert q0.iloc[0]["cos_sim"] == 1.0
    # The zero-norm query emits only NULL cosines, ordered by id.
    q1 = spark_pdf[spark_pdf["query_id"] == 1]
    assert len(q1) == _TOPK_EXPECTED and q1["cos_sim"].isna().all()


_TOPK_EXPECTED = 5


def test_embedding_cosine_pairs_zero_norm_adversarial(
    spark, crafted_embeddings
):
    """The numpy block-pair path yields NaN rows for the zero vector,
    the oracle NULL — both exclude them from the ≥ 0.45 pair set."""
    from frinesis_spark.operators import dedup

    spark_pdf = dedup.QUERIES["dedup_embedding_cosine"](
        spark, "crafted://emb"
    ).toPandas()
    duck_pdf = crafted_embeddings.sql(
        dedup.ORACLE["dedup_embedding_cosine"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "dedup_embedding_cosine")
    pairs = {tuple(r) for r in spark_pdf[["a_id", "b_id"]].itertuples(
        index=False)}
    assert (2, 24) in pairs and (2, 25) in pairs  # same-direction family
    flat = {v for p in pairs for v in p}
    # Zero vectors never pair (NaN/NULL fails the threshold on both
    # engines); the negated vector's cosines are all ≤ 0.
    assert not {1, 20, 22} & flat


def test_quantize_int8_zero_vector_adversarial(spark, crafted_embeddings):
    from frinesis_spark.operators import similarity

    spark_pdf = similarity.QUERIES["embedding_quantize_int8"](
        spark, "crafted://emb"
    ).toPandas()
    duck_pdf = crafted_embeddings.sql(
        similarity.ORACLE["embedding_quantize_int8"]
    ).df()
    assert_frames_match(spark_pdf, duck_pdf, "embedding_quantize_int8")
    z = spark_pdf[spark_pdf["vec_id"] == 1].iloc[0]
    assert z["q_scale"] == 0.0 and z["q_min"] == 0 and z["q_max"] == 0


# --- fuzzy edit-distance: blocking boundaries + the unicode contract ------

_PFX = "SAMEPRFX "  # 8-char blocking prefix (+1 space)
_FUZZY_DOCS = [
    # Same prefix + same length bucket, distances straddling the ≤25 bar
    (1, _PFX + "a" * 50),
    (2, _PFX + "a" * 25 + "b" * 25),  # distance 25 → IN (≤ _EDIT_MAX)
    (3, _PFX + "a" * 24 + "b" * 26),  # distance 26 from doc 1 → OUT
    # Length-bucket boundary: distance 1 from doc 5, but len 79 vs 80
    # falls in different ÷10 buckets → blocked apart BY CONTRACT.
    (5, _PFX + "c" * 70),  # len 79
    (6, _PFX + "c" * 71),  # len 80
    # Different first-8 prefix, otherwise identical → blocked apart.
    (7, "OTHRPRFX " + "a" * 50),
]


def test_fuzzy_editdist_blocking_adversarial(spark, monkeypatch):
    import frinesis_spark.operators.dedup as dedup_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(_FUZZY_DOCS, "doc_id long, text string")
    real_table = catalog.table
    monkeypatch.setattr(
        dedup_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())

    from frinesis_spark.operators import dedup

    spark_pdf = dedup.QUERIES["dedup_fuzzy_editdist"](
        spark, "crafted://fuzzy"
    ).toPandas()
    duck_pdf = duck.sql(dedup.ORACLE["dedup_fuzzy_editdist"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "dedup_fuzzy_editdist")
    pairs = {
        tuple(r)
        for r in spark_pdf[["doc_a", "doc_b"]].itertuples(index=False)
    }
    assert (1, 2) in pairs  # distance exactly at the threshold
    assert (1, 3) not in pairs  # one past it
    assert (5, 6) not in pairs  # length-bucket blocking contract
    assert not any(7 in p for p in pairs)  # prefix blocking contract
    by_pair = spark_pdf.set_index(["doc_a", "doc_b"])
    assert by_pair.loc[(1, 2), "edit_dist"] == 25


def test_levenshtein_unicode_contract():
    """Pin the DECLARED divergence: Spark counts codepoint edits (the
    text-dedup semantic this engine defines), DuckDB counts bytes —
    which is why the fuzzy oracle is only run on ASCII corpora. If
    either engine changes, this test fails and the contract note in
    dedup.py must be revisited."""
    d = duckdb.sql(
        "SELECT levenshtein('café', 'cafe'), levenshtein('数据', '数理')"
    ).fetchone()
    assert d == (2, 3)  # byte edits


# --- as-of join ties and histogram bucket edges ---------------------------


def test_join_asof_tie_semantics_adversarial(spark, monkeypatch):
    """A view at EXACTLY the purchase timestamp matches (inclusive
    as-of); multiple same-ts views are deterministic; purchases with
    no prior view drop out."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    E = [
        # user 1: view at exactly the purchase ts → inclusive match
        (1, _dt(2001, 1, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, _dt(2001, 1, 1, 10, 0, 0), 1, "purchase", 9.0, "{}"),
        # user 2: two views at the same ts, then a later purchase
        (3, _dt(2001, 1, 1, 9, 0, 0), 2, "view", 1.0, "{}"),
        (4, _dt(2001, 1, 1, 9, 0, 0), 2, "view", 1.0, "{}"),
        (5, _dt(2001, 1, 1, 11, 0, 0), 2, "purchase", 5.0, "{}"),
        # user 3: purchase BEFORE any view → excluded
        (6, _dt(2001, 1, 1, 8, 0, 0), 3, "purchase", 2.0, "{}"),
        (7, _dt(2001, 1, 1, 9, 0, 0), 3, "view", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        E,
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

    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["join_asof"](
        spark, "crafted://asof"
    ).toPandas()
    duck_pdf = duck.sql(relational.ORACLE["join_asof"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "join_asof")
    by_id = spark_pdf.set_index("event_id")
    assert by_id.loc[2, "view_ts"] == by_id.loc[2, "purchase_ts"]  # inclusive
    assert by_id.loc[5, "view_ts"] == _dt(2001, 1, 1, 9, 0, 0)
    assert 6 not in by_id.index  # no prior view → dropped


def test_histogram_bucket_edges_adversarial(spark, monkeypatch):
    """Orders priced exactly ON bucket boundaries, at the range limits,
    and outside the range — width_bucket must agree across engines."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    prices = [0.0, 59999.99, 60000.0, 120000.0, 599999.99, 600000.0,
              700000.0, -5.0, 0.01]
    O = [
        (i, i, "F", p, _dt(2001, 1, 1), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    orders = spark.createDataFrame(
        O,
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

    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["agg_histogram"](
        spark, "crafted://hist"
    ).toPandas()
    duck_pdf = duck.sql(relational.ORACLE["agg_histogram"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_histogram")
    buckets = dict(
        zip(
            spark_pdf["bucket_min"], spark_pdf["price_bucket"], strict=False
        )
    )
    assert buckets[60000.0] == 2  # boundary value opens the NEXT bucket
    assert buckets[600000.0] == 11  # upper limit → overflow bucket
    assert buckets[-5.0] == 0  # below range → underflow bucket


# --- OHLC tie-breaks and CDC-merge edge keys ------------------------------


def test_ohlc_tie_break_adversarial(spark, monkeypatch):
    """Same-timestamp events inside a bar: open/close resolve by the
    (ts, event_id) struct key deterministically; a bar-boundary event
    at exactly :15:00 opens the NEXT bar."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    E = [
        # user 1, bar 10:00-10:15: two events at the same instant —
        # event_id 1 is open, event_id 2 is close; extremes from id 3.
        (1, _dt(2001, 5, 1, 10, 0, 0), 1, "tick", 5.0, "{}"),
        (2, _dt(2001, 5, 1, 10, 0, 0), 1, "tick", 7.0, "{}"),
        (3, _dt(2001, 5, 1, 10, 7, 0), 1, "tick", -2.0, "{}"),
        # exactly on the bar boundary → next bar's open AND close
        (4, _dt(2001, 5, 1, 10, 15, 0), 1, "tick", 9.0, "{}"),
    ]
    events = spark.createDataFrame(
        E,
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

    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["time_ohlc_bars"](
        spark, "crafted://ohlc"
    ).toPandas()
    duck_pdf = duck.sql(relational.ORACLE["time_ohlc_bars"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "time_ohlc_bars")
    bars = spark_pdf.set_index("bar_start")
    b1 = bars.loc[_dt(2001, 5, 1, 10, 0, 0)]
    assert b1["open"] == 5.0 and b1["close"] == -2.0
    assert b1["high"] == 7.0 and b1["low"] == -2.0
    b2 = bars.loc[_dt(2001, 5, 1, 10, 15, 0)]
    assert b2["open"] == 9.0 and b2["close"] == 9.0 and b2["n_events"] == 1


def test_merge_upsert_edge_keys_adversarial(spark, monkeypatch):
    """Key 91 (7·13) is BOTH re-priced and key-offset-inserted from the
    same row, and a pre-existing row at an insert's target key
    (13 + 10M) is overwritten by the insert — both engines agree."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    O = [
        (7, 1, "F", 100.0, _dt(2001, 1, 1), "1-URGENT"),  # update only
        (13, 2, "F", 200.0, _dt(2001, 1, 1), "1-URGENT"),  # insert only
        (91, 3, "F", 300.0, _dt(2001, 1, 1), "1-URGENT"),  # both classes
        (3, 4, "F", 400.0, _dt(2001, 1, 1), "1-URGENT"),  # untouched
        (10_000_013, 5, "O", 999.0, _dt(2001, 1, 1), "1-URGENT"),  # collides
    ]
    orders = spark.createDataFrame(
        O,
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

    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["merge_upsert"](
        spark, "crafted://merge"
    ).toPandas()
    duck_pdf = duck.sql(relational.ORACLE["merge_upsert"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "merge_upsert")
    by_key = spark_pdf.set_index("o_orderkey")
    assert by_key.loc[7, "o_totalprice"] == 110.0  # re-priced
    assert by_key.loc[91, "o_orderstatus"] == "U"  # updated in place…
    assert by_key.loc[10_000_091, "o_totalprice"] == 300.0  # …and inserted
    assert by_key.loc[10_000_013, "o_totalprice"] == 200.0  # overwritten
    assert by_key.loc[3, "o_totalprice"] == 400.0  # untouched passthrough


# --- exact-percentile interpolation edges ---------------------------------


def test_percentile_interpolation_adversarial(spark, monkeypatch):
    """Interpolation at its trickiest: 2-row and 3-row groups, a group
    where p95 falls strictly between the top two values, a
    single-row group, and duplicated values. F.percentile and
    QUANTILE_CONT must interpolate identically (to 6-dp rounding)."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    rows = []
    # group A: two rows → every percentile is a straight interpolation
    rows += [("A", 10.0), ("A", 20.0)]
    # group N: three rows incl. a duplicate value
    rows += [("N", 1.0), ("N", 1.0), ("N", 100.0)]
    # group R: 21 rows 0..200 step 10 → p95 = 190.0 exactly? no:
    # 0.95*(21-1)=19 → element 19 = 190.0 (exact index hit)
    rows += [("R", float(i * 10)) for i in range(21)]
    li = spark.createDataFrame(
        [(i, rf, v) for i, (rf, v) in enumerate(rows)],
        "l_orderkey long, l_returnflag string, l_extendedprice double",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: li if n == "lineitem" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("lineitem", li.toPandas())

    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["agg_percentile"](
        spark, "crafted://pct"
    ).toPandas()
    duck_pdf = duck.sql(relational.ORACLE["agg_percentile"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_percentile")
    by_g = spark_pdf.set_index("l_returnflag")
    assert by_g.loc["A", "p50"] == 15.0  # midpoint interpolation
    assert by_g.loc["A", "p95"] == 19.5  # 10 + 0.95*10
    assert by_g.loc["N", "p50"] == 1.0  # duplicate value holds the median
    assert by_g.loc["R", "p95"] == 190.0  # exact index hit


# --- statistical aggregates on degenerate (zero-variance) groups ----------


def test_stats_corr_zero_variance_adversarial(spark, monkeypatch):
    """A constant column inside one group used to KILL the whole job
    (F.corr throws ANSI DIVIDE_BY_ZERO); the composed
    covar_pop/(σ·σ) form yields NULL, matching DuckDB. Single-row
    groups NULL their sample stats on both engines."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    rows = [
        # group A: constant quantity → corr NULL, stddev fine
        (1, "A", 5.0, 10.0),
        (2, "A", 5.0, 30.0),
        # group N: healthy correlated pair
        (3, "N", 1.0, 10.0),
        (4, "N", 2.0, 20.0),
        (5, "N", 3.0, 30.0),
        # group R: single row → corr/covar/stddev all NULL
        (6, "R", 4.0, 40.0),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_returnflag string, "
        "l_quantity double, l_extendedprice double",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: li if n == "lineitem" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("lineitem", li.toPandas())

    from frinesis_spark.operators import relational

    for name in ("agg_stats_corr", "agg_regression"):
        spark_pdf = relational.QUERIES[name](
            spark, "crafted://stats"
        ).toPandas()
        duck_pdf = duck.sql(relational.ORACLE[name]).df()
        assert_frames_match(spark_pdf, duck_pdf, name)
        if name == "agg_stats_corr":
            by_g = spark_pdf.set_index("l_returnflag")
            assert by_g.loc["A", :].isna()["qty_price_corr"]
            assert by_g.loc["N", "qty_price_corr"] == 1.0
            assert by_g.loc["R", :].isna()["price_stddev"]


def test_text_scoring_suite_adversarial(spark, crafted):
    """quality_score / language_id / fingerprint over the adversarial
    corpus — including the EMPTY document, which used to kill
    quality_score with ANSI DIVIDE_BY_ZERO on length(text) = 0
    (try_divide now NULLs alpha_ratio + score, matching DuckDB)."""
    from frinesis_spark.operators import text

    pdf = _diff(spark, crafted, text.QUERIES, text.ORACLE,
                "text_quality_score")
    empty = pdf[pdf["doc_id"] == 2].iloc[0]
    assert empty["n_tokens"] == 1  # split('') → one empty token
    import math

    assert math.isnan(empty["alpha_ratio"]) or empty["alpha_ratio"] is None
    _diff(spark, crafted, text.QUERIES, text.ORACLE, "text_language_id")
    _diff(spark, crafted, text.QUERIES, text.ORACLE, "text_fingerprint")


def test_time_range_frame_boundary_adversarial(spark, monkeypatch):
    """RANGE frame boundaries: an event exactly one hour earlier is
    INSIDE the trailing frame (inclusive PRECEDING bound), one
    microsecond past it is outside, and same-instant peers count each
    other (RANGE, not ROWS)."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    E = [
        (1, _dt(2001, 7, 1, 9, 0, 0), 1, "tick", 1.0, "{}"),
        # exactly one hour later → event 1 is inside its frame
        (2, _dt(2001, 7, 1, 10, 0, 0), 1, "tick", 2.0, "{}"),
        # one microsecond past the hour from event 1 → event 1 outside
        (3, _dt(2001, 7, 1, 10, 0, 0, 1), 1, "tick", 4.0, "{}"),
        # same-instant peers: RANGE frames include BOTH at that ts
        (4, _dt(2001, 7, 1, 12, 0, 0), 2, "tick", 8.0, "{}"),
        (5, _dt(2001, 7, 1, 12, 0, 0), 2, "tick", 16.0, "{}"),
    ]
    events = spark.createDataFrame(
        E,
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

    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["window_time_range"](
        spark, "crafted://range"
    ).toPandas()
    duck_pdf = duck.sql(relational.ORACLE["window_time_range"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "window_time_range")
    by_id = spark_pdf.set_index("event_id")
    assert by_id.loc[2, "n_events_1h"] == 2  # exactly-1h event included
    assert by_id.loc[3, "n_events_1h"] == 2  # event 1 aged out, 2 inside
    assert by_id.loc[4, "n_events_1h"] == 2  # same-instant peer counted
    assert by_id.loc[4, "value_sum_1h"] == 24.0
    assert by_id.loc[5, "value_sum_1h"] == 24.0


# --- NULL-key relational semantics (r7 sweep) -----------------------------


@pytest.fixture()
def crafted_nullkeys(spark, monkeypatch):
    """customer/orders with NULL join keys and NULL dimension values —
    the shapes three-valued logic and null-safe set semantics disagree
    on, which the NULL-free fixture can never reach."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    customer = spark.createDataFrame(
        [
            (1, "alice", "BUILDING"),
            (2, "bob", "AUTO"),
            (3, "carol", "BUILDING"),
            (None, "nobody", "BUILDING"),  # NULL probe key
            (5, "dave", None),  # NULL segment (set-op side)
        ],
        "c_custkey long, c_name string, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "F", 100.0, "1-URGENT"),
            (11, None, "O", 50.0, "2-URGENT"),  # NULL build key, URGENT
            (12, 2, "O", 70.0, "3-LOW"),
            (13, None, "F", 30.0, "4-LOW"),  # NULL buyer key
            (14, 1, "F", 100.0, "5-LOW"),  # duplicate buyer
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string",
    )
    real_table = catalog.table

    def fake_table(s, d, n):
        if n == "customer":
            return customer
        if n == "orders":
            return orders
        return real_table(s, d, n)

    monkeypatch.setattr(rel_mod, "table", fake_table)
    duck = duckdb.connect()
    # Arrow, not pandas: pandas widens nullable long to float64, which
    # the canonical compare would flag as a phantom 1 vs 1.0 mismatch.
    duck.register("customer", customer.toArrow())
    duck.register("orders", orders.toArrow())
    return duck


def _rel_diff(spark, duck, name, min_rows=1):
    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES[name](spark, "crafted://nulls").toPandas()
    duck_pdf = duck.sql(relational.ORACLE[name]).df()
    assert len(spark_pdf) >= min_rows
    assert_frames_match(spark_pdf, duck_pdf, name)
    return spark_pdf


def test_join_anti_null_build_key_adversarial(spark, crafted_nullkeys):
    """THE NOT-IN trap: one NULL custkey among the urgent orders. The
    old NOT IN oracle returned ZERO rows (three-valued logic); Spark's
    left_anti — and the NOT EXISTS oracle that now pins it — keeps
    every customer without a matching urgent order, including the
    NULL-key customer (NULL matches nothing)."""
    pdf = _rel_diff(spark, crafted_nullkeys, "join_anti")
    kept = set(pdf["c_name"])
    # alice has the only non-null URGENT order; everyone else survives.
    assert kept == {"bob", "carol", "nobody", "dave"}


def test_join_semi_null_keys_adversarial(spark, crafted_nullkeys):
    """Semi join (IN oracle): a NULL probe key matches nothing on both
    engines, and NULL build keys never produce a match."""
    pdf = _rel_diff(spark, crafted_nullkeys, "join_semi")
    assert set(pdf["c_name"]) == {"alice", "bob"}


def test_join_left_outer_null_keys_adversarial(spark, crafted_nullkeys):
    """LEFT JOIN: NULL keys on either side never match — the NULL-key
    customer surfaces with NULL order columns, NULL-key orders vanish."""
    pdf = _rel_diff(spark, crafted_nullkeys, "join_left_outer")
    nobody = pdf[pdf["c_mktsegment"].notna() & pdf["c_custkey"].isna()]
    assert len(nobody) == 1 and nobody["o_orderkey"].isna().all()


def test_set_ops_null_member_adversarial(spark, crafted_nullkeys):
    """Set-op NULL semantics: INTERSECT/EXCEPT/UNION-DISTINCT treat
    NULL = NULL (null-safe set equality) on BOTH engines — a NULL
    buyer key dedupes to one UNION row and is eligible for INTERSECT
    membership, unlike join equality."""
    pdf = _rel_diff(spark, crafted_nullkeys, "set_union_except_intersect")
    union_rows = pdf[pdf["set_op"] == "union"]
    # buyers {1, 2, NULL} ∪ building {1, 3, NULL} → {1, 2, 3, NULL}
    assert len(union_rows) == 4
    assert union_rows["custkey"].isna().sum() == 1
    inter = pdf[pdf["set_op"] == "intersect"]
    # null-safe intersect: {1, NULL}
    assert len(inter) == 2 and inter["custkey"].isna().sum() == 1


def test_rollup_cube_null_group_value_adversarial(spark, monkeypatch):
    """A NULL in the DATA of a grouping column is distinguishable from
    the rolled-up total row only via GROUPING() — both engines must
    agree on every (value, grouping-flag) combination and on the
    NULL-group aggregates themselves."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    lineitem = spark.createDataFrame(
        [
            ("A", "F", 1.0),
            ("A", None, 2.0),  # NULL data value in a grouped column
            (None, "F", 4.0),
            (None, None, 8.0),  # both NULL: collides with 3 total rows
            ("B", "O", 16.0),
        ],
        "l_returnflag string, l_linestatus string, l_quantity double",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: lineitem if n == "lineitem" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("lineitem", lineitem.toPandas())
    pdf = _rel_diff(spark, duck, "agg_rollup_cube", min_rows=10)
    # The (NULL, NULL) DATA group must exist with grouping flags (0,0)
    # and sum 8 — distinct from the grand total (1,1) summing 31.
    cube = pdf[pdf["gs_src"] == "cube"]
    data_nn = cube[
        cube["l_returnflag"].isna()
        & cube["l_linestatus"].isna()
        & (cube["g_flag"] == 0)
        & (cube["g_status"] == 0)
    ]
    assert len(data_nn) == 1 and float(data_nn["sum_qty"].iloc[0]) == 8.0
    total = cube[(cube["g_flag"] == 1) & (cube["g_status"] == 1)]
    assert len(total) == 1 and float(total["sum_qty"].iloc[0]) == 31.0


def test_string_agg_all_null_group_adversarial(spark, monkeypatch):
    """An all-NULL group must aggregate to NULL, not '' — the
    collect_list→array_join composition silently maps empty to
    empty-string where SQL STRING_AGG is NULL (r7 find, fixed via
    _string_agg)."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    nation = spark.createDataFrame(
        [
            (0, "ALGERIA", 0),
            (1, None, 0),  # NULL name inside a mixed group
            (2, None, 1),  # all-NULL group
            (3, None, 1),
        ],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: nation if n == "nation" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("nation", nation.toPandas())
    pdf = _rel_diff(spark, duck, "agg_string_concat", min_rows=2)
    by_region = pdf.set_index("n_regionkey")
    assert by_region.loc[0, "nations_csv"] == "ALGERIA"  # NULL dropped
    assert by_region.loc[1, "nations_csv"] is None or (
        by_region.loc[1, "nations_csv"] != by_region.loc[1, "nations_csv"]
    )  # NULL (pandas NaN), never ''
    assert int(by_region.loc[1, "n_nations"]) == 2  # COUNT(*) still 2


def test_ranking_null_value_ordering_adversarial(spark, monkeypatch):
    """Spark's bare ASC sorts NULLS FIRST; DuckDB (and the SQL
    convention the oracles rely on) sorts NULLS LAST — on a nullable
    price every ranking value diverges unless the operator pins
    asc_nulls_last, which it now does. A NULL-price order must rank
    LAST within its partition on both engines, and first_value must
    never pick it as 'cheapest'."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    orders = spark.createDataFrame(
        [
            (1, 1, "F", 10.0, "1-URGENT"),
            (2, 1, "F", None, "1-URGENT"),  # NULL price, same partition
            (3, 1, "F", 30.0, "1-URGENT"),
            (4, 2, "O", None, "2-HIGH"),  # NULL price alone in partition
            (5, 2, "O", 5.0, "2-HIGH"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: orders if n == "orders" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("orders", orders.toArrow())

    from frinesis_spark.operators import relational

    for name in ("window_ranking_suite", "window_first_last"):
        spark_pdf = relational.QUERIES[name](spark, "crafted://").toPandas()
        duck_pdf = duck.sql(relational.ORACLE[name]).df()
        assert_frames_match(spark_pdf, duck_pdf, name)

    suite = (
        relational.QUERIES["window_ranking_suite"](spark, "crafted://")
        .toPandas()
        .set_index("o_orderkey")
    )
    assert suite.loc[2, "price_rank"] == 3  # NULL price ranks LAST
    fl = (
        relational.QUERIES["window_first_last"](spark, "crafted://")
        .toPandas()
        .set_index("o_orderkey")
    )
    assert fl.loc[1, "cheapest_key"] == 1  # not the NULL-price row
    assert fl.loc[1, "priciest_key"] == 2  # NULLS LAST → frame end
    assert fl.loc[4, "cheapest_key"] == 5


def test_variant_shred_value_zoo_adversarial(spark, monkeypatch):
    """One non-integer $.k used to CRASH the whole job (bare ANSI cast
    in the payload doubling — the r6 divide-by-zero job-kill class).
    The integer-literal gate now drops non-integral/overflow k rows on
    both engines; surviving rows shred identically."""
    import frinesis_spark.operators.scalar as scalar_mod
    from frinesis_spark import catalog
    from frinesis_spark.operators import scalar

    events = spark.createDataFrame(
        [(i, props, f"t{i % 2}") for i, props in _EVENTS],
        "event_id long, props string, event_type string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        scalar_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("events", events.toArrow())
    spark_pdf = scalar.QUERIES["scalar_variant_shred"](
        spark, "crafted://"
    ).toPandas()
    duck_pdf = duck.sql(scalar.ORACLE["scalar_variant_shred"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "scalar_variant_shred")
    # Survivors of the _EVENTS zoo: plain/stringy/signed integer ks
    # (ids 1, 2, 6, 7); 3.5 / 3.0 / 1e3 / overflow / notanumber /
    # true / null / nested / absent are all gated out, not crashes.
    assert int(spark_pdf["n_events"].sum()) == 4


def test_pivot_null_dimension_adversarial(spark, monkeypatch):
    """NULL pivot values fall into no bucket (zero counts after the
    coalesce) and a NULL groupBy key forms its own row — identically
    on both engines."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    orders = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, "1-URGENT"),
            (2, 1, None, 20.0, "1-URGENT"),  # NULL status: no bucket
            (3, 2, "F", 40.0, None),  # NULL priority: its own group row
            (4, 3, None, 80.0, None),  # both NULL
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        rel_mod,
        "table",
        lambda s, d, n: orders if n == "orders" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("orders", orders.toArrow())
    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["agg_pivot"](spark, "crafted://").toPandas()
    duck_pdf = duck.sql(relational.ORACLE["agg_pivot"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "agg_pivot")
    by_prio = spark_pdf.set_index("o_orderpriority")
    assert int(by_prio.loc["1-URGENT", "O_n"]) == 1  # NULL status uncounted
    null_row = spark_pdf[spark_pdf["o_orderpriority"].isna()]
    assert len(null_row) == 1 and int(null_row["F_n"].iloc[0]) == 1


def test_join_asof_tolerance_boundary_adversarial(spark, monkeypatch):
    """The 30-minute lookback at its exact boundary: a view EXACTLY
    30 minutes before the purchase matches (<= tolerance, inclusive);
    one second older falls out — identically on both engines."""
    import frinesis_spark.operators.relational as rel_mod
    from frinesis_spark import catalog

    E = [
        # user 1: view exactly 30:00 before purchase → INCLUDED
        (1, _dt(2001, 1, 1, 9, 30, 0), 1, "view", 1.0, "{}"),
        (2, _dt(2001, 1, 1, 10, 0, 0), 1, "purchase", 9.0, "{}"),
        # user 2: view 30:01 before purchase → EXCLUDED (row drops)
        (3, _dt(2001, 1, 1, 9, 29, 59), 2, "view", 1.0, "{}"),
        (4, _dt(2001, 1, 1, 10, 0, 0), 2, "purchase", 5.0, "{}"),
        # user 3: stale view, then a fresh one inside the window — the
        # fresh one wins (latest-at-or-before, then tolerance filter)
        (5, _dt(2001, 1, 1, 8, 0, 0), 3, "view", 1.0, "{}"),
        (6, _dt(2001, 1, 1, 9, 45, 0), 3, "view", 1.0, "{}"),
        (7, _dt(2001, 1, 1, 10, 0, 0), 3, "purchase", 2.0, "{}"),
    ]
    events = spark.createDataFrame(
        E,
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

    from frinesis_spark.operators import relational

    spark_pdf = relational.QUERIES["join_asof_tolerance"](
        spark, "crafted://asof_tol"
    ).toPandas()
    duck_pdf = duck.sql(relational.ORACLE["join_asof_tolerance"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "join_asof_tolerance")
    matched_users = set(spark_pdf["user_id"])
    assert matched_users == {1, 3}
    u3 = spark_pdf[spark_pdf["user_id"] == 3]
    assert u3["view_ts"].iloc[0] == _dt(2001, 1, 1, 9, 45, 0)


def test_case_folding_unicode_contract(spark):
    """Pin the DECLARED case-folding divergence (the levenshtein
    pattern): Java/Spark lowercases 'İ' to 'i' + COMBINING DOT ABOVE
    and uppercases 'ß' to 'SS', where DuckDB maps them to 'i' and 'ẞ'.
    The engine's only case-folding operator (scalar_string_date_math's
    UPPER on o_orderstatus) runs on single ASCII chars, so oracle
    parity is exact; any future operator case-folding USER text must
    either declare Spark's semantics or restrict to ASCII. If either
    engine changes, this test fails and the contract note moves."""
    s = spark.sql(
        "SELECT lower('İ') AS l, upper('ß') AS u"
    ).collect()[0]
    assert s.l == "i̇" and s.u == "SS"  # Java semantics
    d = duckdb.sql("SELECT LOWER('İ'), UPPER('ß')").fetchone()
    assert d == ("i", "ẞ")  # DuckDB semantics — deliberately different


def test_csv_roundtrip_lossless_adversarial(spark, monkeypatch):
    """The CSV writer/reader pair must be LOSSLESS on hostile values:
    empty string vs NULL (the '\\N' sentinel), embedded commas,
    quotes, newlines, and padded whitespace (the bare defaults
    corrupted three of these — r7 finds). The oracle reads the
    ORIGINAL table, so parity == losslessness."""
    import frinesis_spark.sources.files as files_mod
    from frinesis_spark import catalog

    nation = spark.createDataFrame(
        [
            (0, "plain", 0),
            (1, "", 0),  # empty ≠ NULL
            (2, None, 0),
            (3, "with,comma", 1),
            (4, 'quo"te', 1),
            (5, "line\nbreak", 1),
            (6, " pad ", 2),
        ],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        files_mod,
        "table",
        lambda s, d, n: nation if n == "nation" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("nation", nation.toArrow())
    from frinesis_spark.sources import files

    spark_pdf = files.QUERIES["source_csv_roundtrip"](
        spark, "crafted://csv"
    ).toPandas()
    duck_pdf = duck.sql(files.ORACLE["source_csv_roundtrip"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "source_csv_roundtrip")
    by_region = spark_pdf.set_index("n_regionkey")
    # region 0's MIN over {'plain', '', NULL} is '' — NULL ignored,
    # empty NOT conflated to NULL (the value the old defaults lost)
    assert by_region.loc[0, "first_nation"] == ""
    assert by_region.loc[2, "first_nation"] == " pad "  # not trimmed
    # region 1 keeps all 3 rows: the newline row did NOT split
    assert int(by_region.loc[1, "n_nations"]) == 3
