"""Round-7 additions: substring-chunk dedup, mixture resampling,
deterministic shuffle-shard, M4 downsampling, clustered-sort layout.

Each operator gets (a) an adversarial dual-engine differential run on
a crafted frame the fixture never exercises, pinning the declared
contract edges, and (b) where the operator's value is physical layout
(clustered sink) or an invariant (shard density/stability), direct
assertions the oracle hash-compare cannot see.
"""

from __future__ import annotations

import datetime
import glob
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from tests.parity import assert_frames_match

# ---------------------------------------------------------------- chunks

_C = 64  # mirrors dedup._CHUNK_CHARS

_BASE = "x" * _C + "y" * _C  # two clean chunks
_DOCS_CHUNKS = [
    (1, _BASE),  # \ identical pair: every chunk duplicated
    (2, _BASE),  # /
    (3, "z" + _BASE),  # one-char shift: NO chunk shared (aligned contract)
    (4, "short unique text"),  # sub-chunk doc, unique
    (5, ""),  # \ empty pair: shares the single '' chunk
    (6, ""),  # /
    (7, "a" * _C + "b" * _C),  # chunk 2 == doc 8 chunk 1 (position-free)
    (8, "b" * _C + "c" * _C),
    (9, "d" * _C + "d" * _C),  # within-doc repeat only: df=1, NOT dup
]


@pytest.fixture()
def crafted_docs_chunks(spark, monkeypatch):
    import frinesis_spark.operators.dedup as dedup_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in _DOCS_CHUNKS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        dedup_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    return duck


def test_substring_chunks_adversarial(spark, crafted_docs_chunks):
    from frinesis_spark.operators import dedup

    pdf = dedup.QUERIES["dedup_substring_chunks"](spark, "crafted://").toPandas()
    duck_pdf = crafted_docs_chunks.sql(
        dedup.ORACLE["dedup_substring_chunks"]
    ).df()
    assert_frames_match(pdf, duck_pdf, "dedup_substring_chunks")
    by_id = pdf.set_index("doc_id")
    # Identical pair: fully duplicated.
    assert by_id.loc[1, "dup_chunks"] == 2 and by_id.loc[1, "dup_frac"] == 1.0
    assert by_id.loc[2, "dup_chunks"] == 2
    # One-char shift breaks every aligned boundary — the declared miss.
    assert by_id.loc[3, "dup_chunks"] == 0 and by_id.loc[3, "n_chunks"] == 3
    # Sub-chunk unique doc: one chunk, clean.
    assert by_id.loc[4, "n_chunks"] == 1 and by_id.loc[4, "dup_chunks"] == 0
    # Empty docs share the '' chunk (and nothing else matches it —
    # doc 4 is shorter than a chunk but non-empty).
    assert by_id.loc[5, "n_chunks"] == 1 and by_id.loc[5, "dup_chunks"] == 1
    # Aligned chunks match at DIFFERENT positions across docs.
    assert by_id.loc[7, "dup_chunks"] == 1 and by_id.loc[8, "dup_chunks"] == 1
    # Within-doc repetition alone is not cross-doc duplication.
    assert by_id.loc[9, "dup_chunks"] == 0


# --------------------------------------------------------------- mixture


@pytest.fixture()
def crafted_docs_mixture(spark, monkeypatch):
    import frinesis_spark.operators.text as text_mod
    from frinesis_spark import catalog

    rows = [
        (i, f"text {i}", "en", "src_big", 10) for i in range(100)
    ] + [
        (1000 + i, f"rare {i}", "de", "src_small", 10) for i in range(3)
    ]
    docs = spark.createDataFrame(
        rows,
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
    return duck


def test_source_mixture_adversarial(spark, crafted_docs_mixture):
    from frinesis_spark.operators import text

    pdf = text.QUERIES["pipeline_source_mixture"](spark, "crafted://").toPandas()
    duck_pdf = crafted_docs_mixture.sql(
        text.ORACLE["pipeline_source_mixture"]
    ).df()
    assert_frames_match(pdf, duck_pdf, "pipeline_source_mixture")
    # Under-represented source (3 < target 8): kept IN FULL — the rule
    # bucket*3 < 80000 admits every bucket.
    small = pdf[pdf["source"] == "src_small"]
    assert len(small) == 3
    # Over-represented source is thinned toward the target: keep rate
    # is 800/10000 over 100 docs ⇒ expectation 8; the md5 buckets are
    # fixed, so the count is deterministic — pin a generous envelope
    # and the exact self-adjustment property (rate ∝ 1/n_source).
    big = pdf[pdf["source"] == "src_big"]
    assert 1 <= len(big) <= 20
    assert (big["mix_bucket"] * 100 < text._MIX_TARGET * text._MIX_RES).all()


# ----------------------------------------------------------------- shard


def test_shuffle_shard_invariants(spark, sf_dir):
    from frinesis_spark.operators import text

    pdf = text.QUERIES["pipeline_shuffle_shard"](spark, sf_dir).toPandas()
    n = len(pdf)
    assert pdf["doc_id"].is_unique
    # Positions are dense 0..n_s-1 within every shard.
    for sid, grp in pdf.groupby("shard_id"):
        pos = sorted(grp["pos_in_shard"])
        assert pos == list(range(len(grp)))
    # md5 buckets spread shards to within a loose balance envelope.
    sizes = pdf.groupby("shard_id").size()
    assert len(sizes) == text._N_SHARDS
    assert sizes.max() <= 2 * max(1, n // text._N_SHARDS)


def test_shuffle_shard_reshard_stable(spark, sf_dir, monkeypatch):
    """The assignment is a pure function of doc_id: re-sharding the
    input (different partitioning, different arrival order) must
    produce the identical (doc_id, shard_id, pos_in_shard) mapping."""
    import frinesis_spark.operators.text as text_mod
    from frinesis_spark import catalog

    base = text_mod.QUERIES["pipeline_shuffle_shard"](spark, sf_dir).toPandas()
    real_table = catalog.table

    def shuffled_table(s, d, n):
        df = real_table(s, d, n)
        return df.repartition(13) if n == "documents" else df

    monkeypatch.setattr(text_mod, "table", shuffled_table)
    redo = text_mod.QUERIES["pipeline_shuffle_shard"](spark, sf_dir).toPandas()
    key = ["doc_id", "shard_id", "pos_in_shard", "shuffle_key"]
    a = base[key].sort_values("doc_id").reset_index(drop=True)
    b = redo[key].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


# -------------------------------------------------------------------- M4

_BUCKET = 900


def _mts(s_offset: float) -> datetime.datetime:
    base = datetime.datetime(2001, 3, 1, 0, 0, 0)
    return base + datetime.timedelta(seconds=s_offset)


_M4_EVENTS = [
    # (event_id, ts, value) within/around one 900 s bucket
    (1, _mts(0.0), 5.0),  # exact bucket boundary → this bucket
    (2, _mts(899.999999), -2.0),  # 1 µs before next boundary → stays
    (3, _mts(900.0), 7.0),  # next bucket's first point
    (4, _mts(450.7), 9.0),  # x.5+ second fraction: the CAST-rounds trap
    (5, _mts(100.0), 1.0),  # \ identical ts: event_id orders the tie,
    (6, _mts(100.0), 2.0),  # /  so v_first at t=100 is event 5's value
    (7, _mts(200.0), None),  # NULL measurement: dropped by contract
]


@pytest.fixture()
def crafted_m4(spark, monkeypatch):
    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog

    events = spark.createDataFrame(
        [(i, ts, 1, "tick", v, "{}") for i, ts, v in _M4_EVENTS],
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


def test_m4_adversarial(spark, crafted_m4):
    from frinesis_spark.operators import timeseries

    pdf = timeseries.QUERIES["time_downsample_m4"](spark, "crafted://").toPandas()
    duck_pdf = crafted_m4.sql(timeseries.ORACLE["time_downsample_m4"]).df()
    assert_frames_match(pdf, duck_pdf, "time_downsample_m4")
    assert len(pdf) == 2  # boundary point 3 opened a second bucket
    b0 = pdf.sort_values("bucket_ts").iloc[0]
    # 5 non-NULL points in bucket 0 (NULL row dropped, 899.999999 stays).
    assert b0["n_points"] == 5
    assert b0["v_first"] == 5.0  # t=0 boundary point
    assert b0["v_last"] == -2.0  # the 1-µs-before-boundary point
    assert b0["v_min"] == -2.0 and b0["v_max"] == 9.0
    b1 = pdf.sort_values("bucket_ts").iloc[1]
    assert b1["n_points"] == 1 and b1["v_first"] == 7.0


def test_m4_tie_break_is_event_id(spark, monkeypatch):
    """Two points at the same µs: the composite key's event_id suffix
    makes first/last deterministic (lower id is 'first')."""
    import frinesis_spark.operators.timeseries as ts_mod
    from frinesis_spark import catalog
    from frinesis_spark.operators import timeseries

    spark_df = spark.createDataFrame(
        [
            (10, _mts(0.0), 1, "tick", 100.0, "{}"),
            (11, _mts(0.0), 1, "tick", 200.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        ts_mod,
        "table",
        lambda s, d, n: spark_df if n == "events" else real_table(s, d, n),
    )
    pdf = timeseries.QUERIES["time_downsample_m4"](spark, "crafted://").toPandas()
    assert len(pdf) == 1
    assert pdf.iloc[0]["v_first"] == 100.0 and pdf.iloc[0]["v_last"] == 200.0


# ------------------------------------------------------- clustered layout


def test_sorted_clustered_layout_skips(spark, sf_dir):
    """The point of the layout: every parquet file owns a (near)
    disjoint l_shipdate range, so the one-year readback filter can
    prune whole files from footer stats alone."""
    from frinesis_spark.sinks import files as sink_mod

    sink_mod.QUERIES["sink_sorted_clustered"](spark, sf_dir).collect()
    paths = sorted(
        glob.glob(os.path.join(sink_mod._sink_dir("lineitem_clustered"), "*.parquet"))
    )
    assert len(paths) > 1
    spans = []
    for p in paths:
        meta = pq.ParquetFile(p).metadata
        idx = next(
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        lo = min(
            meta.row_group(g).column(idx).statistics.min
            for g in range(meta.num_row_groups)
        )
        hi = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        spans.append((lo, hi))
    spans.sort()
    # Range partitioning ⇒ files are interval-disjoint (boundary rows
    # may share the split timestamp, nothing more).
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    # Skipping evidence: the 1995 filter year intersects a strict
    # subset of the files (the span covers ~7 years over >1 files).
    y0 = datetime.datetime(1995, 1, 1)
    y1 = datetime.datetime(1996, 1, 1)
    touched = [1 for lo, hi in spans if hi >= y0 and lo < y1]
    assert 0 < sum(touched) < len(spans)


# ------------------------------------------------- cumulative distinct


def test_cumulative_distinct_identity(spark, sf_dir):
    """cum_users at each day must equal the brute-force distinct count
    of all users seen up to that day — the first-occurrence identity
    the operator rests on — and the final value must equal the total
    distinct users of the event type."""
    import pandas as pd

    from frinesis_spark.operators import timeseries

    pdf = timeseries.QUERIES["analytics_cumulative_distinct"](
        spark, sf_dir
    ).toPandas()
    from frinesis_spark.catalog import table

    ev = table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts"
    ).toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    for et, grp in pdf.groupby("event_type"):
        seen: set = set()
        sub = ev[ev["event_type"] == et]
        for _, row in grp.sort_values("day").iterrows():
            day = pd.Timestamp(row["day"])
            seen |= set(sub[sub["day"] == day]["user_id"])
            assert row["cum_users"] == len(
                set(sub[sub["day"] <= day]["user_id"])
            )
            assert row["dau"] >= row["new_users"]
        assert grp["cum_users"].max() == sub["user_id"].nunique()


# --------------------------------------------------- schema evolution


def test_schema_evolution_null_fill(spark, sf_dir):
    """The merged read must keep every v1 row and surface its missing
    column as NULL — not drop the rows, not invent values."""
    from frinesis_spark.sources import files as src_mod

    pdf = src_mod.QUERIES["source_schema_evolution"](spark, sf_dir).toPandas()
    assert (pdf["n_orders"] >= pdf["n_with_priority"]).all()
    # Both generations are non-empty in every status bucket at any sf.
    assert (pdf["n_with_priority"] > 0).any()
    assert (pdf["n_orders"] > pdf["n_with_priority"]).any()
