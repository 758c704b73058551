"""Fixture-drift guards.

Round 2 lost 16 queries, 36 tests, and the whole bench to silent
fixture drift (events.ts changed parquet ns→µs while catalog.py kept
the ns workaround). These tests pin the adaptive loader's behavior so
the next drift fails with one clear message instead of a wall of
analysis errors.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frinesis_spark.catalog import _TS_UNIT_CACHE, events_ts_unit, table


def test_events_ts_unit_probe_matches_disk(sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    t = pq.read_schema(path).field("ts").type
    expected = "ns" if getattr(t, "unit", None) == "ns" else "ts"
    assert events_ts_unit(path) == expected


def test_events_loads_as_timestamp_ntz(spark, sf_dir):
    # Whatever the physical unit, the catalog contract is TIMESTAMP_NTZ.
    dtype = dict(table(spark, sf_dir, "events").dtypes)["ts"]
    assert dtype == "timestamp_ntz"


def test_events_stream_loads_as_timestamp(spark, sf_dir):
    # Streaming contract: TimestampType (watermark-capable).
    from frinesis_spark.streaming.runner import events_stream

    dtype = dict(events_stream(spark, sf_dir).dtypes)["ts"]
    assert dtype == "timestamp"


@pytest.mark.parametrize(
    "pa_type,expected",
    [
        (pa.timestamp("ns"), "ns"),
        (pa.timestamp("us"), "ts"),
        (pa.timestamp("ms"), "ts"),
        (pa.int64(), "ns"),
    ],
)
def test_ts_unit_classification(tmp_path, pa_type, expected):
    path = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([0, 1_000_000], type=pa_type)}), path
    )
    try:
        assert events_ts_unit(path) == expected
    finally:
        _TS_UNIT_CACHE.pop(path, None)


def test_ts_unit_unknown_type_fails_loudly(tmp_path):
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.table({"ts": pa.array(["not-a-time"])}), path)
    with pytest.raises(RuntimeError, match="fixture schema changed"):
        events_ts_unit(path)


def test_generated_documents_have_open_heaps_vocabulary(tmp_path):
    """r12 fixture contract (gen_fixtures.py documents entry): the
    generated corpus must be vocabulary-OPEN (types grow with n, Zipf
    head = the 30 legacy words) and keep the planted near-dup
    spectrum — the properties the scaling sweep's exponents and the
    dedup self-grades both stand on."""
    import numpy as np
    import pyarrow.parquet as pq

    import tools.gen_fixtures as gf

    out = str(tmp_path / "fx")
    gf.generate(0.02, out)  # 1000 docs -> V = max(1000, 50*sqrt(1000))
    texts = pq.read_table(
        f"{out}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    n_doc = len(texts)
    v_cap = max(1000, int(50 * np.sqrt(n_doc)))
    types = set(w for t in texts for w in t.split())
    # open vocabulary: hundreds of distinct types actually observed,
    # bounded by the declared Heaps cap
    assert 0.4 * v_cap < len(types) <= v_cap
    # the legacy 30 words occupy the Zipf head: all present
    assert set(gf.VOCAB) <= types
    # planted near-dups: ~5% of docs share a base text modulo the
    # " dup" suffix; their 3-gram jaccard stays in the 0.8-1.0 band
    def shingles(t):
        w = t.split()
        return set(tuple(w[i:i+3]) for i in range(max(len(w) - 2, 1)))

    by_base = {}
    for t in texts:
        by_base.setdefault(t.split(" dup")[0], []).append(t)
    dup_groups = [g for g in by_base.values() if len(g) > 1]
    assert len(dup_groups) >= int(0.02 * n_doc)
    jacs = []
    for g in dup_groups:
        a, b = shingles(g[0]), shingles(g[1])
        jacs.append(len(a & b) / len(a | b))
    assert min(jacs) >= 0.8
