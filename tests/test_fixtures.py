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
