"""Invariant tests for the timeseries analytics operators
(gapfill+LOCF, batch sessionization, cohort retention).

Oracle parity (hash equality vs DuckDB) is covered generically by
test_oracle_parity.py; these pin the semantics a hash can't express,
at toy scale where the expected output is hand-checkable.
"""

from datetime import datetime

from pyspark.sql import functions as F

_SCHEMA = "user_id long, event_id long, ts timestamp, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _t(h, m=0):
    return datetime(2024, 3, 4, h, m)  # a Monday


def test_gapfill_fills_span_and_carries_locf(spark):
    from frinesis_spark.operators.timeseries import gapfill_locf_hourly

    rows = [
        (1, 1, _t(5, 10), 2.0),
        (1, 2, _t(5, 40), 3.0),  # same hour bucket as event 1
        (1, 3, _t(8, 0), 7.0),  # hours 6, 7 are gaps
        (2, 4, _t(9, 0), 1.0),  # single-event user → one-row grid
    ]
    out = {
        (r.user_id, r.hour.hour): r
        for r in gapfill_locf_hourly(_events(spark, rows)).collect()
    }
    assert set(out) == {(1, 5), (1, 6), (1, 7), (1, 8), (2, 9)}
    assert out[(1, 5)].n_events == 2 and out[(1, 5)].value_sum == 5.0
    # Gap hours: zero events, NULL observation, LOCF carries 5.0.
    for h in (6, 7):
        r = out[(1, h)]
        assert r.n_events == 0 and r.value_sum is None
        assert r.locf_value_sum == 5.0
    assert out[(1, 8)].locf_value_sum == 7.0
    assert out[(2, 9)].n_events == 1 and out[(2, 9)].locf_value_sum == 1.0


def test_gapfill_fixture_grid_is_contiguous(spark, sf_dir):
    """On the driver fixture: per user the grid is exactly the hourly
    span (no holes, no dups), and total n_events equals the filtered
    event count — the grid adds rows but never loses observations."""
    from frinesis_spark.catalog import table
    from frinesis_spark.operators.timeseries import (
        _GAPFILL_USER_MOD,
        q_time_gapfill_locf,
    )

    out = q_time_gapfill_locf(spark, sf_dir)
    spans = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("hour").alias("n_hours"),
        (
            (
                F.unix_micros(F.max("hour")) - F.unix_micros(F.min("hour"))
            )
            / 3_600_000_000
            + 1
        ).alias("span_hours"),
        F.sum("n_events").alias("n_events"),
    )
    bad = spans.where(
        (F.col("n_rows") != F.col("n_hours"))
        | (F.col("n_rows") != F.col("span_hours"))
    ).count()
    assert bad == 0
    total = spans.agg(F.sum("n_events")).first()[0]
    expected = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id") % _GAPFILL_USER_MOD == 0)
        .count()
    )
    assert total == expected


def test_sessionize_splits_on_gap(spark):
    from frinesis_spark.operators.timeseries import sessionize_events

    rows = [
        (1, 1, _t(5, 0), 1.0),
        (1, 2, _t(5, 10), 2.0),  # 10 min — same session
        (1, 3, _t(7, 0), 4.0),  # 110 min gap — new session
        (2, 4, _t(5, 0), 8.0),
    ]
    out = sorted(
        sessionize_events(_events(spark, rows)).collect(),
        key=lambda r: (r.user_id, r.session_seq),
    )
    assert [(r.user_id, r.session_seq, r.n_events) for r in out] == [
        (1, 1, 2),
        (1, 2, 1),
        (2, 1, 1),
    ]
    assert out[0].value_sum == 3.0
    assert out[0].duration_seconds == 600.0
    assert out[1].duration_seconds == 0.0


def test_sessionize_fixture_partitions_events(spark, sf_dir):
    """Sessions partition the event stream: per-session counts sum to
    the table size, session ids are dense per user, durations are
    non-negative and bounded by the user's own span."""
    from frinesis_spark.catalog import table
    from frinesis_spark.operators.timeseries import q_window_session_islands

    out = q_window_session_islands(spark, sf_dir)
    n_events_total = out.agg(F.sum("n_events")).first()[0]
    assert n_events_total == table(spark, sf_dir, "events").count()
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("session_seq").alias("max_seq"),
        F.min("session_seq").alias("min_seq"),
    )
    assert (
        per_user.where(
            (F.col("n_sessions") != F.col("max_seq"))
            | (F.col("min_seq") != 1)
        ).count()
        == 0
    )
    assert out.where(F.col("duration_seconds") < 0).count() == 0


def test_retention_toy_matrix(spark):
    from frinesis_spark.operators.timeseries import retention_cohorts

    mon, next_mon = datetime(2024, 3, 4), datetime(2024, 3, 11)
    rows = [
        (1, 1, mon, 0.0),
        (1, 2, next_mon, 0.0),  # user 1 retained in week 1
        (2, 3, mon, 0.0),  # user 2 churns after week 0
        (3, 4, next_mon, 0.0),  # user 3 is a week-1 cohort
    ]
    out = {
        (r.cohort_week, r.week_offset): r
        for r in retention_cohorts(_events(spark, rows)).collect()
    }
    assert out[(mon, 0)].n_active == 2 and out[(mon, 0)].cohort_size == 2
    assert out[(mon, 1)].n_active == 1
    assert out[(mon, 1)].retention_rate == 0.5
    assert out[(next_mon, 0)].cohort_size == 1
    assert (next_mon, 1) not in out


def test_retention_fixture_rates_bounded(spark, sf_dir):
    from frinesis_spark.operators.timeseries import (
        q_analytics_retention_cohort,
    )

    out = q_analytics_retention_cohort(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 < r.n_active <= r.cohort_size
        assert 0 < r.retention_rate <= 1.0
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size


def _formatted_plan(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_sessionize_plan_single_shuffle(spark, sf_dir):
    """Both window functions and the session aggregate ride ONE
    user_id exchange — the plan the docstring promises (no self-join,
    no second sort-partition)."""
    import re

    from frinesis_spark.operators.timeseries import q_window_session_islands

    plan = _formatted_plan(q_window_session_islands(spark, sf_dir))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, f"expected 1 shuffle, plan:\n{plan}"
    assert "Join" not in plan


def test_gapfill_plan_no_cross_join(spark, sf_dir):
    """The grid comes from per-user span rows, never a calendar cross
    join; the left join back to observations is an equi-join."""
    from frinesis_spark.operators.timeseries import q_time_gapfill_locf

    plan = _formatted_plan(q_time_gapfill_locf(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    # The user filter reaches both parquet scans.
    assert plan.count("PushedFilters") >= 1


def _reference_sessions(rows, gap_us):
    """Single-threaded reference sessionizer: the ground truth the
    distributed plan must reproduce."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, eid, ts, val in rows:
        by_user[uid].append((ts, eid, val))
    out = []
    for uid, evs in by_user.items():
        evs.sort()
        seq, start = 0, None
        for ts, eid, val in evs:
            if start is None or (ts - prev).total_seconds() * 1e6 > gap_us:
                seq += 1
                start, n, vsum = ts, 0, 0.0
            prev, n, vsum = ts, n + 1, vsum + val
            # overwrite the open session's row until it closes
            if out and out[-1][:2] == (uid, seq):
                out[-1] = (uid, seq, n, start, prev)
            else:
                out.append((uid, seq, n, start, prev))
    return sorted(out)


def test_sessionize_property_matches_reference(spark):
    """Property test: on randomized event timelines (clustered + bursty
    + tie-heavy), the distributed sessionizer agrees with a
    single-threaded reference on session count, membership, and
    bounds."""
    from datetime import timedelta

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from frinesis_spark.operators.timeseries import sessionize_events

    gap_us = 30 * 60 * 1_000_000
    offsets = st.lists(
        st.integers(min_value=0, max_value=90 * 60),  # 0..90 min steps
        min_size=1,
        max_size=25,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(user_steps=st.lists(offsets, min_size=1, max_size=3))
    def run(user_steps):
        rows, eid = [], 0
        for uid, steps in enumerate(user_steps):
            t = datetime(2024, 3, 4, 0, 0)
            for s in steps:
                t = t + timedelta(seconds=s)
                eid += 1
                rows.append((uid, eid, t, 1.0))
        got = sorted(
            (r.user_id, r.session_seq, r.n_events, r.session_start, r.session_end)
            for r in sessionize_events(_events(spark, rows)).collect()
        )
        assert got == _reference_sessions(rows, gap_us)

    run()


def _dsum_units(x: float) -> int:
    """Mirror of functions.numeric.dsum's PER-ROW step: the double is
    quantized to decimal scale 6 (Spark cast double→decimal =
    BigDecimal.valueOf → shortest repr → HALF_UP) and summed as exact
    integer micro-units. Hypothesis caught both wrong references here
    (r12): Python's banker's round() diverges on ties (1.5390625 →
    .062 vs Spark's .063), and rounding the SUM instead of the values
    diverges whenever two per-row quantizations both round up
    (1.8828125 + 0.2578125: dsum 2.140626 vs round-of-sum 2.140625)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x))
        .quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        .scaleb(6)
    )


def _reference_gapfill(rows):
    """Single-threaded reference gapfill+LOCF over (uid, eid, ts, val)."""
    from collections import defaultdict
    from datetime import timedelta

    hourly = defaultdict(lambda: [0, 0])
    for uid, eid, ts, val in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        cell = hourly[(uid, h)]
        cell[0] += 1
        cell[1] += _dsum_units(val)
    out = []
    users = {uid for uid, _ in hourly}
    for uid in users:
        hours = sorted(h for u, h in hourly if u == uid)
        h, last = hours[0], None
        while h <= hours[-1]:
            n, s = hourly.get((uid, h), (0, None))
            # same two IEEE ops as dsum: exact long → double, ÷ 1e6
            vs = s / 1e6 if n else None
            if vs is not None:
                last = vs
            out.append((uid, h, n, vs, last))
            h = h + timedelta(hours=1)
    return sorted(out)


def test_gapfill_property_matches_reference(spark):
    """Property test: on randomized sparse timelines the distributed
    gapfill+LOCF agrees with a sequential reference on grid coverage,
    observation placement, and carry-forward values."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from frinesis_spark.operators.timeseries import gapfill_locf_hourly

    event = st.tuples(
        st.integers(min_value=0, max_value=100 * 3600),  # offset seconds
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, width=32
        ),
    )
    per_user = st.lists(event, min_size=1, max_size=12)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(user_events=st.lists(per_user, min_size=1, max_size=3))
    def run(user_events):
        from datetime import timedelta

        rows, eid = [], 0
        for uid, evs in enumerate(user_events):
            for off, val in evs:
                eid += 1
                rows.append(
                    (uid, eid, datetime(2024, 3, 4) + timedelta(seconds=off),
                     float(val))
                )
        got = sorted(
            (
                r.user_id,
                r.hour,
                r.n_events,
                None if r.value_sum is None else round(r.value_sum, 6),
                None
                if r.locf_value_sum is None
                else round(r.locf_value_sum, 6),
            )
            for r in gapfill_locf_hourly(_events(spark, rows)).collect()
        )
        assert got == _reference_gapfill(rows)

    run()
