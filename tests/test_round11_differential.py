"""Round-11 differential wave: cross-engine bit-exactness of the
scaled-int64 money-sum path (the r10 sf1 fix) at its divergence
frontier, and the ROUND(6) quantile interpolation fix at tie points.

The r10 sf1 correctness pass found two cross-engine float divergences
and fixed them (dsum scaled-int64; rolling-quantile ROUND(6)). Those
fixes were verified on the fixtures; this wave stresses the exact
REGIONS the fixes exist for — sums crossing 2^53 scale-6 units (where
the old decimal→double cast split by ±1 ulp) and quantile
interpolation at equal-bound/tie fractions — on adversarial values
the fixtures don't contain.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from frinesis_spark.functions.numeric import (
    _UNITS,
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)

# Group sums engineered around the old divergence frontier, 2^53
# scale-6 units (~9.007e9 in value): per group, n values of v chosen
# so the exact sum lands just under / exactly at / just over 2^53
# units, plus sign-mixed and cancellation cases. All within the
# documented |sum| <= 2^63/10^6 domain.
_FRONTIER = 2**53  # in scale-6 units
_CASES = [
    # (group, [values]) — values are money-domain doubles (<= 6 dp)
    ("under", [9007.199254, 9007199250.740992 - 9007.199254]),
    ("at", [9007199254.740992]),  # exactly 2^53 units
    ("over_1ulp", [9007199254.740992, 0.000001]),
    ("over_big", [9007199254.740992, 1234567.891011]),
    ("neg_frontier", [-9007199254.740992, -0.000003]),
    ("cancel", [9007199254.740992, -9007199254.740992, 0.25]),
    ("mixed", [1e9, -2.5e9, 9007199254.740992, 3.125e-3]),
    ("tiny", [0.000001, 0.000002, -0.000003]),
    ("max_domain", [9.2e12, 0.000001]),  # near the int64-units bound
]


class TestDsumFrontierDifferential:
    def test_bit_exact_across_engines_at_the_2p53_frontier(self, spark):
        rows = [(g, v) for g, vals in _CASES for v in vals]
        sdf = spark.createDataFrame(rows, "g string, v double")
        got = {
            r["g"]: (r["s"], r["a"])
            for r in sdf.groupBy("g")
            .agg(dsum("v").alias("s"), davg("v").alias("a"))
            .collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (g VARCHAR, v DOUBLE); "
        )
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = {
            g: (s, a)
            for g, s, a in con.execute(
                f"SELECT g, {oracle_dsum('v')} AS s, "
                f"{oracle_davg('v')} AS a FROM t GROUP BY g"
            ).fetchall()
        }
        assert set(got) == set(want)
        for g in want:
            # BIT equality, not approx — the whole point of the idiom
            assert got[g][0].hex() == want[g][0].hex(), (g, got[g], want[g])
            assert got[g][1].hex() == want[g][1].hex(), (g, got[g], want[g])

    def test_frontier_sums_are_exact_in_units(self, spark):
        """The scaled-int64 accumulator is EXACT: the frontier group
        sums recover their constructed unit totals precisely."""
        rows = [("at", 9007199254.740992), ("over_1ulp", 9007199254.740992),
                ("over_1ulp", 0.000001)]
        sdf = spark.createDataFrame(rows, "g string, v double")
        units = {
            r["g"]: r["u"]
            for r in sdf.groupBy("g")
            .agg(
                F.sum(
                    (F.col("v").cast("decimal(28,6)") * _UNITS).cast("long")
                ).alias("u")
            )
            .collect()
        }
        assert units["at"] == _FRONTIER
        assert units["over_1ulp"] == _FRONTIER + 1


class TestQuantileTieDifferential:
    """The r10 rolling-quantile fix: Spark interpolates
    lower+(upper-lower)*f, DuckDB lower*(1-f)+upper*f — ±1 ulp apart
    even at equal bounds; both sides ROUND(6). Pin the fix holds on
    adversarial tie values (equal bounds, adjacent ulps, negative
    pairs), not just fixture data."""

    # (values, percentile) chosen so the interpolation fraction is
    # nonzero and bounds are adjacent-ulp or equal
    _TIES = [
        ([1.000001, 1.000001, 1.000001], 0.5),
        ([2.0000001, 2.0000002], 0.5),       # adjacent in the 7th dp
        ([-3.5, -3.5, 7.25], 0.9),
        ([0.1, 0.2, 0.3, 0.4], 0.37),
        ([1e9 + 0.000001, 1e9 + 0.000002], 0.25),
    ]

    def test_round6_percentile_matches_duckdb(self, spark):
        con = duckdb.connect()
        for vals, p in self._TIES:
            sdf = spark.createDataFrame([(v,) for v in vals], "v double")
            [row] = sdf.agg(
                F.round(F.expr(f"percentile(v, {p})"), 6).alias("q")
            ).collect()
            got = row.q
            con.execute("CREATE OR REPLACE TABLE q (v DOUBLE)")
            con.executemany("INSERT INTO q VALUES (?)", [(v,) for v in vals])
            (want,) = con.execute(
                f"SELECT ROUND(QUANTILE_CONT(v, {p}), 6) FROM q"
            ).fetchone()
            assert got == pytest.approx(want, abs=0) and (
                got.hex() == want.hex()
            ), (vals, p, got, want)
