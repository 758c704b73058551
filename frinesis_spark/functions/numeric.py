"""Order-independent exact float aggregation.

Floating-point SUM is not associative, so a distributed engine (Spark:
partial aggregates per partition, merge order nondeterministic) and a
single-node oracle (DuckDB) can disagree in the last ulps — and even
two Spark runs can disagree with each other. That breaks value-hash
comparison and, at 100 TB, makes results non-reproducible run-to-run.

The fix used throughout this engine: do per-row scalar arithmetic in
DOUBLE (IEEE-754 ops are bit-deterministic given identical inputs),
cast the per-row value to DECIMAL before SUM (decimal addition is
exact and associative → any aggregation tree yields the same result),
and cast the final aggregate back to DOUBLE. Cost is a widened sum
buffer; the scan/shuffle volume is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Domain contract: dsum/davg are for FINITE, money-scaled doubles
# (every fixture column they touch). A NaN/Infinity or a value beyond
# 22 integer digits fails the decimal cast LOUDLY on BOTH engines
# (Spark ANSI NUMERIC_VALUE_OUT_OF_RANGE — probed r9; DuckDB
# ConversionException): one defined behavior, never a silent
# engine-side exclusion.
# Scale 6 matters: inputs are 2-decimal money values, so products of up
# to three factors have EXACTLY 6 decimal digits. At scale 6 the cast
# target is exactly representable and both engines round the (±1 ulp)
# double to it identically; at scale 4 the exact value can sit ON a
# rounding-tie boundary, where Spark's BigDecimal HALF_UP and DuckDB's
# double-scaling round can disagree. 22 integer digits of headroom
# remain for the sums.
_SCALE = 6
_DECIMAL = f"decimal(28,{_SCALE})"
# Exact scaled-integer path (r10, found by the sf1 correctness pass):
# the final decimal→DOUBLE cast itself diverges across engines once
# the sum exceeds 2^53 scale-6 units (~9.0e9 in value) — Spark's
# BigDecimal.doubleValue() is correctly rounded while DuckDB casts
# int128→double and THEN divides by 10^scale (two roundings), a ±1 ulp
# split that flipped agg_group_sum/sql_tpch_q1/join_salted_skew hashes
# at sf1 (sums ~2.8e10). The deterministic form both engines compute
# bit-identically: carry the sum as an int64 of scale-6 units (exact),
# convert int→double (one correctly-rounded conversion on BOTH
# engines), divide by 10^scale (one shared IEEE op). Domain bound:
# |sum| ≤ 2^63/10^6 ≈ 9.2e12 — an int64-units overflow fails LOUDLY on
# both engines (Spark ANSI ARITHMETIC_OVERFLOW, DuckDB conversion
# error), never silently. That bound is a property of the DRIVER'S
# double-emitting hash contract, not of the engine: a production
# 100 TB pipeline keeps money sums in DECIMAL end-to-end (exact at any
# volume) and never round-trips them through double at all.
#
# Residual sites of the same class (inline decimal-sum→double casts
# outside this module, audited r10): the zscore/ab-test FRAME sums are
# width-bounded (never near 2^53 units); the per-series cumulative
# window sums (window_running_frame/time_range) are series-bounded
# (~1e13 units at sf1 vs 2^53 ≈ 9e15 — three orders of headroom); the
# rollup/pivot totalprice sums sit at ~3.8e15 units at sf1 behind a
# ROUND(2). All verified green by the sf1 pass; each would need this
# module's scaled-int64 idiom before any sf100-scale oracle run.
_UNITS = 10**_SCALE


def _scaled_units(c: Column) -> Column:
    """Per-row exact scale-6 integer units of a money-domain double."""
    # decimal(28,6) × 10^6 → decimal(36,6) on Spark (28+7+1) but
    # DECIMAL(38,6) on DuckDB (the literal promotes to DECIMAL(10,0),
    # 28+10 = 38 — ZERO headroom there; widening the accumulator past
    # 28 digits would overflow DuckDB's cap). Integral by construction
    # → exact BIGINT.
    return (c.cast(_DECIMAL) * _UNITS).cast("long")


def dsum(col: Column | str) -> Column:
    """Exact, order-independent SUM of a double expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled_units(c)).cast("double") / F.lit(float(_UNITS))


def davg(col: Column | str) -> Column:
    """Exact-sum average: scaled-integer SUM / COUNT in double.

    Deterministic because the numerator is exact and the two IEEE ops
    (÷10^scale, ÷count) run in the same order on identical operands in
    every engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_scaled_units(c)).cast("double")
        / F.lit(float(_UNITS))
        / F.count(c)
    )


def oracle_dsum(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`dsum` for oracle strings.

    Also valid Spark SQL — the shared TPC-H strings embed it verbatim
    (DuckDB SUM(BIGINT) widens to HUGEINT, so the outer BIGINT cast
    restores the exact int64 before the one shared int→double
    conversion; on Spark that cast is a no-op)."""
    return (
        f"(CAST(CAST(SUM(CAST(CAST(({expr}) AS DECIMAL(28,{_SCALE})) "
        f"* {_UNITS} AS BIGINT)) AS BIGINT) AS DOUBLE) / {_UNITS}.0)"
    )


def oracle_davg(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`davg` (same shared-dialect note
    as :func:`oracle_dsum`)."""
    return f"({oracle_dsum(expr)} / COUNT({expr}))"
