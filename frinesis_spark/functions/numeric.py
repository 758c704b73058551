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


def dsum(col: Column | str) -> Column:
    """Exact, order-independent SUM of a double expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DECIMAL)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum average: decimal SUM / COUNT, evaluated in double.

    Deterministic because the numerator is exact and the final single
    division is one IEEE op on identical operands in every engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DECIMAL)).cast("double") / F.count(c)


def oracle_dsum(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,{_SCALE}))) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,{_SCALE}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
