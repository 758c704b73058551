"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

No UDFs: ``zip_with`` + ``aggregate`` stay inside whole-stage codegen,
so cosine similarity over a 64-dim embedding column runs JVM-side at
full scan speed. At 100 TB this is the difference between a
CPU-bound vectorized scan and a Python-serde bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns (double).

    Zero-norm policy: NULL. A zero vector (a padding row, a failed
    encode — real embedding corpora contain them) makes the divisor 0,
    and under Spark's default ANSI mode a plain ``/`` would KILL the
    whole job with DIVIDE_BY_ZERO on that one row (caught by the r6
    adversarial differential test). ``try_divide`` yields NULL; the
    oracles wrap their divisors in ``NULLIF(d, 0)`` for the same NULL
    on ANY DuckDB version (x/0 is NULL only on duckdb ≤ 1.0 — ≥ 1.1
    defaults to IEEE NaN, which would sort ABOVE all reals in ORDER BY
    cos DESC; review wave 6). NULL cosines rank last and threshold
    filters exclude them identically on both engines.
    """
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_from_norms(d: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot and per-side norms — the hot-path
    form: on a pair join, inlining :func:`cosine_similarity` re-walks
    BOTH arrays' norms per pair (~3× the array passes); precomputing
    each side's norm once before the join is bit-identical IEEE
    arithmetic (same operand values, same final multiply/divide) at a
    third of the per-pair cost (review wave 6)."""
    return F.try_divide(d, na * nb)
