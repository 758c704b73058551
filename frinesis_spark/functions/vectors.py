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
    adversarial differential test). ``try_divide`` yields NULL
    instead, which is bit-for-bit what DuckDB's ``/`` already returns
    for x/0 — so the oracle needs no change, NULL cosines rank last
    under both engines' default DESC NULLS LAST, and threshold filters
    (``cos >= t``) exclude them identically.
    """
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
