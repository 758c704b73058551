"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""

from frinesis_spark.functions.numeric import davg, dsum  # noqa: F401
from frinesis_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
