"""Central registry assembling the driver contract.

Merges every operator module's ``QUERIES`` / ``ORACLE`` dicts; used by
``__spark_entry__.py`` and by the local parity tests (which mirror the
driver's DuckDB hash-compare at a smaller scale factor).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = []


def _load_modules():
    global _MODULES
    if _MODULES:
        return _MODULES
    from frinesis_spark.operators import relational, scalar

    # Registration order IS the driver's correctness-run order, and the
    # driver's budget can truncate the tail (round 1 stopped mid-`text`,
    # leaving 23 queries unverified). Order by (never-yet-verified,
    # cheap) first so a truncated run still covers everything at least
    # once across rounds; the expensive iterative dedup/similarity block
    # goes last.
    mods = []
    for optional in (
        "frinesis_spark.operators.text",
        "frinesis_spark.operators.multimodal",
        "frinesis_spark.streaming.windows",
        "frinesis_spark.streaming.stateful",
        "frinesis_spark.streaming.tws",
        "frinesis_spark.sinks.kinesis_query",
        "frinesis_spark.sources.kinesis_query",
        "frinesis_spark.sources.files",
        "frinesis_spark.sinks.files",
        "frinesis_spark.operators.sqlapi",
    ):
        try:
            mods.append(__import__(optional, fromlist=["QUERIES"]))
        except ImportError:
            pass
    mods.extend([relational, scalar])
    for optional in (
        "frinesis_spark.operators.dedup",
        "frinesis_spark.operators.similarity",
    ):
        try:
            mods.append(__import__(optional, fromlist=["QUERIES"]))
        except ImportError:
            pass
    _MODULES = mods
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _load_modules():
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod.__name__}")
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _load_modules():
        out.update(getattr(mod, "ORACLE", {}))
    unknown = out.keys() - queries().keys()
    if unknown:
        raise ValueError(f"oracle entries without a query: {unknown}")
    return out
