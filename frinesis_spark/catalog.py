"""Table loaders for the driver's synthetic star schema (TESTDATA.md).

All queries read through :func:`table` so the parquet scan is declared
once — Catalyst handles column pruning and predicate pushdown from the
downstream plan into the scan (verify with ``.explain``: ``PushedFilters``
/ ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table of the schema as a DataFrame (lazy parquet scan).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it as
    raw nanos (``spark.sql.legacy.parquet.nanosAsLong``) and convert to
    timestamp_ntz via integer division — lossless here because the
    generator emits µs-precision values (verified: no sub-µs component),
    and integer ``div`` avoids the double-rounding a ``/1000`` would hit
    on ~1.7e18 nanos epochs.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F

        return df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS timestamp_ntz)")
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL-string API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
