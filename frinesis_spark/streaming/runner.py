"""Streaming execution helpers: file-source replay of the events table
and run-to-completion against an in-memory sink.

The reference library's only execution mode is an unbounded
message-at-a-time pipeline (SURVEY.md §1.1); Structured Streaming's
micro-batch loop is the Spark-native equivalent (§3.4). These helpers
replay a bounded parquet table through a real ``readStream`` file
source so watermark/state semantics are exercised by the actual
streaming engine, not a batch emulation.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_dir(sf_dir: str, name: str) -> str:
    """Copy one table's parquet into a per-(sf_dir, table) temp directory —
    the file stream source requires a directory, not a bare file."""
    key = hashlib.md5(f"{sf_dir}/{name}".encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"fs_stream_{key}")
    target = os.path.join(stage, f"{name}.parquet")
    src = os.path.join(sf_dir, f"{name}.parquet")
    if not (
        os.path.exists(target) and os.path.getsize(target) == os.path.getsize(src)
    ):
        os.makedirs(stage, exist_ok=True)
        shutil.copy(src, target)
    return stage


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Unbounded DataFrame replaying the events table.

    Watermarks require TIMESTAMP, not TIMESTAMP_NTZ, so ``ts`` is
    normalized to TimestampType (sessions pin UTC, so the ntz→timestamp
    cast is value-preserving). The fixture's physical type is probed per
    file footer (catalog.events_ts_unit): raw nanos-as-long get the
    legacy ``div 1000`` conversion; native timestamps just cast.
    Downstream queries cast outputs back to timestamp_ntz for oracle
    parity.
    """
    from ..catalog import events_ts_unit

    stage = _stage_dir(sf_dir, "events")
    path = os.path.join(stage, "events.parquet")
    is_nanos = events_ts_unit(path) == "ns"
    if is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(stage)
    if is_nanos:
        return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf.withColumn("ts", F.col("ts").cast("timestamp"))


def run_append_to_memory(stream_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Run an append-mode streaming DataFrame to completion against a
    memory sink; return the result as a (batch) DataFrame.

    ``processAllAvailable`` is called twice: the second call lets the
    no-data micro-batch (which advances the watermark past the final
    data batch and flushes expired state) land deterministically.
    """
    name = "mem_" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="fs_ckpt_")
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        query.processAllAvailable()
        query.processAllAvailable()
        rows = spark.table(name).collect()
    finally:
        query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(rows, stream_df.schema)
