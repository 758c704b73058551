"""Cross-micro-batch state semantics of the custom sessionizer.

The oracle check replays everything in one trigger; this test forces
two micro-batches (maxFilesPerTrigger=1) with a user session spanning
the batch boundary and asserts GroupState carries: the session is NOT
split at the boundary, and counts accumulate.
"""

from __future__ import annotations

from frinesis_spark.streaming.stateful import (
    _OUTPUT_SCHEMA,
    _STATE_SCHEMA,
    _sessionize,
)


def test_state_carries_across_batches(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = str(tmp_path / "src")
    # batch 0: 3 events 1 minute apart; batch 1: 3 more, continuing
    # 1 minute after the last — one gap-contiguous session of 6.
    spark.createDataFrame(
        [(1, f"2024-01-01 10:0{m}:00") for m in range(3)],
        "user_id long, ts_s string",
    ).selectExpr("user_id", "cast(ts_s as timestamp) AS ts").coalesce(
        1
    ).write.parquet(src + "/b0")
    spark.createDataFrame(
        [(1, f"2024-01-01 10:0{m}:00") for m in range(3, 6)],
        "user_id long, ts_s string",
    ).selectExpr("user_id", "cast(ts_s as timestamp) AS ts").coalesce(
        1
    ).write.parquet(src + "/b1")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = sorted(
            spark.table("stateful_test").collect(),
            key=lambda r: r["n_events"],
        )
    finally:
        q.stop()

    # one emission per batch, cumulative; the session must not split
    # at the micro-batch boundary (gap is 1 minute).
    assert [r["n_events"] for r in rows] == [3, 6]
    assert rows[-1]["n_sessions"] == 1
    assert rows[-1]["max_session_len"] == 6
