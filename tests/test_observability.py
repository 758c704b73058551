"""A14/A15 surface: the listener-based event/stats log observes a live
streaming query's progress and termination."""

from __future__ import annotations

import time

from frinesis_spark.streaming.observability import EngineEventLog


def test_event_log_observes_streaming_query(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from frinesis_spark.streaming.windows import events_stream

    log = EngineEventLog()
    spark.streams.addListener(log)
    try:
        counts = events_stream(spark, sf_dir).groupBy("event_type").count()
        q = (
            counts.writeStream.format("memory")
            .queryName("obs_test_sink")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

        # Listener callbacks are async; give the bus a moment.
        deadline = time.time() + 30
        while time.time() < deadline:
            s = log.stats()
            if s.n_progress_events > 0 and log.terminated:
                break
            time.sleep(0.5)

        s = log.stats()
        assert s.n_progress_events > 0
        assert s.rows_in > 0  # the replayed events table flowed through
        assert not s.errors  # clean stop → no exception events
        assert log.started, "start event missing"
        assert log.terminated, "termination event missing"
    finally:
        spark.streams.removeListener(log)
