"""``sink_kinesis_batched`` — the reference's A1–A17 surface as a
driver-checkable query.

Builds a message stream from the events table (topic = event_type,
payload = props bytes, partition key = uuid, with the reference's
magic ``"fail"`` key injected on a deterministic subset), pushes one
micro-batch through :class:`KinesisBatchWriter` against the mock
client, and returns the per-topic delivery stats. Because the mock
fails exactly the ``fail``-keyed records every time, sent/dropped/
retried counts are pure functions of the input — so this end-to-end
sink run (chunking ≤500, partial-failure split, per-record retry,
drop-at-max-attempts, drain) hash-matches a plain SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frinesis_spark.catalog import table
from frinesis_spark.sinks.kinesis import KinesisBatchWriter, KinesisSinkConfig
from frinesis_spark.sinks.mock import MockClientFactory

_FAIL_MOD = 97  # event_id % 97 == 0 → magic "fail" partition key
_MAX_ATTEMPTS = 3


def q_sink_kinesis_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    msgs = e.select(
        F.col("event_type").alias("topic"),
        F.encode(F.col("props"), "utf-8").alias("data"),
        F.when(F.col("event_id") % _FAIL_MOD == 0, F.lit("fail"))
        .otherwise(F.expr("uuid()"))  # A16: uuid partition key
        .alias("partition_key"),
    )
    writer = KinesisBatchWriter(
        MockClientFactory(store_dir=None),
        KinesisSinkConfig(
            max_attempts_per_record=_MAX_ATTEMPTS,
            # synchronous writer → blocking buffer (drain inline); see
            # KinesisBatchWriter.__init__
            add_blocks_when_buffer_full=True,
        ),
    )
    stats = writer.write_batch(msgs)
    return stats.select("topic", "n_sent", "n_dropped", "n_retries")


QUERIES = {"sink_kinesis_batched": q_sink_kinesis_batched}

ORACLE = {
    # Every fail-keyed record is retried (max_attempts - 1) times then
    # dropped; everything else is sent exactly once.
    "sink_kinesis_batched": f"""
        SELECT event_type AS topic,
               CAST(SUM(CASE WHEN event_id % {_FAIL_MOD} <> 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sent,
               CAST(SUM(CASE WHEN event_id % {_FAIL_MOD} = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               CAST({_MAX_ATTEMPTS - 1} *
                    SUM(CASE WHEN event_id % {_FAIL_MOD} = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retries
        FROM events
        GROUP BY event_type
    """,
}
