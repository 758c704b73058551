"""First-class `kinesis_frinesis` format via Spark 4's Python Data
Source API: ``spark.read`` / ``df.write`` / ``spark.readStream`` all
speak the sink+source pair natively after one
``spark.dataSource.register(KinesisDataSource)``.

This packages the engine's Kinesis surface (the reference's whole
capability re-expressed, SURVEY.md §2A) behind Spark's own connector
contract instead of helper functions:

- **batch read** — one ``InputPartition`` per shard; each executor
  task drains its shard with a task-local client (the shard IS the
  parallelism unit, 1 MB/s each; read loop ≙ the reference's
  read-back loop, /root/reference/integration_test.go:112-143).
- **batch write** — each task feeds a :class:`BatchProducer`
  (A3–A11: ≤500-record chunks, backoff, per-record retry/drop,
  shedding, drain deadline) and fails the task if records remain
  after the deadline — Close-with-error semantics (sink.go:112-126).
- **streaming read** — a :class:`SimpleDataSourceStreamReader` whose
  offsets are per-shard sequence positions; each micro-batch reads
  (start, caught-up], exactly the incremental form of the batch
  drain. Simple readers fetch on the driver — right for control-rate
  streams; a fully partitioned ``DataSourceStreamReader`` is the
  high-throughput variant and shares all the per-shard logic here.

Client selection (A17): option ``mock_store_dir`` → the file-backed
mock (tests, same role as the reference's localstack); otherwise boto3
from env (``AWS_REGION_NAME``, ``KINESIS_ENDPOINT``).
"""

from __future__ import annotations

import logging

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: rows produced by the readers — ONE record-schema contract shared
#: with the shard-parallel reader (r9 review wave 10: two verbatim
#: copies could drift and break the roundtrip unionByName)
from frinesis_spark.sources.kinesis import SCHEMA as READ_SCHEMA  # noqa: E402

FORMAT_NAME = "kinesis_frinesis"

_LOG = logging.getLogger(__name__)


def _client_factory(options: dict):
    """Picklable client factory per the A17 config rules.

    Client selection precedence: ``mock_store_dir`` option → file-
    backed mock; ``endpoint`` option (+ optional ``region``) → real
    boto3 against that HTTP endpoint — options serialize to the Python
    workers, so this is the deterministic way to point EXECUTOR-side
    clients at a test/localstack endpoint (worker processes may have
    forked before a driver-side env var was set); otherwise boto3 from
    the ambient env (``AWS_REGION_NAME``, ``KINESIS_ENDPOINT``).
    """
    store = options.get("mock_store_dir")
    if store:
        from frinesis_spark.sinks.mock import MockClientFactory

        return MockClientFactory(store_dir=store)
    from frinesis_spark.sinks.kinesis import make_boto3_client_factory

    endpoint = options.get("endpoint")
    if endpoint:
        return make_boto3_client_factory(
            {
                "AWS_REGION_NAME": options.get("region", "us-east-1"),
                "KINESIS_ENDPOINT": endpoint,
            }
        )
    return make_boto3_client_factory()


def _seq_after(a: str, b: str) -> bool:
    """True iff sequence number ``a`` is strictly beyond ``b``.
    Kinesis sequence numbers are big-integer strings that increase
    within a shard; non-numeric values (an exotic mock) fall back to
    False, preserving the equality-stop behavior."""
    try:
        return int(a) > int(b)
    except (TypeError, ValueError):
        return False


def _stream_name(options: dict) -> str:
    name = options.get("stream")
    if not name:
        raise ValueError(
            f"{FORMAT_NAME}: required option 'stream' (stream name) missing"
        )
    return name


class _ShardPartition(InputPartition):
    def __init__(self, shard_id: str):
        self.shard_id = shard_id


class KinesisBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.stream = _stream_name(self.options)
        self.factory = _client_factory(self.options)

    def partitions(self):
        from frinesis_spark.sources.kinesis import list_shard_ids

        shard_ids = list_shard_ids(self.factory(), self.stream)
        return [_ShardPartition(s) for s in shard_ids] or [_ShardPartition("")]

    def read(self, partition: _ShardPartition):
        if not partition.shard_id:
            return
        from frinesis_spark.sources.kinesis import _drain_shard

        yield from _drain_shard(
            self.factory(), self.stream, partition.shard_id, 10_000
        )


class _WroteCount(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class KinesisDataSourceWriter(DataSourceWriter):
    """Input rows need a binary ``data`` column; ``partition_key`` and
    ``stream`` columns are honored when present (per-topic routing,
    A1), else the option stream + a fresh UUID key (A16)."""

    def __init__(self, options: dict):
        from frinesis_spark.sinks.kinesis import KinesisSinkConfig

        self.options = dict(options)
        self.default_stream = _stream_name(self.options)
        self.factory = _client_factory(self.options)
        # Config resolves on the DRIVER and pickles to tasks: reading
        # env on the executor silently ignores driver-side tuning (the
        # same worker-fork hazard the endpoint option exists for), and
        # diverges from KinesisBatchWriter, which takes driver config.
        cfg = KinesisSinkConfig.from_env()
        # Synchronous writer task → blocking buffer policy (drain
        # inline when full); see KinesisBatchWriter.__init__.
        cfg.add_blocks_when_buffer_full = True
        cfg.validate()
        self.config = cfg

    def write(self, iterator):
        from frinesis_spark.sinks.kinesis import (
            BatchProducer,
            _payload_bytes,
        )

        client = self.factory()
        cfg = self.config
        producers: dict[str, BatchProducer] = {}
        n = 0
        for row in iterator:
            d = row.asDict()
            stream = d.get("stream") or self.default_stream
            prod = producers.get(stream)
            if prod is None:
                prod = BatchProducer(client, stream, cfg)
                producers[stream] = prod
            prod.add(_payload_bytes(d["data"]), d.get("partition_key"))
            n += 1
        for stream, prod in producers.items():
            _, remaining = prod.flush(cfg.flush_timeout_s)
            if remaining:
                raise RuntimeError(
                    f"{FORMAT_NAME}: {remaining} records undelivered to "
                    f"{stream!r} at drain deadline"
                )
        return _WroteCount(n)

    def commit(self, messages):
        return None

    def abort(self, messages):  # at-least-once: nothing to roll back
        return None


class KinesisSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch incremental reads; offset = {shard_id: last-read
    sequence number, or "" before any read}.

    Kinesis sequence numbers are **opaque and non-contiguous**, so the
    offset stores the last sequence number actually read and resumes
    with ``AFTER_SEQUENCE_NUMBER`` — never seq+1 arithmetic (which only
    holds for log-offset mocks and is an ``InvalidArgumentException``
    against the real API). Shards are re-listed at every ``read`` so a
    resharded stream's new shards enter the offset map (from
    TRIM_HORIZON) on the next micro-batch.
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.stream = _stream_name(self.options)
        self.factory = _client_factory(self.options)
        # Per-batch record budget (option maxRecordsPerBatch) — bounds
        # the driver-side buffer on a deep backlog; unread records are
        # simply the next batch's start.
        self.max_records = int(
            self.options.get("maxrecordsperbatch", 10_000)
        )

    def initialOffset(self) -> dict:
        from frinesis_spark.sources.kinesis import list_shard_ids

        return {s: "" for s in list_shard_ids(self.factory(), self.stream)}

    def _read_shard_from(
        self,
        client,
        shard_id: str,
        pos: str,
        stop_seq: str | None = None,
        max_records: int | None = None,
    ):
        """Drain one shard from ``pos`` ("" → TRIM_HORIZON, else the
        last-read sequence number → AFTER_SEQUENCE_NUMBER). Returns
        (rows, last-read seq). With ``stop_seq``, stops after emitting
        that record (inclusive replay bound for ``readBetweenOffsets``
        — no ordering assumption on the opaque sequence numbers)."""
        if not pos:
            it = client.get_shard_iterator(
                StreamName=self.stream,
                ShardId=shard_id,
                ShardIteratorType="TRIM_HORIZON",
            )["ShardIterator"]
        else:
            it = client.get_shard_iterator(
                StreamName=self.stream,
                ShardId=shard_id,
                ShardIteratorType="AFTER_SEQUENCE_NUMBER",
                StartingSequenceNumber=str(pos),
            )["ShardIterator"]
        rows, last = [], pos
        while it:
            if max_records is not None and len(rows) >= max_records:
                break
            # Budget-aware Limit (r9 review wave 8): the budget check
            # between calls alone let ONE get_records overshoot
            # per-shard budgets by up to 10k records into the
            # driver-side list.
            limit = 10_000
            if max_records is not None:
                limit = max(1, min(limit, max_records - len(rows)))
            resp = client.get_records(ShardIterator=it, Limit=limit)
            for rec in resp.get("Records", []):
                seq = str(rec["SequenceNumber"])
                # Replay bound safety (r9 review wave 8): if the
                # stop record itself is gone (aged past retention),
                # the equality stop never fires and the replay would
                # silently drain to the live tip — records beyond the
                # committed end belong to LATER batches. Kinesis
                # sequence numbers increase within a shard, so a
                # numeric beyond-the-bound record ends the replay
                # WITHOUT being included.
                if stop_seq is not None and _seq_after(seq, stop_seq):
                    return rows, last
                last = seq
                rows.append(
                    (
                        self.stream,
                        shard_id,
                        last,
                        rec.get("PartitionKey"),
                        bytes(rec.get("Data") or b""),
                    )
                )
                if stop_seq is not None and last == stop_seq:
                    return rows, last
            it = resp.get("NextShardIterator")
            if not resp.get("Records") and not resp.get("MillisBehindLatest"):
                break
        return rows, last

    def read(self, start: dict):
        from frinesis_spark.sources.kinesis import list_shard_ids

        client = self.factory()
        positions = dict(start)
        # Resharding pickup: new shards start from TRIM_HORIZON.
        for shard_id in list_shard_ids(client, self.stream):
            positions.setdefault(shard_id, "")
        rows: list = []
        end: dict = {}
        # Per-batch record budget, split across shards: an unbounded
        # drain-to-tip buffers the ENTIRE retained backlog in this
        # driver-side list on the first batch (and against sustained
        # ingest may never catch the tip). Unread backlog is simply
        # the next batch's starting offset.
        per_shard = max(1, self.max_records // max(1, len(positions)))
        for shard_id, pos in positions.items():
            try:
                shard_rows, last = self._read_shard_from(
                    client, shard_id, pos, max_records=per_shard
                )
            except Exception as exc:  # noqa: BLE001 — boto3 client error
                # A resharded-away shard that has aged past retention
                # vanishes from the stream; keeping it in the offset
                # map would fail THIS and every retried batch forever.
                # Retire it — but only on the SPECIFIC AWS error code,
                # and only after confirming the shard (not the whole
                # stream) is what vanished: a stream-level
                # ResourceNotFound (stream deleted/renamed mid-run)
                # must surface, not silently retire every shard and
                # read empty batches forever (ADVICE r7).
                code = (
                    getattr(exc, "response", None) or {}
                ).get("Error", {}).get("Code", "")
                if code != "ResourceNotFoundException":
                    raise
                live = list_shard_ids(client, self.stream)  # raises if
                # the stream itself is gone — the failure we must keep
                if shard_id in live:
                    raise  # shard exists; the error was about the
                    # stream/iterator state, not shard retirement
                _LOG.warning(
                    "kinesis shard %s/%s vanished (aged past "
                    "retention after reshard); retiring its offset",
                    self.stream,
                    shard_id,
                )
                continue
            rows.extend(shard_rows)
            end[shard_id] = last
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        client = self.factory()
        rows: list = []
        for shard_id, stop in end.items():
            pos = start.get(shard_id, "")
            if not stop or stop == pos:
                continue  # shard had no data in this batch
            shard_rows, _ = self._read_shard_from(
                client, shard_id, pos, stop_seq=str(stop)
            )
            rows.extend(shard_rows)
        return iter(rows)

    def commit(self, end: dict) -> None:
        return None


class KinesisDataSourceStreamWriter(DataSourceStreamWriter):
    """``writeStream.format('kinesis_frinesis')`` — the reference's
    actual deployment shape (unbounded stream → Kinesis egress,
    sink.go:66-77) under the connector contract: every micro-batch's
    tasks run the same BatchProducer path as the batch writer
    (chunking/backoff/retry/shed/drain, A3–A11), commit/abort are
    per-epoch no-ops because delivery is at-least-once by design
    (requeue-at-back, batchproducer.go:360, :425-426 — replays after a
    failed epoch re-send, exactly the reference's semantics)."""

    def __init__(self, options: dict):
        self._batch = KinesisDataSourceWriter(options)

    def write(self, iterator):
        return self._batch.write(iterator)

    def commit(self, messages, batchId) -> None:
        return None

    def abort(self, messages, batchId) -> None:
        return None


class _ShardSlice(InputPartition):
    def __init__(self, shard_id: str, start: int, end: int):
        self.shard_id = shard_id
        self.start = start
        self.end = end


class KinesisPartitionedStreamReader(DataSourceStreamReader):
    """High-throughput streaming variant: each micro-batch plans one
    ``InputPartition`` per shard slice [start, end) and EXECUTORS read
    their shard directly — data never moves through the driver
    (contrast the simple reader, which prefetches driver-side). This
    is the reader shape that scales with shard count.

    Offset planning needs the log tip per shard (``latestOffset``);
    the mock store exposes it directly. Real Kinesis has no cheap
    "latest sequence" control call — a production deployment caps each
    batch with a max-records budget instead (rate limiting, A3's
    backpressure analog), so this reader requires the mock path and
    raises otherwise, which makes Spark fall back to the simple
    reader.
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.stream = _stream_name(self.options)
        if (
            not self.options.get("mock_store_dir")
            or self.options.get("partitioned_stream", "false").lower()
            != "true"
        ):
            # Spark's _streamReader catches exactly this error type and
            # falls back to simpleStreamReader.
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={
                    "feature": (
                        "partitioned kinesis stream reader (opt in with "
                        "partitioned_stream=true; mock store only — the "
                        "boto3 path uses the simple reader)"
                    )
                },
            )
        self.factory = _client_factory(self.options)

    def initialOffset(self) -> dict:
        from frinesis_spark.sources.kinesis import list_shard_ids

        return {s: 0 for s in list_shard_ids(self.factory(), self.stream)}

    def latestOffset(self) -> dict:
        client = self.factory()
        from frinesis_spark.sources.kinesis import list_shard_ids

        return {
            s: len(client._shard_log(self.stream))
            for s in list_shard_ids(client, self.stream)
        }

    def partitions(self, start: dict, end: dict):
        return [
            _ShardSlice(s, int(start.get(s, 0)), int(e))
            for s, e in end.items()
            if int(e) > int(start.get(s, 0))
        ] or [_ShardSlice("", 0, 0)]

    def read(self, partition: _ShardSlice):
        if not partition.shard_id:
            return
        client = self.factory()
        # Conditional kwargs (r9 review wave 8): the real Kinesis API
        # rejects TRIM_HORIZON + StartingSequenceNumber with
        # InvalidArgumentException — latent behind the mock-only
        # guard, but this class is documented as the shared-logic
        # high-throughput variant.
        it_kwargs = dict(
            StreamName=self.stream,
            ShardId=partition.shard_id,
        )
        if partition.start == 0:
            it_kwargs["ShardIteratorType"] = "TRIM_HORIZON"
        else:
            it_kwargs["ShardIteratorType"] = "AT_SEQUENCE_NUMBER"
            it_kwargs["StartingSequenceNumber"] = str(partition.start)
        it = client.get_shard_iterator(**it_kwargs)["ShardIterator"]
        while it:
            resp = client.get_records(ShardIterator=it, Limit=10_000)
            for rec in resp.get("Records", []):
                if int(rec["SequenceNumber"]) >= partition.end:
                    return
                yield (
                    self.stream,
                    partition.shard_id,
                    rec.get("SequenceNumber"),
                    rec.get("PartitionKey"),
                    bytes(rec.get("Data") or b""),
                )
            it = resp.get("NextShardIterator")
            if not resp.get("Records") and not resp.get("MillisBehindLatest"):
                return

    def commit(self, end: dict) -> None:
        return None

    def stop(self) -> None:
        return None


class KinesisDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return READ_SCHEMA

    def reader(self, schema) -> KinesisBatchReader:
        return KinesisBatchReader(self.options)

    def writer(self, schema, overwrite: bool) -> KinesisDataSourceWriter:
        if overwrite:
            # A stream cannot be truncated; silently treating
            # mode('overwrite') as append would hand back duplicated
            # data with no error.
            raise ValueError(
                f"{FORMAT_NAME} supports only append mode "
                "(a Kinesis stream cannot be overwritten)"
            )
        return KinesisDataSourceWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> KinesisDataSourceStreamWriter:
        return KinesisDataSourceStreamWriter(self.options)

    def streamReader(self, schema) -> KinesisPartitionedStreamReader:
        # Raises NotImplementedError on the boto3 path → Spark falls
        # back to simpleStreamReader below.
        return KinesisPartitionedStreamReader(self.options)

    def simpleStreamReader(self, schema) -> KinesisSimpleStreamReader:
        return KinesisSimpleStreamReader(self.options)


def register(spark) -> None:
    """Make the format available: ``spark.read.format('kinesis_frinesis')``."""
    spark.dataSource.register(KinesisDataSource)
