"""Minimal in-process Kinesis HTTP endpoint for the wire-path tests.

The reference proves its delivery guarantees against a live Kinesis
API via docker-compose + localstack (docker-compose.yml:1-10,
integration_test.go:159-198); this sandbox has no container runtime or
network, so this module serves the same AWS JSON-1.1 protocol surface
(``X-Amz-Target: Kinesis_20131202.<Op>`` over HTTP POST) from a
threading HTTP server inside the test process. boto3 talks to it
exactly as it would to localstack — real request signing headers,
real base64 blob encoding/decoding, real ``Records`` /
``FailedRecordCount`` casing — so the layer the mock-client unit
tests are silent on (the wire shape) actually executes.

Operations implemented (the set the engine's sink + shard-drain loop
touches): CreateStream, DescribeStream, DeleteStream, ListShards,
PutRecords, GetShardIterator, GetRecords. Streams become ACTIVE
immediately. Shard iterators are stateless base64 tokens of
(stream, shard, offset), so GetRecords pagination and the
TRIM_HORIZON catch-up contract (_drain_shard, sources/kinesis.py:46)
behave like the real service's.

Optional fault injection: ``fail_first_puts=N`` makes the first N
PutRecords calls report every record as
``ProvisionedThroughputExceededException`` in the per-record
``Records`` array (FailedRecordCount > 0, HTTP 200) — the partial-
failure shape the reference's retry path is built around
(batchproducer.go's sendBatch split).
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _KinesisState:
    def __init__(self, fail_first_puts: int = 0):
        self.lock = threading.Lock()
        # stream -> list of shards; each shard is a list of
        # (sequence_number, partition_key, data_bytes, arrival_ts)
        self.streams: dict[str, list[list[tuple]]] = {}
        self.seq = 0
        self.fail_first_puts = fail_first_puts
        self.put_calls = 0

    def next_seq(self) -> str:
        self.seq += 1
        return str(self.seq)


def _err(code: str, msg: str) -> tuple[int, dict]:
    return 400, {"__type": code, "message": msg}


def _shard_id(i: int) -> str:
    return f"shardId-{i:012d}"


def _route(partition_key: str, n_shards: int) -> int:
    """Deterministic key→shard routing (stands in for the service's
    MD5-of-key hash-range split; same distribution property)."""
    h = hashlib.md5(partition_key.encode()).digest()
    return int.from_bytes(h[:8], "big") % n_shards


class _Handler(BaseHTTPRequestHandler):
    state: _KinesisState  # set by serve()

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):  # noqa: N802 - http.server API
        length = int(self.headers.get("Content-Length") or 0)
        body = json.loads(self.rfile.read(length) or b"{}")
        target = self.headers.get("X-Amz-Target", "")
        op = target.split(".")[-1]
        handler = getattr(self, f"_op_{op}", None)
        if handler is None:
            status, resp = _err(
                "UnknownOperationException", f"unsupported op {op!r}"
            )
        else:
            with self.state.lock:
                status, resp = handler(body)
        payload = json.dumps(resp).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    # -- control plane ------------------------------------------------
    def _op_CreateStream(self, body):  # noqa: N802
        name = body["StreamName"]
        if name in self.state.streams:
            return _err("ResourceInUseException", name)
        self.state.streams[name] = [
            [] for _ in range(int(body.get("ShardCount", 1)))
        ]
        return 200, {}

    def _op_DeleteStream(self, body):  # noqa: N802
        name = body["StreamName"]
        if name not in self.state.streams:
            return _err("ResourceNotFoundException", name)
        del self.state.streams[name]
        return 200, {}

    def _op_DescribeStream(self, body):  # noqa: N802
        name = body["StreamName"]
        shards = self.state.streams.get(name)
        if shards is None:
            return _err("ResourceNotFoundException", name)
        return 200, {
            "StreamDescription": {
                "StreamName": name,
                "StreamARN": f"arn:aws:kinesis:stub:000000000000:stream/{name}",
                "StreamStatus": "ACTIVE",
                "RetentionPeriodHours": 24,
                "EnhancedMonitoring": [],
                "HasMoreShards": False,
                "Shards": [
                    {
                        "ShardId": _shard_id(i),
                        "HashKeyRange": {
                            "StartingHashKey": "0",
                            "EndingHashKey": "340282366920938463463374607431768211455",
                        },
                        "SequenceNumberRange": {"StartingSequenceNumber": "0"},
                    }
                    for i in range(len(shards))
                ],
            }
        }

    def _op_ListShards(self, body):  # noqa: N802
        name = body.get("StreamName")
        if name is None:
            return _err("InvalidArgumentException", "NextToken unsupported")
        shards = self.state.streams.get(name)
        if shards is None:
            return _err("ResourceNotFoundException", name)
        return 200, {
            "Shards": [
                {
                    "ShardId": _shard_id(i),
                    "HashKeyRange": {
                        "StartingHashKey": "0",
                        "EndingHashKey": "340282366920938463463374607431768211455",
                    },
                    "SequenceNumberRange": {"StartingSequenceNumber": "0"},
                }
                for i in range(len(shards))
            ]
        }

    # -- data plane ---------------------------------------------------
    def _op_PutRecords(self, body):  # noqa: N802
        name = body["StreamName"]
        shards = self.state.streams.get(name)
        if shards is None:
            return _err("ResourceNotFoundException", name)
        records = body.get("Records", [])
        if not 1 <= len(records) <= 500:
            return _err(
                "ValidationException", f"{len(records)} records per call"
            )
        self.state.put_calls += 1
        if self.state.put_calls <= self.state.fail_first_puts:
            return 200, {
                "FailedRecordCount": len(records),
                "Records": [
                    {
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "stub-injected throttle",
                    }
                    for _ in records
                ],
            }
        out = []
        for rec in records:
            try:
                data = base64.b64decode(rec["Data"], validate=True)
            except (KeyError, binascii.Error):
                return _err("SerializationException", "bad Data blob")
            pk = rec.get("PartitionKey", "")
            idx = _route(pk, len(shards))
            seq = self.state.next_seq()
            shards[idx].append((seq, pk, data, time.time()))
            out.append({"SequenceNumber": seq, "ShardId": _shard_id(idx)})
        return 200, {"FailedRecordCount": 0, "Records": out}

    def _op_GetShardIterator(self, body):  # noqa: N802
        name = body["StreamName"]
        shards = self.state.streams.get(name)
        if shards is None:
            return _err("ResourceNotFoundException", name)
        shard = body["ShardId"]
        idx = int(shard.rsplit("-", 1)[1])
        if not 0 <= idx < len(shards):
            return _err("ResourceNotFoundException", shard)
        it_type = body.get("ShardIteratorType", "TRIM_HORIZON")
        if it_type == "TRIM_HORIZON":
            offset = 0
        elif it_type == "LATEST":
            offset = len(shards[idx])
        else:
            return _err(
                "InvalidArgumentException", f"iterator type {it_type}"
            )
        token = base64.b64encode(
            json.dumps({"s": name, "i": idx, "o": offset}).encode()
        ).decode()
        return 200, {"ShardIterator": token}

    def _op_GetRecords(self, body):  # noqa: N802
        token = json.loads(base64.b64decode(body["ShardIterator"]))
        name, idx, offset = token["s"], token["i"], token["o"]
        shards = self.state.streams.get(name)
        if shards is None:
            return _err("ResourceNotFoundException", name)
        limit = min(int(body.get("Limit", 10_000)), 10_000)
        chunk = shards[idx][offset : offset + limit]
        nxt = base64.b64encode(
            json.dumps({"s": name, "i": idx, "o": offset + len(chunk)}).encode()
        ).decode()
        return 200, {
            "Records": [
                {
                    "SequenceNumber": seq,
                    "ApproximateArrivalTimestamp": ts,
                    "PartitionKey": pk,
                    "Data": base64.b64encode(data).decode(),
                }
                for seq, pk, data, ts in chunk
            ],
            "NextShardIterator": nxt,
            "MillisBehindLatest": 0,
        }


class KinesisStub:
    """Context manager owning the server thread; ``endpoint`` is the
    ``host:port`` string to export as ``KINESIS_ENDPOINT``."""

    def __init__(self, fail_first_puts: int = 0):
        state = _KinesisState(fail_first_puts)
        handler = type("BoundHandler", (_Handler,), {"state": state})
        self.state = state
        self.server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    @property
    def endpoint(self) -> str:
        host, port = self.server.server_address[:2]
        return f"{host}:{port}"

    def __enter__(self) -> "KinesisStub":
        self.thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.server.shutdown()
        self.server.server_close()
        self.thread.join(timeout=5)
