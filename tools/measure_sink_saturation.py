#!/usr/bin/env python
"""Sink saturation curve with a SHARDED measurement stub — r11 verdict
item 7: the r11 curve regressed at 16 producers because the single
stub server process saturated, so the producer ceiling was never
measured. This tool forks one stub-server PROCESS per two producers
(the server side scales with offered load, as real Kinesis does — the
service is sharded by design) and extends the curve until the
bottleneck is attributable to the PRODUCER side: per-producer
throughput holding at the single-producer wire ceiling while servers
idle is producer-bound; per-producer throughput collapsing while host
load pins at core count is host-bound — either way the knee is no
longer the measurement harness.

Every point keeps the exactly-once delivery contract: 10% injected
per-record failures, and the sum of server-side delivered records
must equal the offered record count (zero loss, zero dup) or the
point FAILS loudly.

Usage: python tools/measure_sink_saturation.py   (run SOLO — no Spark
JVM or pytest on the box; ~1-2 min). Writes BENCH_saturation.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CALL_LATENCY_S = 0.015
RECORDS_PER_PRODUCER = 20_000
PRODUCER_COUNTS = (1, 2, 4, 8, 16, 32)
PRODUCERS_PER_SERVER = 2
STREAM = "bench.sink"
DEADLINE_S = 300.0
PAYLOAD = b"The cheese is old and moldy, where is the bathroom?"


def _server_proc(q_ep, stop_ev, q_out) -> None:
    """One stub shard: own process, own HTTP server, own stream state.
    Reports its endpoint at start and its delivered-record count at
    shutdown."""
    from frinesis_spark.sinks.kinesis import make_boto3_client_factory
    from tests.kinesis_stub import KinesisStub

    with KinesisStub(
        fail_every_nth_record=10, call_latency_s=CALL_LATENCY_S
    ) as stub:
        factory = make_boto3_client_factory(
            {"AWS_REGION_NAME": "us-east-1", "KINESIS_ENDPOINT": stub.endpoint}
        )
        factory().create_stream(StreamName=STREAM, ShardCount=8)
        q_ep.put(stub.endpoint)
        stop_ev.wait()
        delivered = sum(
            len(sh.records) for sh in stub.state.streams[STREAM]
        )
        q_out.put(delivered)


def _producer_proc(endpoint: str, n: int, offset: int, barrier, q_out) -> None:
    from frinesis_spark.sinks.kinesis import (
        BatchProducer,
        KinesisSinkConfig,
        make_boto3_client_factory,
    )

    factory = make_boto3_client_factory(
        {"AWS_REGION_NAME": "us-east-1", "KINESIS_ENDPOINT": endpoint}
    )
    prod = BatchProducer(
        factory(), STREAM, KinesisSinkConfig(add_blocks_when_buffer_full=True)
    )
    barrier.wait(timeout=DEADLINE_S)
    start = time.perf_counter()
    for i in range(offset, offset + n):
        prod.add(PAYLOAD, f"pk{i}")
    _, remaining = prod.flush()
    wall = time.perf_counter() - start
    s = prod.stats
    q_out.put(
        {
            "wall": wall,
            "remaining": remaining,
            "retries": s.retries,
            "dropped": s.records_dropped,
            "shed": s.records_shed,
        }
    )


def _drain(q, n: int, procs, what: str) -> list:
    out = []
    for _ in range(n):
        try:
            out.append(q.get(timeout=DEADLINE_S))
        except Exception:
            dead = [
                i for i, p in enumerate(procs) if p.exitcode not in (None, 0)
            ]
            raise RuntimeError(
                f"{what} process(es) {dead} died (exitcodes "
                f"{[procs[i].exitcode for i in dead]}) before reporting"
            ) from None
    return out


def run_point(ctx, n_producers: int) -> dict:
    n_servers = max(1, n_producers // PRODUCERS_PER_SERVER)
    stop_ev = ctx.Event()
    q_ep, q_srv, q_prod = ctx.Queue(), ctx.Queue(), ctx.Queue()
    servers = [
        ctx.Process(target=_server_proc, args=(q_ep, stop_ev, q_srv), daemon=True)
        for _ in range(n_servers)
    ]
    for s in servers:
        s.start()
    endpoints = _drain(q_ep, n_servers, servers, "stub server")

    barrier = ctx.Barrier(n_producers + 1)
    producers = [
        ctx.Process(
            target=_producer_proc,
            args=(
                endpoints[p % n_servers],
                RECORDS_PER_PRODUCER,
                p * RECORDS_PER_PRODUCER,
                barrier,
                q_prod,
            ),
            daemon=True,
        )
        for p in range(n_producers)
    ]
    for p in producers:
        p.start()
    barrier.wait(timeout=DEADLINE_S)
    t0 = time.perf_counter()
    stats = _drain(q_prod, n_producers, producers, "producer")
    wall = time.perf_counter() - t0
    for p in producers:
        p.join(timeout=DEADLINE_S)
    load = os.getloadavg()
    stop_ev.set()
    delivered = sum(_drain(q_srv, n_servers, servers, "stub server"))
    for s in servers:
        s.join(timeout=DEADLINE_S)

    n_total = n_producers * RECORDS_PER_PRODUCER
    lost = n_total - delivered
    if lost != 0 or any(st["remaining"] or st["dropped"] for st in stats):
        raise RuntimeError(
            f"delivery contract broken at {n_producers} producers: "
            f"delivered {delivered}/{n_total}, stats {stats}"
        )
    agg = int(n_total / wall)
    return {
        "producers": n_producers,
        "servers": n_servers,
        "records": n_total,
        "wall_sec": round(wall, 2),
        "agg_rps": agg,
        "per_producer_rps": int(agg / n_producers),
        "slowest_producer_wall": round(max(st["wall"] for st in stats), 2),
        "retries": sum(st["retries"] for st in stats),
        "shed": sum(st["shed"] for st in stats),
        "delivered": delivered,
        "loadavg_1m": round(load[0], 1),
    }


def main() -> None:
    ctx = mp.get_context("fork")
    points = []
    for n in PRODUCER_COUNTS:
        pt = run_point(ctx, n)
        points.append(pt)
        print(json.dumps(pt), flush=True)
    single = points[0]["per_producer_rps"]
    record = {
        "metric": "sink_saturation_curve_sharded_stub",
        "call_latency_ms": CALL_LATENCY_S * 1000,
        "records_per_producer": RECORDS_PER_PRODUCER,
        "producers_per_server": PRODUCERS_PER_SERVER,
        "host_cores": os.cpu_count(),
        "single_producer_rps": single,
        "points": points,
        "scaling_vs_single": [
            round(p["agg_rps"] / single / p["producers"], 2) for p in points
        ],
    }
    with open(os.path.join(REPO, "BENCH_saturation.json"), "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(
        json.dumps(
            {
                "out": "BENCH_saturation.json",
                "curve": {p["producers"]: p["agg_rps"] for p in points},
            }
        )
    )


if __name__ == "__main__":
    main()
