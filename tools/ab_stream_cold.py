#!/usr/bin/env python
"""Cold-JVM A/B of streaming knobs under the DRIVER's protocol (r16).

The r15 in-session interleaved A/B (tools/ab_stream_parts.py) said 4
state partitions beat 8; the driver's cold-JVM bench said the
opposite (stream_stream_join 0.74x). One of the two protocols lies —
this tool replays the driver's: each sample is a FRESH python/JVM
process that warms up exactly like bench.py (noop over agg_group_sum,
Python-worker pool warm, fixture touch, one untimed rep per query)
and then times the streaming family best-of-3 with the noop sink.
Arms are interleaved process-by-process (A,B,A,B,...) so host drift
hits both equally.

    python tools/ab_stream_cold.py [outer_reps]

Edit ARMS below per experiment.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

QUERIES = [
    "stream_stream_join",
    "stream_watermark_late",
    "stream_dedup_stateful",
    "stream_dedup_bounded",
    "stream_incremental_batches",
]

# label -> env overrides for the child process
ARMS: dict[str, dict[str, str]] = {
    "hdfs_p4": {"SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS": "4"},
    "hdfs_p3": {"SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS": "3"},
    "hdfs_p2": {"SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS": "2"},
}

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from frinesis_spark import registry
from frinesis_spark.session import get_spark

spark = get_spark("ab_stream_cold")
spark.sparkContext.setLogLevel("ERROR")
queries = registry.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# bench.py's warmup: codegen, Python worker pool, fixture footers
queries["agg_group_sum"](spark, sf_dir).write.format("noop").mode(
    "overwrite").save()
warm = spark.range(0, 10_000, numPartitions=32)
def _noop(batches):
    import numpy, pandas  # noqa: F401
    yield from batches
warm.mapInPandas(_noop, warm.schema).write.format("noop").mode(
    "overwrite").save()
from frinesis_spark.catalog import TABLES, table
for t in TABLES:
    table(spark, sf_dir, t).count()

names = {names!r}
def run(n):
    t0 = time.perf_counter()
    queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

for n in names:  # untimed warm rep (bench.py's warmup sweep)
    run(n)
out = {{}}
for n in names:
    out[n] = round(min(run(n) for _ in range(3)), 3)
print("ABRESULT " + json.dumps(out))
"""


def main() -> None:
    outer = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, dict[str, list[float]]] = {
        a: {n: [] for n in QUERIES} for a in ARMS
    }
    script = _CHILD.format(repo=str(REPO), names=QUERIES)
    for rep in range(outer):
        for arm, env_over in ARMS.items():
            env = dict(os.environ)
            env.update(
                {
                    "SPARK_GRAFT_CPUS": "32",
                    "SPARK_GRAFT_SHUFFLE_PARTITIONS": "32",
                    **env_over,
                }
            )
            p = subprocess.run(
                [sys.executable, "-c", script],
                capture_output=True,
                text=True,
                env=env,
                timeout=1800,
            )
            line = next(
                (
                    ln
                    for ln in p.stdout.splitlines()
                    if ln.startswith("ABRESULT ")
                ),
                None,
            )
            if line is None:
                print(f"arm {arm} rep {rep}: CHILD FAILED\n{p.stderr[-2000:]}")
                continue
            got = json.loads(line[len("ABRESULT "):])
            for n, t in got.items():
                results[arm][n].append(t)
            print(f"-- rep {rep + 1}/{outer} arm {arm}: {got}", flush=True)

    labels = list(ARMS)
    print(f"\n{'query':28s}" + "".join(f"{a:>12s}" for a in labels))
    tot = {a: 0.0 for a in labels}
    for n in QUERIES:
        row = ""
        for a in labels:
            xs = results[a][n]
            v = min(xs) if xs else float("nan")
            tot[a] += v if xs else 0.0
            row += f"{v:12.3f}"
        print(f"{n:28s}{row}")
    print(f"{'TOTAL(min)':28s}" + "".join(f"{tot[a]:12.3f}" for a in labels))
    for a in labels:
        print(f"{a} all-samples:", {n: results[a][n] for n in QUERIES})


if __name__ == "__main__":
    main()
