#!/usr/bin/env python
"""Interleaved A/B: streaming scratch (checkpoints, sink outputs,
staged replays) on /dev/shm tmpfs vs the disk-backed system tempdir.

All streaming scratch paths derive from ``tempfile.gettempdir()``, so
flipping ``tempfile.tempdir`` between arms inside ONE session A/Bs the
storage medium with everything else identical. Warmup builds each
arm's staged fixtures first; min-of-N per (query, arm) absorbs host
drift.

    python tools/ab_stream_scratch.py [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")

QUERIES = [
    "stream_watermark_late",
    "stream_incremental_batches",
    "stream_dedup_stateful",
    "stream_dedup_bounded",
    "stream_stream_join",
    "stream_foreach_batch_upsert",
]

ARMS = [("disk", "/tmp"), ("shm", "/dev/shm")]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frinesis_spark import registry
    from frinesis_spark.session import get_spark

    spark = get_spark("ab_stream_scratch")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for label, base in ARMS:  # warmup: staging + codegen per arm
        tempfile.tempdir = base
        for n in QUERIES:
            run(n)

    best: dict[tuple, float] = {}
    for rep in range(reps):
        for label, base in ARMS:
            tempfile.tempdir = base
            for n in QUERIES:
                t = run(n)
                k = (n, label)
                best[k] = min(best.get(k, 9e9), t)
        print(f"-- rep {rep + 1}/{reps} done", flush=True)

    labels = [a[0] for a in ARMS]
    print(f"\n{'query':32s}" + "".join(f"{lab:>11s}" for lab in labels))
    tot = {lab: 0.0 for lab in labels}
    for n in QUERIES:
        row = "".join(f"{best[(n, lab)]:11.3f}" for lab in labels)
        for lab in labels:
            tot[lab] += best[(n, lab)]
        print(f"{n:32s}{row}")
    print(f"{'TOTAL':32s}" + "".join(f"{tot[lab]:11.3f}" for lab in labels))


if __name__ == "__main__":
    main()
