#!/usr/bin/env python
"""Interleaved A/B: streaming state-store partition count
(SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS), min-of-N per (query, arm).

    python tools/ab_stream_parts.py [reps]
"""

from __future__ import annotations

import os
import sys
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

ARMS = ["8", "4", "2"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frinesis_spark import registry
    from frinesis_spark.session import get_spark

    spark = get_spark("ab_stream_parts")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for arm in ARMS:
        os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = arm
        for n in QUERIES:
            run(n)

    best: dict[tuple, float] = {}
    for rep in range(reps):
        for arm in ARMS:
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = arm
            for n in QUERIES:
                t = run(n)
                k = (n, arm)
                best[k] = min(best.get(k, 9e9), t)
        print(f"-- rep {rep + 1}/{reps} done", flush=True)

    print(f"\n{'query':32s}" + "".join(f"{'p'+a:>11s}" for a in ARMS))
    tot = {a: 0.0 for a in ARMS}
    for n in QUERIES:
        row = "".join(f"{best[(n, a)]:11.3f}" for a in ARMS)
        for a in ARMS:
            tot[a] += best[(n, a)]
        print(f"{n:32s}{row}")
    print(f"{'TOTAL':32s}" + "".join(f"{tot[a]:11.3f}" for a in ARMS))


if __name__ == "__main__":
    main()
