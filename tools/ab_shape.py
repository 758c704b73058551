#!/usr/bin/env python
"""Interleaved A/B of the r16 per-query shape conf (tuning.py):
ON (registry wrapper applies per-shape floors) vs OFF (r15 globals
for every query). Min-of-N per (query, arm), arms round-robined.

    python tools/ab_shape.py <queries-csv> [reps]
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

ARMS = ["on", "off"]


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frinesis_spark import registry
    from frinesis_spark.session import get_spark

    spark = get_spark("ab_shape")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    def apply(arm: str) -> None:
        os.environ["SPARK_GRAFT_SHAPE_CONF"] = "1" if arm == "on" else "0"
        if arm == "off":  # restore the r15 session globals explicitly
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
            )
            spark.conf.set(
                "spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "1048576"),
            )

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for arm in ARMS:
        apply(arm)
        for n in names:
            run(n)

    best: dict[tuple, float] = {}
    for rep in range(reps):
        for arm in ARMS:
            apply(arm)
            for n in names:
                t = run(n)
                k = (n, arm)
                best[k] = min(best.get(k, 9e9), t)
        print(f"-- rep {rep + 1}/{reps} done", flush=True)

    print(f"\n{'query':32s}" + "".join(f"{a:>11s}" for a in ARMS))
    tot = {a: 0.0 for a in ARMS}
    for n in names:
        row = "".join(f"{best[(n, a)]:11.3f}" for a in ARMS)
        for a in ARMS:
            tot[a] += best[(n, a)]
        print(f"{n:32s}{row}")
    print(f"{'TOTAL':32s}" + "".join(f"{tot[a]:11.3f}" for a in ARMS))


if __name__ == "__main__":
    main()
