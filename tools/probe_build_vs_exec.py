#!/usr/bin/env python
"""Split warm per-query wall into DataFrame-BUILD time (Python plan
construction + analysis, driver-side) vs EXECUTION time (noop write),
min-of-N each.

    python tools/probe_build_vs_exec.py <queries-csv> [reps]
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


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frinesis_spark import registry
    from frinesis_spark.session import get_spark

    spark = get_spark("probe_build_vs_exec")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    for n in names:  # warm
        df = queries[n](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    print(f"{'query':32s}{'build':>9s}{'exec':>9s}{'total':>9s}")
    for n in names:
        bb, ee = 9e9, 9e9
        for _ in range(reps):
            t0 = time.perf_counter()
            df = queries[n](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            bb = min(bb, t1 - t0)
            ee = min(ee, t2 - t1)
        print(f"{n:32s}{bb:9.3f}{ee:9.3f}{bb+ee:9.3f}", flush=True)


if __name__ == "__main__":
    main()
