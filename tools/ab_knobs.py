#!/usr/bin/env python
"""Interleaved A/B of runtime knobs over named queries (r15).

Round-robins configs WITHIN one session so host drift hits all arms
equally; min-of-N per (query, config). Knobs are runtime SQL confs
plus the split-staging env vars (the staging cache is invalidated
between arms so each arm re-stages under its own geometry).

    python tools/ab_knobs.py <queries-csv> <reps>

Edit CONFIGS below per experiment.
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
# The registry's per-query shape wrapper (r16) re-sets the two split
# knobs at build time — disable it so each arm's explicit conf wins.
os.environ.setdefault("SPARK_GRAFT_SHAPE_CONF", "0")

# Each config: (label, {sql conf: value}, {env var: value})
_FLOOR = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
CONFIGS = [
    (
        "cur",
        {"spark.sql.files.openCostInBytes": "1048576", _FLOOR: "64k"},
        {"SPARK_GRAFT_SPLIT_STAGE": "1"},
    ),
    (
        "aqe1m",
        {"spark.sql.files.openCostInBytes": "1048576", _FLOOR: "1m"},
        {"SPARK_GRAFT_SPLIT_STAGE": "1"},
    ),
    (
        "open4m",
        {"spark.sql.files.openCostInBytes": "4194304", _FLOOR: "64k"},
        {"SPARK_GRAFT_SPLIT_STAGE": "1"},
    ),
    (
        "coarse",
        {"spark.sql.files.openCostInBytes": "4194304", _FLOOR: "1m"},
        {"SPARK_GRAFT_SPLIT_STAGE": "1"},
    ),
]


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frinesis_spark import catalog, registry
    from frinesis_spark.session import get_spark

    spark = get_spark("ab_knobs")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def apply(confs: dict, env: dict) -> None:
        for k, v in confs.items():
            spark.conf.set(k, v)
        for k, v in env.items():
            os.environ[k] = v

    # warm every (query, config) once: codegen, page cache, cached
    # index artifacts, and each arm's staged relayout
    for label, confs, env in CONFIGS:
        apply(confs, env)
        for n in names:
            run(n)

    best: dict[tuple, float] = {}
    for rep in range(reps):
        for label, confs, env in CONFIGS:
            apply(confs, env)
            for n in names:
                t = run(n)
                k = (n, label)
                best[k] = min(best.get(k, 9e9), t)
        print(f"-- rep {rep + 1}/{reps} done", flush=True)

    labels = [c[0] for c in CONFIGS]
    print(f"\n{'query':32s}" + "".join(f"{lab:>11s}" for lab in labels))
    tot = {lab: 0.0 for lab in labels}
    for n in names:
        row = "".join(f"{best[(n, lab)]:11.3f}" for lab in labels)
        for lab in labels:
            tot[lab] += best[(n, lab)]
        print(f"{n:32s}{row}")
    print(f"{'TOTAL':32s}" + "".join(f"{tot[lab]:11.3f}" for lab in labels))


if __name__ == "__main__":
    main()
