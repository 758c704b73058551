#!/usr/bin/env python
"""Probe: per-micro-batch durationMs breakdown for the streaming
queries, to locate the fixed overhead the r15 optimization round is
chasing. Monkey-patches runner.run_append_to_files to capture
recentProgress from the real runs."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")

from frinesis_spark import registry
from frinesis_spark.session import get_spark
from frinesis_spark.streaming import runner, windows

spark = get_spark("probe_streaming")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

captured: list[dict] = []

_orig = runner.run_append_to_files


def patched(stream_df):
    import shutil
    import tempfile
    import uuid

    outdir = os.path.join(
        tempfile.gettempdir(), "fs_out_" + uuid.uuid4().hex[:12]
    )
    runner.track_output_dir(outdir)
    ckpt = tempfile.mkdtemp(prefix="fs_ckpt_")
    sp = stream_df.sparkSession
    prev_parts = sp.conf.get("spark.sql.shuffle.partitions")
    clamp = runner.stream_state_partitions(
        int(prev_parts), sp.sparkContext.defaultParallelism
    )
    sp.conf.set("spark.sql.shuffle.partitions", str(clamp))
    try:
        t0 = time.perf_counter()
        query = (
            stream_df.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            t_start = time.perf_counter() - t0
            t1 = time.perf_counter()
            query.processAllAvailable()
            t_paa1 = time.perf_counter() - t1
            t2 = time.perf_counter()
            query.processAllAvailable()
            t_paa2 = time.perf_counter() - t2
            prog = [json.loads(p.json) for p in query.recentProgress]
        finally:
            t3 = time.perf_counter()
            query.stop()
            t_stop = time.perf_counter() - t3
    finally:
        sp.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ckpt, ignore_errors=True)
    captured.append(
        {
            "start_s": round(t_start, 3),
            "paa1_s": round(t_paa1, 3),
            "paa2_s": round(t_paa2, 3),
            "stop_s": round(t_stop, 3),
            "state_parts": clamp,
            "batches": [
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "numRowsTotal",
                                "numRowsUpdated",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
                for p in prog
            ],
        }
    )
    return sp.read.schema(stream_df.schema).parquet(outdir)


runner.run_append_to_files = patched
windows.run_append_to_files = patched

queries = registry.queries()
TARGETS = [
    "stream_watermark_late",
    "stream_incremental_batches",
    "stream_dedup_stateful",
    "stream_dedup_bounded",
    "stream_stream_join",
]

# warm everything once (stages, page cache, codegen)
for name in TARGETS:
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
captured.clear()

for name in TARGETS:
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    info = captured.pop() if captured else {}
    print(f"\n=== {name}: wall {wall:.3f}s ===")
    print(json.dumps(info, indent=1))
