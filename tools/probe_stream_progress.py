#!/usr/bin/env python
"""Dump StreamingQueryProgress durationMs per micro-batch for the
streaming queries — where does the fixed overhead actually go
(addBatch vs queryPlanning vs walCommit vs commitOffsets vs
stateOperators commit)?

    python tools/probe_stream_progress.py
"""

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frinesis_spark.streaming import runner as runner_mod
    from frinesis_spark import registry
    from frinesis_spark.session import get_spark

    spark = get_spark("probe_stream_progress")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    captured = []
    orig_run = runner_mod.run_append_to_files

    def wrapped(stream_df):
        # replicate orig but capture progress
        import shutil
        import tempfile
        import uuid

        outdir = os.path.join(
            tempfile.gettempdir(), "fs_out_" + uuid.uuid4().hex[:12]
        )
        runner_mod.track_output_dir(outdir)
        ckpt = tempfile.mkdtemp(prefix="fs_ckpt_")
        sp = stream_df.sparkSession
        prev = sp.conf.get("spark.sql.shuffle.partitions")
        clamp = runner_mod.stream_state_partitions(
            int(prev), sp.sparkContext.defaultParallelism
        )
        sp.conf.set("spark.sql.shuffle.partitions", str(clamp))
        try:
            q = (
                stream_df.writeStream.format("parquet")
                .option("path", outdir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
                q.processAllAvailable()
                captured.append([json.loads(p.json) for p in q.recentProgress])
            finally:
                q.stop()
        finally:
            sp.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(ckpt, ignore_errors=True)
        return sp.read.schema(stream_df.schema).parquet(outdir)

    runner_mod.run_append_to_files = wrapped
    from frinesis_spark.streaming import windows as windows_mod

    windows_mod.run_append_to_files = wrapped

    names = [
        "stream_watermark_late",
        "stream_incremental_batches",
        "stream_dedup_stateful",
        "stream_dedup_bounded",
        "stream_stream_join",
    ]
    for name in names:
        # warm staging first
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        captured.clear()
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        print(f"\n### {name}: {total:.3f}s (prior warm {warm:.3f}s)")
        for progs in captured:
            for p in progs:
                dm = p.get("durationMs", {})
                rows = p.get("numInputRows")
                keys = (
                    "latestOffset getBatch queryPlanning addBatch "
                    "walCommit commitOffsets triggerExecution"
                ).split()
                parts = " ".join(f"{k}={dm.get(k, '-')}" for k in keys)
                print(f"  batch {p.get('batchId')}: rows={rows} {parts}")
    print()

    # foreach_batch_upsert separately (doesn't go through run_append_to_files)
    t0 = time.perf_counter()
    df = queries["stream_foreach_batch_upsert"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    print(f"stream_foreach_batch_upsert total {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()
