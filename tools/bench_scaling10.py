#!/usr/bin/env python
"""One decade PAST sf1: per-query scaling exponents sf1 → sf10 for the
scale-critical families (r12 verdict item 1 — every exponent measured
before r13 stopped at sf1, so the 100 TB mandate was extrapolated from
6M rows; this tool measures the next decade at 60M-row lineitem /
500k-doc corpus / 200k-vector embeddings / 10M-row events).

Same discipline as tools/bench_scaling.py (one Spark session, untimed
warm rep, min-of-reps, fixtures from tools/gen_fixtures.py at BOTH
points so the corpus family is identical) and the SAME flag rule:
``exp_1_10 = log10(t10/t1) > 1.25`` with ``t_sf10 >= 1.0 s`` flags a
superlinear query. Writes ``BENCH_scaling_sf10.json``.

Query set = the families the verdict names as scale-critical:
  * window_rolling_quantile          (bounded-overlap exact percentile)
  * the ngram dedup family           (inverted-index join + CC)
  * dedup_embedding_ann (+ _audit)   (IVF probe + exact / sampled grade)
  * tokenize_pack_sequences          (md5-bucket packing)
  * the streaming state family       (micro-batch state-store shapes)

Annotations:
  * ``grader_quadratic`` — the timed query INCLUDES a superlinear
    exact-Jaccard in-query grader that production replaces with a
    sampled audit; reported, never flagged.
  * ``dedup_embedding_ann`` is EXCLUDED at sf10 by declaration (its
    in-query grade is the full exact O(n²) pair set — ~45 min/rep at
    200k vectors); ``dedup_embedding_ann_audit`` — the size-absolute
    O(n) audit that replaces it at scale (r13) — is measured in full,
    and its exponent is the number that answers "does ANN-dedup
    grading scale".

Usage: python tools/bench_scaling10.py   (run SOLO — no other Spark
JVM; ~30-60 min dominated by fixture generation + the sf10 exact-grade
matmuls).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIRS = [
    ("sf1", str(REPO / ".sf1")),
    ("sf10", str(REPO / ".sf10")),
]
SF_VALUES = {"sf1": 1.0, "sf10": 10.0}

SCALE_CRITICAL = [
    "window_rolling_quantile",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_containment_ngram",
    "dedup_incremental_jaccard",
    "dedup_cluster_cc",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_embedding_ann",
    "dedup_embedding_ann_audit",
    # r14 (verdict item 4): the serving ANN top-k paths, measured at
    # the decade now that lists scales ~sqrt(corpus) (141 cells at
    # sf1, 447 at sf10).
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "tokenize_pack_sequences",
    "stream_tumbling_agg",
    "stream_dedup_stateful",
    "stream_dedup_bounded",
    "stream_incremental_batches",
    "stream_stream_join",
]

# The timed query includes a deliberately-exact in-query grader term
# whose production form is a sampled audit (SCALE.md) — reported, not
# flagged (same convention as tools/bench_scaling.py). EMPTY since
# r14: the minhash/simhash grades adopted the size-absolute audit
# slice (r13 verdict item 1), so no registered query times a
# quadratic grader any more — every row is held to the flag rule.
GRADER_QUADRATIC: set[str] = set()

# Excluded at sf10 by declaration, mirroring bench_scaling.py's sf1
# exclusion of dedup_embedding_cosine: dedup_embedding_ann grades the
# ANN pass against the FULL exact O(n²) pair set in-query (its
# documented correctness-time contract) — 27 s at sf1 (20k vectors)
# extrapolates to ~45 min/rep at sf10 (200k vectors, 100× the
# matmul). The production grading shape at this scale is
# dedup_embedding_ann_audit (size-absolute O(n) audit slice, r13),
# which IS measured here — the audit exponent is the number that
# answers "does ANN dedup grading scale", and the serving ANN pass
# itself is identical between the two queries.
SF10_EXCLUDED = {"dedup_embedding_ann"}

FLAG_EXP = 1.25
FLAG_SEC = 1.0


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    # sf10 holds 10× the state of any prior measurement (60M-row
    # lineitem, 27M exploded shingles, 10M-row streaming state): the
    # default 8g heap OOMed in dedup_cluster_cc's CC iterations on the
    # first attempt. 32g on the 128 GiB host; a REAL cluster spreads
    # this across executors — local[32] concentrates every partition
    # in one JVM, which is a measurement-harness constraint, not an
    # operator property.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    from frinesis_spark import registry
    from frinesis_spark.caches import clear_derived_caches
    from frinesis_spark.catalog import TABLES, table
    from frinesis_spark.session import get_spark

    spark = get_spark("frinesis_spark_bench_scaling10")
    queries = registry.queries()

    try:
        load1_start = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        load1_start = -1.0

    results: dict[str, dict] = {}
    for sf_label, sf_dir in SF_DIRS:
        if not Path(sf_dir).exists():
            from tools.gen_fixtures import generate

            print(f"generating {sf_label} fixtures at {sf_dir}",
                  file=sys.stderr)
            generate(SF_VALUES[sf_label], sf_dir)
        for t in TABLES:
            table(spark, sf_dir, t).count()
        queries["agg_group_sum"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

        def run_once(name: str) -> float:
            start = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - start

        for name in SCALE_CRITICAL:
            if name not in queries:
                print(f"WARN: {name} not registered, skipped",
                      file=sys.stderr)
                continue
            if sf_label == "sf10" and name in SF10_EXCLUDED:
                continue
            run_once(name)  # untimed warm rep (caches/indexes/staging)
            t = min(run_once(name) for _ in range(reps))
            results.setdefault(name, {})[f"t_{sf_label}"] = round(t, 3)
            print(f"{sf_label} {name}: {t:.2f}s", flush=True)
        clear_derived_caches()

    out: dict[str, dict] = {}
    flagged: list[str] = []
    for name, ts in results.items():
        row = dict(ts)
        t1, t10 = ts.get("t_sf1"), ts.get("t_sf10")
        if t1 is not None and t10 is not None:
            if t1 > 0:
                row["exp_1_10"] = round(math.log10(t10 / t1), 2)
                if name in GRADER_QUADRATIC:
                    row["grader_quadratic"] = True
                elif row["exp_1_10"] > FLAG_EXP and t10 >= FLAG_SEC:
                    row["flag"] = True
                    flagged.append(name)
            else:
                row["exp_1_10_skipped"] = "t_sf1 rounded to 0"
                if t10 >= FLAG_SEC:
                    row["flag"] = True
                    flagged.append(name)
        out[name] = row

    record = {
        "metric": "per_query_scaling_exponents_sf1_sf10",
        "sf_points": [label for label, d in SF_DIRS if Path(d).exists()],
        "reps": reps,
        "load1_start": load1_start,
        "flag_rule": f"exp_1_10 > {FLAG_EXP} and t_sf10 >= {FLAG_SEC}s",
        "sf10_excluded": sorted(SF10_EXCLUDED),
        "flagged": sorted(flagged),
        "queries": out,
    }
    (REPO / "BENCH_scaling_sf10.json").write_text(
        json.dumps(record, indent=1) + "\n")
    print(json.dumps({
        "flagged": sorted(flagged),
        "n_queries": len(out),
        "out": "BENCH_scaling_sf10.json",
    }))


if __name__ == "__main__":
    main()
