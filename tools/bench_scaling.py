#!/usr/bin/env python
"""Per-query scaling exponents across sf0.01 / sf0.1 / sf1 — the r9
verdict's top item: turn the repo's design-argued 100 TB claims into
measured scaling curves.

Runs the bench.py HEADLINE set at three scale factors in ONE Spark
session (local[$SPARK_GRAFT_CPUS], same warm-up discipline as
bench.py: untimed warm rep per query, then min-of-reps), and writes
``BENCH_scaling.json``:

  queries[name] = {t_sf0.01, t_sf0.1, t_sf1,
                   exp_001_1:  log10(t1/t001)/2   (the verdict formula),
                   exp_01_1:   log10(t1/t01)      (floor-free estimate),
                   flag: true if exp_01_1 > FLAG_EXP and t_sf1 >= FLAG_SEC}

exp_001_1 understates data-dependent growth when the sf0.01 time is
dominated by the per-query scheduling floor (~0.1-0.3 s on this host);
exp_01_1 over one decade with a >= 1 s sf1 time is the flag-worthy
estimate.  Linear scan-bound queries land ~1.0; sub-linear means the
floor still dominates; meaningfully > 1 means superlinear work.

sf1 exclusions (declared, per the verdict): ``dedup_embedding_cosine``
is the exact O(n²) grader primitive — its quadratic cost is its
documented contract, and at sf1 (20k vectors = 200M pairs vs sf0.1's
2M) it would drown the measurement of the production path
(dedup_embedding_ann).  Self-grading queries whose in-query audit term
is quadratic (minhash/simhash exact-Jaccard grader, the ANN recall
graders) are RUN but annotated ``grader_quadratic`` — their exponent
reflects the audit term, which at production scale becomes a sampled
check (SCALE.md), so they are reported but not flagged.

Usage: python tools/bench_scaling.py   (~30-45 min; run SOLO — no
other Spark JVM on the box, and generate /root/repo/.sf1 first via
tools/gen_fixtures.py)
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

# All three points come from tools/gen_fixtures.py (auto-generated
# below when missing), NOT from the driver's /root/testdata dirs —
# r12: the documents fixture diverged deliberately (open Heaps-law
# vocabulary vs the driver's closed 30-word list, gen_fixtures.py's
# documents entry), and a scaling exponent is only meaningful when
# every point is drawn from the same corpus family. Non-document
# tables remain distribution-matched to the driver data, so the other
# queries' exponents are comparable with pre-r12 curves.
SF_DIRS = [
    ("sf0.01", str(REPO / ".sf001x")),
    ("sf0.1", str(REPO / ".sf01x")),
    ("sf1", str(REPO / ".sf1")),
]
SF_VALUES = {"sf0.01": 0.01, "sf0.1": 0.1, "sf1": 1.0}

# exact O(n²) by declared contract — excluded at sf1 (see module doc)
SF1_EXCLUDED = {"dedup_embedding_cosine"}

# run everywhere, but the timed query INCLUDES a quadratic in-query
# audit term (exact-Jaccard / exact-top-k grader) that production
# replaces with a sampled check — annotated, never flagged
# r14 shrank this set: the minhash/simhash grades now sample the
# exact-Jaccard side to the size-absolute md5 audit slice (r13 verdict
# item 1), so only the three embedding-family queries still time an
# exact grader — similarity_ann_lsh/ivf grade against the exact
# brute-force top-k and dedup_embedding_ann against the full exact
# pair set, both by declared correctness-time contract (the production
# grading shape is dedup_embedding_ann_audit).
GRADER_QUADRATIC = {
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "dedup_embedding_ann",
}

FLAG_EXP = 1.25  # exp_01_1 above this is superlinear beyond noise
FLAG_SEC = 1.0  # ...but only when the sf1 time carries real work


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    import bench  # repo-root bench.py: HEADLINE + CACHE_BACKED

    from frinesis_spark import registry
    from frinesis_spark.caches import clear_derived_caches
    from frinesis_spark.catalog import TABLES, table
    from frinesis_spark.session import get_spark

    spark = get_spark("frinesis_spark_bench_scaling")
    queries = registry.queries()

    results: dict[str, dict] = {}
    for sf_label, sf_dir in SF_DIRS:
        if not Path(sf_dir).exists():
            from tools.gen_fixtures import generate

            print(f"generating {sf_label} fixtures at {sf_dir}",
                  file=sys.stderr)
            generate(SF_VALUES[sf_label], sf_dir)
        # Session warm-up per sf: footer reads + first-scan decodes +
        # Python worker pool, mirroring bench.py.
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

        for name in bench.HEADLINE:
            if name not in queries:
                continue
            if sf_label == "sf1" and name in SF1_EXCLUDED:
                continue
            run_once(name)  # untimed warm rep (builds caches/artifacts)
            t = min(run_once(name) for _ in range(reps))
            results.setdefault(name, {})[f"t_{sf_label}"] = round(t, 3)
            print(f"{sf_label} {name}: {t:.2f}s", flush=True)
        # sf-scoped derived caches would otherwise pile up three
        # corpora of signatures/indexes in one JVM
        clear_derived_caches()

    out: dict[str, dict] = {}
    flagged: list[str] = []
    for name, ts in results.items():
        row = dict(ts)
        t001, t01, t1 = (
            ts.get("t_sf0.01"), ts.get("t_sf0.1"), ts.get("t_sf1"))
        # `is not None`, never truthiness: a sub-0.5 ms rep rounds to
        # 0.0 and must not silently drop the exponent (and with it the
        # superlinear flag — the tool's whole purpose); a zero
        # denominator is surfaced instead of skipped.
        if t001 is not None and t1 is not None:
            if t001 > 0:
                row["exp_001_1"] = round(math.log10(t1 / t001) / 2, 2)
            else:
                row["exp_001_1_skipped"] = "t_sf0.01 rounded to 0"
                print(f"WARN {name}: t_sf0.01 == 0, exponent skipped",
                      file=sys.stderr)
        if t01 is not None and t1 is not None:
            if t01 > 0:
                row["exp_01_1"] = round(math.log10(t1 / t01), 2)
                if name in GRADER_QUADRATIC:
                    row["grader_quadratic"] = True
                elif row["exp_01_1"] > FLAG_EXP and t1 >= FLAG_SEC:
                    row["flag"] = True
                    flagged.append(name)
            else:
                row["exp_01_1_skipped"] = "t_sf0.1 rounded to 0"
                # a zero base with real sf1 work is ITSELF flag-worthy
                if t1 >= FLAG_SEC:
                    row["flag"] = True
                    flagged.append(name)
                print(f"WARN {name}: t_sf0.1 == 0, exponent skipped",
                      file=sys.stderr)
        out[name] = row

    record = {
        "metric": "per_query_scaling_exponents",
        "sf_points": [label for label, d in SF_DIRS if Path(d).exists()],
        "reps": reps,
        "flag_rule": f"exp_01_1 > {FLAG_EXP} and t_sf1 >= {FLAG_SEC}s",
        "sf1_excluded": sorted(SF1_EXCLUDED),
        "flagged": sorted(flagged),
        "queries": out,
    }
    (REPO / "BENCH_scaling.json").write_text(
        json.dumps(record, indent=1) + "\n")
    print(json.dumps({
        "flagged": sorted(flagged),
        "n_queries": len(out),
        "out": "BENCH_scaling.json",
    }))


if __name__ == "__main__":
    main()
