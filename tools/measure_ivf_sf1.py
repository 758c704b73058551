#!/usr/bin/env python
"""Measure IVF cold index-build + recall/candidate trade across lists
geometries and scale factors (r10 verdict item 6).

``BENCH_full.json "cold"`` records cold builds at the bench sf only,
and the lists~sqrt(corpus) sizing claim (similarity.py) had never been
measured at a second scale. This harness builds the IVF index COLD
(derived caches cleared) at sf0.1 (the bench anchor, lists=64) and at
sf1 (20k embeddings) for lists in {64, 141, 181} — 141 = round(sqrt
(20000)), the sqrt-sizing point; 64 = the registered default; 181 =
the verdict's upper probe — and records build wall, measured recall
of the top-5 against the exact brute force, and candidate fraction.

The lists override is a measurement knob only (module attribute set
per run, caches cleared between runs); the registered query geometry
is untouched. Results go to stdout as JSON for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def measure(spark, sf_dir: str, lists: int) -> dict:
    import pyspark.sql.functions as F  # noqa: F401

    from frinesis_spark.caches import clear_derived_caches
    from frinesis_spark.operators import similarity as S

    orig = S._IVF_LISTS_OVERRIDE
    S._IVF_LISTS_OVERRIDE = lists
    try:
        clear_derived_caches()
        load0 = round(os.getloadavg()[0], 1)
        t0 = time.perf_counter()
        cells, cents = S.ivf_index(spark, sf_dir)
        n_corpus = cells.count()
        cold_s = time.perf_counter() - t0

        exact = S.q_similarity_topk_cosine(spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        ann = S.ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
        n_exact = exact.count()
        hits = exact.join(ann, ["query_id", "neighbor_id"]).count()
        n_q = exact.select("query_id").distinct().count()
        cand = S.ivf_candidate_pairs(spark, sf_dir).count()
        return {
            "sf_dir": sf_dir,
            "lists": lists,
            "probe": S._IVF_PROBE,
            "corpus": n_corpus,
            "cold_build_sec": round(cold_s, 2),
            "recall_at_5": round(hits / max(n_exact, 1), 3),
            "candidate_fraction": round(cand / (n_q * (n_corpus - 1)), 4),
            "loadavg": load0,
        }
    finally:
        S._IVF_LISTS_OVERRIDE = orig
        clear_derived_caches()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from frinesis_spark.session import get_spark

    spark = get_spark("measure_ivf_sf1")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the Python-worker pool / Arrow path first (one discarded
    # sf0.01 build): the first mapInPandas in a session pays worker
    # fork + import cost that is session setup, not build time — the
    # same warmup bench.py applies.
    measure(spark, "/root/testdata/sf0.01", 64)

    runs = [("/root/testdata/sf0.1", 64)]
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", str(REPO / ".sf1"))
    if os.path.isdir(sf1):
        runs += [(sf1, 64), (sf1, 141), (sf1, 181)]
    else:
        print(f"sf1 fixtures absent at {sf1}", file=sys.stderr)
    out = [measure(spark, d, n) for d, n in runs]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
