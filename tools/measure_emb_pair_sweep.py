#!/usr/bin/env python
"""Recall-vs-candidate-volume sweep for the embedding-dedup pair pass
(r15, r14 verdict item 1).

The r14 coverage hold (probe = lists/8) pinned the pair pass at n²/8
FLOPs at every geometry — an 8× constant over all-pairs, not an
asymptotic win. This sweep measures the replacement — corpus-side
multi-assignment (each vector in its c nearest cells; candidate =
co-membership) — across c and scale:

  * raw candidate join volume: Σ_cells |memb_cell|² computed from the
    per-cell COUNTS (O(lists) arithmetic — the Σdf² trick from the
    containment disposition; nothing is materialized);
  * distinct candidate pairs (the re-rank input);
  * full-grade recall vs the exact O(n²) pair set at sf0.01/0.1/1
    (the exact side at sf1 is a 20k² block matmul — feasible once,
    cached across c points);
  * audit-slice recall at sf1/sf10 (the production grading shape —
    the full exact set at 200k vectors is ~45 min of matmul, excluded
    by the same declaration bench_scaling10.py documents);
  * with ``--sf100``: a third decade (2M vectors, lists 1414, L=7 —
    the regime where the OR-amplification rule carries the recall
    floor almost entirely), embeddings-only fixture generated on
    demand into .sf100.

Run SOLO (no other Spark JVM). Writes JSON to stdout for SCALE.md.
Usage: python tools/measure_emb_pair_sweep.py [--sf100] [c ...]
(default c sweep: 3 4 6)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_POINTS = [
    ("sf0.01", "/root/testdata/sf0.01", True, False),
    ("sf0.1", "/root/testdata/sf0.1", True, False),
    ("sf1", str(REPO / ".sf1"), True, True),
    ("sf10", str(REPO / ".sf10"), False, True),
]

# --sf100: the third decade (2M vectors, lists 1414, L rule gives 7).
# Embeddings-only fixture, generated on demand with gen_fixtures'
# distribution rule (unit gaussians — the ≥0.45 pairs are the natural
# d=64 cosine tail, same population as every smaller point).
SF100_POINT = ("sf100", str(REPO / ".sf100"), False, True)


def _gen_sf100_embeddings(out_dir: str, n: int = 2_000_000) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    chunk = 250_000
    path = os.path.join(out_dir, "embeddings.parquet")
    with pq.ParquetWriter(path, schema) as w:
        for s in range(0, n, chunk):
            m = min(chunk, n - s)
            emb = rng.normal(0, 1, (m, 64))
            emb /= np.linalg.norm(emb, axis=1, keepdims=True)
            w.write_table(
                pa.table(
                    {
                        "vec_id": np.arange(s, s + m, dtype=np.int64),
                        "embedding": pa.FixedSizeListArray.from_arrays(
                            pa.array(emb.astype(np.float32).ravel()), 64
                        ).cast(pa.list_(pa.float32())),
                        "label": pa.array(
                            rng.integers(0, 10, m), pa.int32()
                        ),
                    },
                    schema=schema,
                )
            )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--sf100"]
    cs = [int(a) for a in args] or [3, 4, 6]
    points = list(SF_POINTS)
    if "--sf100" in sys.argv[1:]:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
        label, d, _, _ = SF100_POINT
        if not (Path(d) / "embeddings.parquet").exists():
            print(f"# generating {label} embeddings at {d}", file=sys.stderr)
            _gen_sf100_embeddings(d)
        points.append(SF100_POINT)

    from pyspark.sql import functions as F

    from frinesis_spark.caches import clear_derived_caches
    from frinesis_spark.catalog import table
    from frinesis_spark.operators import dedup as D
    from frinesis_spark.session import get_spark

    spark = get_spark("frinesis_spark_emb_pair_sweep")
    results = []
    exact_counts: dict[str, int] = {}
    audit_exact_counts: dict[str, int] = {}
    for sf_label, sf_dir, full_grade, audit_grade in points:
        if not Path(sf_dir).exists():
            print(f"# skipping {sf_label}: {sf_dir} missing", file=sys.stderr)
            continue
        n = table(spark, sf_dir, "embeddings").count()
        mod = D._ann_audit_mod(n)
        # Exact sides are c-independent: compute once per sf point.
        if full_grade:
            exact_counts[sf_label] = (
                D.q_dedup_embedding_cosine(spark, sf_dir).count()
            )
        if audit_grade:
            audit_exact_counts[sf_label] = D.audit_exact_cosine_pairs(
                spark, sf_dir, audit_mod=mod
            ).count()
        for c in cs:
            D._EMB_ANN_ASSIGN_OVERRIDE = c
            try:
                clear_derived_caches()
                t0 = time.perf_counter()
                memb = D._emb_ann_membership(spark, sf_dir)
                build_s = round(time.perf_counter() - t0, 2)
                # Raw join volume from counts only (O(L·lists)).
                raw_volume = (
                    memb.groupBy("part", "cell")
                    .count()
                    .agg(F.sum(F.col("count") * F.col("count")))
                    .collect()[0][0]
                )
                from frinesis_spark.operators import similarity as S

                lists = S._ivf_lists(n)
                row = {
                    "sf": sf_label,
                    "n": n,
                    "c": c,
                    "L": D._emb_ann_partitions(lists, c),
                    "build_s": build_s,
                    "raw_join_volume": int(raw_volume),
                    "volume_frac_of_n2": round(raw_volume / n / n, 4),
                }
                t0 = time.perf_counter()
                cand = D.embedding_ann_pairs(spark, sf_dir)
                if full_grade:
                    hits = cand.count()
                    row["ann_pairs"] = hits
                    row["full_recall"] = round(
                        hits / max(exact_counts[sf_label], 1), 3
                    )
                    row["n_exact"] = exact_counts[sf_label]
                if audit_grade:
                    a_hits = D.embedding_ann_pairs(
                        spark, sf_dir, audit_mod=mod
                    ).count()
                    row["audit_recall"] = round(
                        a_hits / max(audit_exact_counts[sf_label], 1), 3
                    )
                    row["n_audit_exact"] = audit_exact_counts[sf_label]
                row["grade_s"] = round(time.perf_counter() - t0, 2)
                results.append(row)
                print(json.dumps(row), flush=True)
            finally:
                D._EMB_ANN_ASSIGN_OVERRIDE = None
        clear_derived_caches()
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
