#!/usr/bin/env python
"""Half-decade PAST sf10 for the cheapest scale-critical families
(r13 verdict item 7): per-query scaling exponents sf10 → sf100 for
the streaming-state, packing, and exact-dedup families — the three
whose sf1→sf10 exponents (0.32–0.97) make a second decade affordable.

Fixture economy: sf100's full table set (~600M-row lineitem) would
cost ~20 GB and an hour of generation for tables these families never
read. The measured queries read ONLY ``events`` (streaming state) and
``documents`` (packing, exact dedup, text stats), so `_gen_partial`
writes just those two at sf100 — chunked through a ParquetWriter so
the 100M-row events table never materializes as one Python list. The
distribution rules are gen_fixtures.py's, verbatim (same spans, same
Heaps/Zipf text law, same planted near-dup spectrum); the RNG stream
differs from a hypothetical full-table sf100 run, which is fine — a
scaling measurement needs distribution-matched corpora, not
bit-matched ones (the same waiver gen_fixtures.py itself documents
vs the driver files).

Flag rule is the decade tools' (exp > 1.25 and t >= 1.0 s), scaled to
the half decade: exp_10_100 = log10(t100/t10) is still an exponent
per decade because the corpus ratio is a full 10x (sf10 -> sf100 is
10x the rows; "half-decade" refers to the fixture subset, not the
ratio). Writes BENCH_scaling_sf100.json.

Usage: python tools/bench_scaling100.py   (run SOLO; ~3 GB disk in
.sf100, generation dominates the first run). 96g driver heap REQUIRED:
the default HDFS-backed state store keeps streaming state in the JVM
heap, and sf100's 100M-event unbounded-dedup state OOMed 32g (measured
in-round — stream_dedup_stateful holds every seen event_id). A real
cluster spreads state across executors; at this concentration the
production answer is the RocksDB state store provider (off-heap,
spill-capable) — documented in SCALE.md, deliberately NOT enabled here
so all three decades measure the same engine configuration.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF10_DIR = str(REPO / ".sf10")
SF100_DIR = str(REPO / ".sf100")

# Families cheap enough for the second decade; every query here reads
# only events or documents.
SCALE_CRITICAL = [
    "dedup_exact",
    # r15 (r14 verdict item 6): the ngram family's containment
    # disposition claimed the capped join-row volume exponent decays
    # toward 1.0 as the Heaps mid-df body saturates, "bend ~2 decades
    # out" — previously arithmetic, now measured: both queries run at
    # sf100 docs (5M), and the Σdf² statistic below measures the
    # row-volume exponent directly.
    "dedup_ngram_jaccard",
    "dedup_containment_ngram",
    "tokenize_pack_sequences",
    "text_analysis_stats",
    "stream_tumbling_agg",
    "stream_dedup_stateful",
    "stream_dedup_bounded",
    "stream_incremental_batches",
    "stream_stream_join",
]
TABLES_NEEDED = ("events", "documents")

FLAG_EXP = 1.25
FLAG_SEC = 1.0

ETYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
EVENTS_START_US = np.datetime64("2024-01-01", "us").astype(np.int64)
EVENTS_SPAN_US = 30 * 86_400 * 1_000_000


def _gen_events(out: str, sf: float, rng) -> None:
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    ts = np.sort(
        EVENTS_START_US + rng.integers(0, EVENTS_SPAN_US, n_ev)
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    chunk = 5_000_000
    with pq.ParquetWriter(os.path.join(out, "events.parquet"), schema) as w:
        for s in range(0, n_ev, chunk):
            e = min(s + chunk, n_ev)
            m = e - s
            w.write_table(
                pa.table(
                    {
                        "event_id": np.arange(s, e, dtype=np.int64),
                        "ts": pa.array(ts[s:e], pa.timestamp("us")),
                        "user_id": rng.integers(0, n_users, m),
                        "event_type": np.array(ETYPES)[
                            rng.integers(0, 5, m)
                        ],
                        "value": np.round(rng.exponential(50.0, m), 2),
                        "props": [
                            json.dumps({"k": int(k)})
                            for k in rng.integers(0, 100, m)
                        ],
                    },
                    schema=schema,
                )
            )


def _gen_documents(out: str, sf: float, rng) -> None:
    n_doc = max(500, int(50_000 * sf))
    v_size = max(1000, int(50 * np.sqrt(n_doc)))
    vocab = np.array(VOCAB + [f"w{r:05d}" for r in range(len(VOCAB), v_size)])
    zipf_p = 1.0 / (np.arange(v_size, dtype=np.float64) + 2.7) ** 1.07
    zipf_cdf = np.cumsum(zipf_p / zipf_p.sum())
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    chunk = 500_000
    with pq.ParquetWriter(os.path.join(out, "documents.parquet"), schema) as w:
        for s in range(0, n_doc, chunk):
            e = min(s + chunk, n_doc)
            m = e - s
            n_words = rng.integers(10, 101, m)
            tok_ranks = np.searchsorted(
                zipf_cdf, rng.random(int(n_words.sum())), side="right"
            )
            offs = np.concatenate([[0], np.cumsum(n_words)])
            texts = [
                " ".join(vocab[tok_ranks[offs[i] : offs[i + 1]]])
                for i in range(m)
            ]
            # 5% planted near-dups: base doc text + 0-2 " dup" words
            # (gen_fixtures' spectrum, bases drawn chunk-locally so
            # chunking never needs cross-chunk text)
            n_dup = int(0.05 * m)
            dup_pos = rng.choice(m, n_dup, replace=False)
            dup_base = rng.integers(0, m, n_dup)
            dup_tail = rng.integers(0, 3, n_dup)
            for p, b, t in zip(dup_pos, dup_base, dup_tail):
                texts[p] = texts[b] + " dup" * int(t)
            w.write_table(
                pa.table(
                    {
                        "doc_id": np.arange(s, e, dtype=np.int64),
                        "text": texts,
                        "lang": np.array(LANGS)[
                            rng.choice(5, m, p=LANG_P)
                        ],
                        "source": [f"src{i % 20}" for i in range(s, e)],
                        "n_chars": np.array(
                            [len(t) for t in texts], dtype=np.int64
                        ),
                    },
                    schema=schema,
                )
            )


def _gen_partial(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    _gen_events(out, sf, rng)
    _gen_documents(out, sf, rng)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "96g")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    from frinesis_spark import registry
    from frinesis_spark.caches import clear_derived_caches
    from frinesis_spark.catalog import table
    from frinesis_spark.session import get_spark

    if not (Path(SF100_DIR) / "documents.parquet").exists():
        print(f"generating sf100 partial fixtures at {SF100_DIR}",
              file=sys.stderr)
        _gen_partial(100.0, SF100_DIR)

    spark = get_spark("frinesis_spark_bench_scaling100")
    queries = registry.queries()
    try:
        load1_start = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        load1_start = -1.0

    results: dict[str, dict] = {}
    ngram_stats: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf10", SF10_DIR), ("sf100", SF100_DIR)):
        for t in TABLES_NEEDED:
            table(spark, sf_dir, t).count()

        def run_once(name: str) -> float:
            start = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - start

        for name in SCALE_CRITICAL:
            run_once(name)  # untimed warm rep
            t = min(run_once(name) for _ in range(reps))
            results.setdefault(name, {})[f"t_{sf_label}"] = round(t, 3)
            print(f"{sf_label} {name}: {t:.2f}s", flush=True)
        # Direct join-row-volume statistic for the ngram family (r15):
        # the capped inverted index's Σdf² IS the self-join's row
        # count; its sf10→sf100 exponent is the containment
        # disposition's claim, measured instead of extrapolated. The
        # index is warm from the queries above (cost: one groupBy over
        # postings).
        from pyspark.sql import functions as Fx

        from frinesis_spark.operators.dedup import _cached_shingle_index

        stats = (
            _cached_shingle_index(spark, sf_dir)
            .groupBy("shingle")
            .count()
            .agg(
                Fx.sum("count").alias("postings"),
                Fx.sum(Fx.col("count") * Fx.col("count")).alias("sum_df_sq"),
            )
            .collect()[0]
        )
        ngram_stats[sf_label] = {
            "postings": int(stats["postings"]),
            "sum_df_sq": int(stats["sum_df_sq"]),
        }
        print(f"{sf_label} ngram stats: {ngram_stats[sf_label]}", flush=True)
        clear_derived_caches()

    out: dict[str, dict] = {}
    flagged: list[str] = []
    for name, ts in results.items():
        row = dict(ts)
        t10, t100 = ts.get("t_sf10"), ts.get("t_sf100")
        if t10 and t100 is not None:
            row["exp_10_100"] = round(math.log10(t100 / t10), 2)
            if row["exp_10_100"] > FLAG_EXP and t100 >= FLAG_SEC:
                row["flag"] = True
                flagged.append(name)
        out[name] = row

    provider = os.environ.get("SPARK_GRAFT_STATESTORE", "hdfs-backed")
    record = {
        "metric": "per_query_scaling_exponents_sf10_sf100",
        "sf_points": ["sf10", "sf100"],
        "state_store_provider": provider,
        "tables_generated_at_sf100": list(TABLES_NEEDED),
        "reps": reps,
        "load1_start": load1_start,
        "flag_rule": f"exp_10_100 > {FLAG_EXP} and t_sf100 >= {FLAG_SEC}s",
        "flagged": sorted(flagged),
        "ngram_row_volume": {
            **ngram_stats,
            **({"sum_df_sq_exp_10_100": round(
                __import__("math").log10(
                    ngram_stats["sf100"]["sum_df_sq"]
                    / ngram_stats["sf10"]["sum_df_sq"]
                ), 2)} if len(ngram_stats) == 2 else {}),
        },
        "queries": out,
    }
    name = (
        "BENCH_scaling_sf100.json"
        if provider == "hdfs-backed"
        else f"BENCH_scaling_sf100_{provider}.json"
    )
    (REPO / name).write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps({
        "flagged": sorted(flagged),
        "n_queries": len(out),
        "out": name,
    }))


if __name__ == "__main__":
    main()
