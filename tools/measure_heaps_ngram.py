#!/usr/bin/env python
"""Measure the ngram-dedup scaling exponent on a HEAPS-LAW corpus.

The three BENCH_scaling flags (`dedup_ngram_jaccard`,
`dedup_containment_ngram`, and `dedup_cluster_cc` via its embedded
pair generation) share one documented root cause: the driver fixture's
CLOSED ~30-word vocabulary makes shingle document-frequency grow
linearly with corpus size, so inverted-index candidate volume
(Σ df²) grows quadratically — a corpus-degeneracy artifact, not a
plan defect (SCALE.md). This tool turns that explanation into a
MEASUREMENT: generate a vocabulary-growing corpus (Heaps' law,
V(n) ∝ √n, Zipf-sampled words — the shape real text actually has),
run the REGISTERED `q_dedup_ngram_jaccard` at two sizes a decade
apart, and report exp = log10(t_big/t_small) next to the closed-vocab
fixture's 1.3+.

Corpus shape mirrors the fixture otherwise: ~54 words/doc, same
schema (doc_id, text, lang, source, n_chars). Deterministic seed.
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (5_000, 50_000)
WORDS_PER_DOC = 54
SEED = 42
OUT_BASE = "/tmp/heaps_corpus"


def gen_corpus(n_docs: int, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    vocab_size = max(1000, int(50 * np.sqrt(n_docs)))  # Heaps: V ∝ √n
    # Zipf-ish rank-frequency: p(r) ∝ 1/(r+2.7)^1.07 (Mandelbrot shift
    # keeps the head from degenerating into a closed mini-vocabulary).
    ranks = np.arange(vocab_size, dtype=np.float64)
    probs = 1.0 / (ranks + 2.7) ** 1.07
    probs /= probs.sum()
    words = np.array([f"w{r}" for r in range(vocab_size)])
    draws = rng.choice(vocab_size, size=(n_docs, WORDS_PER_DOC), p=probs)
    # 1% planted near-dup pairs (doc i+1 = doc i with 3 words swapped)
    # so the query's output and the Jaccard-scoring stage are
    # exercised, ∝ n like a real near-dup population.
    for i in range(0, n_docs - 1, 100):
        draws[i + 1] = draws[i]
        pos = rng.choice(WORDS_PER_DOC, size=3, replace=False)
        draws[i + 1, pos] = rng.choice(vocab_size, size=3, p=probs)
    texts = [" ".join(words[row]) for row in draws]
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(
                [f"src{i % 16}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))


def main() -> None:
    from pyspark.sql import SparkSession

    from frinesis_spark.operators import dedup as D

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n in SIZES:
        out = f"{OUT_BASE}_{n}"
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            gen_corpus(n, out)
        D.q_dedup_ngram_jaccard(spark, out).count()  # warm (index build)
        reps = []
        pairs = None
        for _ in range(3):
            t0 = time.time()
            pairs = D.q_dedup_ngram_jaccard(spark, out).count()
            reps.append(time.time() - t0)
        results[n] = {
            "t_sec": round(min(reps), 3),
            "reps": [round(r, 3) for r in reps],
            "pairs": pairs,
            "load": os.getloadavg()[0],
        }
    t_small = results[SIZES[0]]["t_sec"]
    t_big = results[SIZES[1]]["t_sec"]
    exp = np.log10(t_big / t_small)
    print(
        json.dumps(
            {
                "corpus": "heaps-law (V=50*sqrt(n), Zipf-Mandelbrot 1.07)",
                "sizes": results,
                "exp_decade": round(float(exp), 3),
                "closed_vocab_fixture_exp": 1.34,
            }
        )
    )


if __name__ == "__main__":
    main()
