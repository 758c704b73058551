"""Invariant tests for the round-3 operators.

Oracle parity (hash equality vs DuckDB) is covered generically by
test_oracle_parity.py; these pin the *semantic* invariants that a
hash can't express, plus the multiprobe vectorization refactor.
"""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_quantize_error_bound(spark, sf_dir):
    """Symmetric int8 quantization error is ≤ scale/2 by construction
    (floor(x/s + .5) rounds to the nearest level), and q fits int8."""
    from frinesis_spark.operators.similarity import q_embedding_quantize_int8

    rows = q_embedding_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_abs_err <= r.q_scale * 0.5 * (1 + 1e-9)
        assert -127 <= r.q_min <= r.q_max <= 127


def test_ohlc_bar_invariants(spark, sf_dir):
    """open/close lie within [low, high]; event counts total the table."""
    from frinesis_spark.operators.relational import q_time_ohlc_bars

    df = q_time_ohlc_bars(spark, sf_dir)
    bad = df.where(
        (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("low") > F.col("high"))
    ).count()
    assert bad == 0
    from frinesis_spark.catalog import table

    total = table(spark, sf_dir, "events").count()
    assert df.agg(F.sum("n_events")).first()[0] == total


def test_upsert_one_row_per_user(spark, sf_dir):
    from frinesis_spark.catalog import table
    from frinesis_spark.streaming.windows import q_stream_foreach_batch_upsert

    out = q_stream_foreach_batch_upsert(spark, sf_dir)
    n_users = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert out.count() == n_users
    assert out.select("user_id").distinct().count() == n_users


def _naive_multiprobe(emb, planes, n_bands, ppb, pool_n, max_flip, n_probes):
    """The pre-vectorization per-row reference implementation."""
    flip_combos = [
        comb
        for r in range(1, max_flip + 1)
        for comb in itertools.combinations(range(pool_n), r)
    ]
    weights = 1 << np.arange(ppb)
    out = []
    proj_all = emb @ planes
    for i in range(len(emb)):
        for band in range(n_bands):
            p = proj_all[i, band * ppb : (band + 1) * ppb]
            bits = p > 0
            margins = np.abs(p)
            pool = np.argsort(margins)[:pool_n]
            sq = margins[pool] ** 2
            scored = sorted(flip_combos, key=lambda c: sq[list(c)].sum())[
                : n_probes - 1
            ]
            buckets = [int((bits * weights).sum())]
            for comb in scored:
                b = bits.copy()
                b[pool[list(comb)]] ^= True
                buckets.append(int((b * weights).sum()))
            for bkt in buckets:
                out.append((i, band, bkt))
    return out


def test_multiprobe_vectorization_matches_naive(spark, sf_dir):
    """The numpy-matmul multiprobe produces the same (id, band, bucket)
    rows in the same order as the per-row loop it replaced."""
    from frinesis_spark.operators import similarity as S

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
    )
    got = [
        (r.vec_id, r.band_idx, r.bucket)
        for r in S._multiprobe(e, "vec_id", "embedding").collect()
    ]
    emb = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in e.collect()]
    )
    ids = [r.vec_id for r in e.collect()]
    naive = _naive_multiprobe(
        emb,
        S._plane_matrix(),
        S._N_BANDS,
        S._PLANES_PER_BAND,
        S._FLIP_POOL,
        S._MAX_FLIP,
        S._N_PROBES,
    )
    want = [(ids[i], band, bkt) for i, band, bkt in naive]
    # mapInPandas preserves row order within the single input partition,
    # so the comparison is order-sensitive on purpose.
    assert got == want
