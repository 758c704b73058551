#!/usr/bin/env python
"""Generate driver-distribution-matched fixture tables at an arbitrary
scale factor — the sf1 scaling-measurement prerequisite (r9 verdict
items 1 and 5: every number ever measured is sf ≤ 0.1).

The driver's own generator is not available, so this reproduces the
OBSERVED distributions of /root/testdata/sf{0.001,0.01,0.1} (probed
column by column at r10 start; every rule below was verified against
at least two scale factors):

  region/nation      fixed 5 / 25 rows, n_regionkey = n_nationkey % 5
  customer           150k*sf rows; acctbal ~ U(-1000, 10000) 2dp;
                     mktsegment uniform over the 5 TPC-H segments
  supplier           10k*sf rows; same acctbal rule
  part               200k*sf rows; name = adj x noun (8x8);
                     brand = Brand#U{1..25}; type uniform over 6;
                     size U{1..50}; retailprice = 900 + (key%1000)/10
  orders             1.5M*sf rows; custkey uniform; status/priority
                     uniform; totalprice U(1000, 500000) 2dp;
                     orderdate = 1995-01-01 + U{0..2404} days
  lineitem           ~6M*sf rows: orderkey uniform over orders (per-
                     order count is therefore Binomial ~= Poisson(4),
                     ~e^-4 of orders childless — matches the observed
                     per-order histogram); partkey/suppkey uniform;
                     linenumber U{1..7}; quantity U{1..50};
                     extendedprice U(900, 105000) 2dp (independent of
                     quantity — CORR ~= 0.001 in the driver data);
                     discount U{0.00..0.10}; tax U{0.00..0.08};
                     shipdate = 1995-01-01 + U{0..2404} + U{1..95} days
  events             1M*sf rows over the FIXED 30-day span
                     [2024-01-01, 2024-01-31) (density scales, span
                     does not), sorted by ts with event_id = row
                     number (the driver file is time-ordered);
                     user_id U{0..15000*sf}; type uniform over 5;
                     value ~ Exp(mean 50) 2dp; props = {"k": U{0..99}}
  documents          max(500, 50k*sf) rows; text = U{10..100} words
                     drawn Zipf-Mandelbrot (p(r) ∝ 1/(r+2.7)^1.07)
                     from an OPEN Heaps-law vocabulary of
                     V = max(1000, 50·√n_doc) types (r12, verdict
                     item 1 — DELIBERATE divergence from the driver
                     fixture's closed 30-word vocab: a closed vocab
                     makes shingle document-frequency grow linearly
                     with n, so every inverted-index ngram query
                     measures superlinear for corpus-degeneracy
                     reasons, not plan reasons — the like-for-like
                     counter-measurement is tools/measure_heaps_
                     ngram.py, exp 0.545 vs 1.34/decade. The 30
                     legacy words keep ranks 0-29, so they remain the
                     stopword head). 5% of docs are planted
                     near-dups: a random base doc's text + 0-2 " dup"
                     suffix words (3% of dups exact — jac spectrum
                     0.8-1.0 preserved);
                     lang ~ {en:.4, de/es/fr/zh:.15}; source =
                     src{doc_id%20}; n_chars = len(text)
  embeddings         max(500, 20k*sf) rows; 64-dim unit-normalized
                     gaussian, float32; label U{0..9}.  The >=0.45
                     cosine pairs the dedup/ANN fixtures rely on are
                     the natural tail of the d=64 cosine distribution
                     (~8e-5 of pairs), same as the driver data.

Physical layout mirrors the driver files: one snappy parquet per
table, pyarrow defaults (so sf1's lineitem naturally splits into
multiple row groups, as a real ingest would).

Usage:  python tools/gen_fixtures.py [--sf 1.0] [--out /root/repo/.sf1]
Deterministic for a given (sf, seed); seed defaults to 42 like the
driver's.  NOT bit-identical to driver files (different RNG stream) —
distribution-matched, which is what the scaling measurement needs.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

EPOCH_1995 = np.datetime64("1995-01-01")
EVENTS_START_US = np.datetime64("2024-01-01", "us").astype(np.int64)
EVENTS_SPAN_US = 30 * 86_400 * 1_000_000


def _write(out: str, name: str, **cols) -> None:
    arrays, names = [], []
    for k, v in cols.items():
        names.append(k)
        arrays.append(v if isinstance(v, pa.Array) else pa.array(v))
    pq.write_table(pa.table(arrays, names=names), os.path.join(out, f"{name}.parquet"))


def generate(sf: float, out: str, seed: int = 42) -> dict[str, int]:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out, "region",
           r_regionkey=pa.array(range(5), pa.int32()),
           r_name=["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
    _write(out, "nation",
           n_nationkey=pa.array(range(25), pa.int32()),
           n_name=[f"NATION_{i}" for i in range(25)],
           n_regionkey=pa.array([i % 5 for i in range(25)], pa.int32()))

    ck = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer",
           c_custkey=ck,
           c_name=[f"Customer#{i:09d}" for i in range(n_cust)],
           c_nationkey=pa.array(rng.integers(0, 25, n_cust), pa.int32()),
           c_acctbal=np.round(rng.uniform(-1000, 10000, n_cust), 2),
           c_mktsegment=np.array(SEGMENTS)[rng.integers(0, 5, n_cust)])

    _write(out, "supplier",
           s_suppkey=np.arange(n_supp, dtype=np.int64),
           s_name=[f"Supplier#{i:09d}" for i in range(n_supp)],
           s_nationkey=pa.array(rng.integers(0, 25, n_supp), pa.int32()),
           s_acctbal=np.round(rng.uniform(-1000, 10000, n_supp), 2))

    pk = np.arange(n_part, dtype=np.int64)
    _write(out, "part",
           p_partkey=pk,
           p_name=[f"{ADJS[a]} {NOUNS[b]}" for a, b in
                   zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
           p_brand=[f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
           p_type=np.array(PTYPES)[rng.integers(0, 6, n_part)],
           p_size=pa.array(rng.integers(1, 51, n_part), pa.int32()),
           p_retailprice=900.0 + (pk % 1000) / 10.0)

    odate_days = rng.integers(0, 2405, n_ord)
    _write(out, "orders",
           o_orderkey=np.arange(n_ord, dtype=np.int64),
           o_custkey=rng.integers(0, n_cust, n_ord),
           o_orderstatus=np.array(STATUSES)[rng.integers(0, 3, n_ord)],
           o_totalprice=np.round(rng.uniform(1000, 500000, n_ord), 2),
           o_orderdate=pa.array(
               (EPOCH_1995 + odate_days.astype("timedelta64[D]"))
               .astype("datetime64[us]")),
           o_orderpriority=np.array(PRIORITIES)[rng.integers(0, 5, n_ord)])

    ship_days = rng.integers(0, 2405, n_li) + rng.integers(1, 96, n_li)
    _write(out, "lineitem",
           l_orderkey=rng.integers(0, n_ord, n_li),
           l_partkey=rng.integers(0, n_part, n_li),
           l_suppkey=rng.integers(0, n_supp, n_li),
           l_linenumber=pa.array(rng.integers(1, 8, n_li), pa.int32()),
           l_quantity=rng.integers(1, 51, n_li).astype(np.float64),
           l_extendedprice=np.round(rng.uniform(900, 105000, n_li), 2),
           l_discount=np.round(rng.integers(0, 11, n_li) / 100.0, 2),
           l_tax=np.round(rng.integers(0, 9, n_li) / 100.0, 2),
           l_returnflag=np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
           l_linestatus=np.array(["F", "O"])[rng.integers(0, 2, n_li)],
           l_shipdate=pa.array(
               (EPOCH_1995 + ship_days.astype("timedelta64[D]"))
               .astype("datetime64[us]")))

    ts = np.sort(rng.integers(0, EVENTS_SPAN_US, n_ev)) + EVENTS_START_US
    _write(out, "events",
           event_id=np.arange(n_ev, dtype=np.int64),
           ts=pa.array(ts, pa.timestamp("us")),
           user_id=rng.integers(0, n_users, n_ev),
           event_type=np.array(ETYPES)[rng.integers(0, 5, n_ev)],
           value=np.round(rng.exponential(50.0, n_ev), 2),
           props=[json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)])

    # Open Heaps-law vocabulary (see the documents entry in the module
    # doc): V grows ~√n_doc, ranks sampled Zipf-Mandelbrot via inverse
    # CDF (searchsorted beats rng.choice-with-p ~10× at sf1's ~2.8M
    # token draws). Legacy 30-word head keeps old text-op fixtures
    # recognizable; the tail is doc-local types.
    v_size = max(1000, int(50 * np.sqrt(n_doc)))
    vocab = np.array(
        VOCAB + [f"w{r:05d}" for r in range(len(VOCAB), v_size)]
    )
    zipf_p = 1.0 / (np.arange(v_size, dtype=np.float64) + 2.7) ** 1.07
    zipf_cdf = np.cumsum(zipf_p / zipf_p.sum())
    n_words = rng.integers(10, 101, n_doc)
    tok_ranks = np.searchsorted(
        zipf_cdf, rng.random(int(n_words.sum())), side="right"
    )
    offs = np.concatenate(([0], np.cumsum(n_words)))
    texts = [
        " ".join(vocab[tok_ranks[offs[i]:offs[i + 1]]])
        for i in range(n_doc)
    ]
    n_dup = int(0.05 * n_doc)
    dup_ids = rng.choice(n_doc, size=n_dup, replace=False)
    for j in dup_ids:
        base = int(rng.integers(0, n_doc))
        while base == j:
            base = int(rng.integers(0, n_doc))
        c = int(rng.choice([0, 1, 2], p=[0.03, 0.485, 0.485]))
        texts[j] = texts[base] + " dup" * c
    _write(out, "documents",
           doc_id=np.arange(n_doc, dtype=np.int64),
           text=texts,
           lang=np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
           source=[f"src{i % 20}" for i in range(n_doc)],
           n_chars=np.array([len(t) for t in texts], dtype=np.int64))

    emb = rng.normal(0, 1, (n_emb, 64))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb32 = emb.astype(np.float32)
    _write(out, "embeddings",
           vec_id=np.arange(n_emb, dtype=np.int64),
           embedding=pa.FixedSizeListArray.from_arrays(
               pa.array(emb32.ravel()), 64).cast(pa.list_(pa.float32())),
           label=pa.array(rng.integers(0, 10, n_emb), pa.int32()))

    return {"customer": n_cust, "orders": n_ord, "lineitem": n_li,
            "events": n_ev, "documents": n_doc, "embeddings": n_emb}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/repo/.sf1")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    counts = generate(args.sf, args.out, args.seed)
    print(json.dumps({"sf": args.sf, "out": args.out, **counts}))
