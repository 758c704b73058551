"""Round-5 hardening tests (the r4 VERDICT/ADVICE punch list):

- per-session caches keyed on ``(applicationId, id(session))`` so a
  stopped-then-recreated context can never be served another context's
  checkpointed artifacts, even if CPython reuses the session ``id()``;
- the minhash DF-cap (counted on xxhash64 shingle hashes) selects the
  SAME stop set as the string-counted ``_shingle_index`` contract on a
  collision-free fixture;
- jaccard queries threshold on the unrounded ratio (a borderline pair
  engineered to round up across the threshold must be excluded, as the
  oracle excludes it);
- NULL-text / missing-``$.k`` rows are dropped identically on the
  Spark and oracle sides of the UDTF chunker and the variant shred.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from frinesis_spark.catalog import session_key


class _FakeContext:
    def __init__(self, app_id: str) -> None:
        self.applicationId = app_id


class _FakeSession:
    def __init__(self, app_id: str) -> None:
        self.sparkContext = _FakeContext(app_id)


def test_session_key_distinguishes_recreated_contexts():
    """A new context (new applicationId) never collides with a dead
    one's cache entries — even when the new session object lands on the
    recycled id() of the old one (the ADVICE r4 hazard)."""
    keys = []
    for app_id in ("local-111", "local-222", "local-333"):
        s = _FakeSession(app_id)
        keys.append(session_key(s))
        del s  # free the id for potential reuse by the next session
    assert len(set(keys)) == 3
    assert all(k[0] == app for k, app in zip(keys, ("local-111", "local-222", "local-333")))


def test_session_key_distinguishes_sibling_sessions(spark):
    """Sessions sharing one context (newSession) get distinct keys —
    temp views and cached DataFrames are session-scoped."""
    sibling = spark.newSession()
    assert session_key(spark) != session_key(sibling)
    assert session_key(spark)[0] == session_key(sibling)[0]  # same context
    assert session_key(spark) == session_key(spark)  # stable per session


def test_caches_are_keyed_by_session_key(spark, sf_dir):
    """The dedup shingle-index cache stores under the session_key, so a
    context restart (different applicationId) misses the cache."""
    from frinesis_spark.operators import dedup

    dedup._cached_shingle_index(spark, sf_dir)
    # r7: the key grew a corpus-fingerprint slot ("" when the index
    # store is off) so store mode can see corpus refreshes mid-session.
    assert (session_key(spark), sf_dir, "") in dedup._INDEX_CACHE


def test_minhash_hash_cap_matches_string_cap_stop_set(spark):
    """The DF cap counted on xxhash64 hashes (the minhash signature
    path) selects the same stop set as counting on shingle strings
    (the _shingle_index / oracle contract), absent hash collisions.

    Fixture: 5 docs sharing the boilerplate shingle "common license
    header" (DF 5 > cap 3); every other shingle is unique (DF 1).
    """
    from frinesis_spark.operators.dedup import _shingles

    texts = [
        (i, f"doc{i} unique{i} tail{i} common license header")
        for i in range(5)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    max_df = 3

    inv = docs.select("doc_id", F.explode(_shingles()).alias("shingle"))
    stop_strings = {
        r.shingle
        for r in inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .collect()
    }
    # exactly the boilerplate 3-gram windows that appear in all 5 docs
    assert stop_strings == {"common license header"}

    base = docs.select(
        "doc_id", F.transform(_shingles(), lambda s: F.xxhash64(s)).alias("hs")
    )
    stop_hashes = {
        r.h
        for r in base.select(F.explode("hs").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .collect()
    }
    string_hashes = {
        r.h
        for r in spark.createDataFrame(
            [(s,) for s in stop_strings], "shingle string"
        )
        .select(F.xxhash64("shingle").alias("h"))
        .collect()
    }
    assert stop_hashes == string_hashes


@pytest.fixture()
def _docs_view(spark):
    """Swap the `documents` temp view for a crafted fixture. The real
    sf_dir is registered FIRST so the query's own register_views call
    is a cached no-op that preserves the swap; teardown invalidates the
    cache so later tests re-register the real tables."""
    from frinesis_spark import catalog

    def swap(df, sf_dir):
        catalog.register_views(spark, sf_dir)
        df.createOrReplaceTempView("documents")

    yield swap
    catalog._VIEWS_CACHE.pop(spark, None)


def test_jaccard_threshold_is_unrounded(spark, monkeypatch):
    """A pair whose exact jaccard is just UNDER 0.5 but whose 6-decimal
    ROUND is exactly 0.5 must be EXCLUDED — the discriminating case for
    the ADVICE r4 fix (the old code filtered on the rounded column and
    would have admitted it; the oracle filters unrounded).

    Construction: the smallest ratios inside (0.4999995, 0.5) need
    ~1e6-row denominators, unreachable with real shingled texts, so the
    inverted index is synthesized directly: doc 0 carries k shared
    shingles, doc 1 the same k plus k+1 unique ones →
    j = k/(2k+1) = 0.49999958… for k = 600000, ROUND(j, 6) = 0.5.
    """
    import pyspark.sql.functions as F

    from frinesis_spark.operators import dedup

    k = 600_000
    shared = spark.range(k).select(
        F.concat(F.lit("s"), F.col("id")).alias("shingle")
    )
    inv = (
        shared.select(F.lit(0).cast("long").alias("doc_id"), "shingle")
        .unionAll(shared.select(F.lit(1).cast("long").alias("doc_id"), "shingle"))
        .unionAll(
            spark.range(k + 1).select(
                F.lit(1).cast("long").alias("doc_id"),
                F.concat(F.lit("u"), F.col("id")).alias("shingle"),
            )
        )
    )
    monkeypatch.setattr(dedup, "_cached_shingle_index", lambda s, d: inv)
    # the sizes cache would otherwise pin this synthetic corpus under
    # the fake sf_dir key; bypass it the same way
    monkeypatch.setattr(
        dedup,
        "_cached_shingle_sizes",
        lambda s, d: inv.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_sh")
        ),
    )
    out = dedup.q_dedup_ngram_jaccard(spark, "ignored").collect()
    # exact j = 600000/1200001 < 0.5 → excluded, even though it rounds
    # to the 0.5 threshold at 6 decimals
    assert out == []


def test_udtf_chunker_drops_null_text(spark, sf_dir, _docs_view):
    """NULL text yields zero chunks (not one empty chunk), matching the
    oracle's WHERE text IS NOT NULL."""
    from frinesis_spark.operators.scalar import q_udtf_table_chunks

    docs = spark.createDataFrame(
        [(1, "one two three"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    _docs_view(docs, sf_dir)
    rows = q_udtf_table_chunks(spark, sf_dir).collect()
    by_doc = {r.doc_id for r in rows}
    assert 2 not in by_doc  # NULL text dropped
    assert 1 in by_doc and 3 in by_doc  # empty string still chunks ('' token)


def test_variant_shred_drops_missing_k(spark, monkeypatch):
    """Events whose props JSON has no $.k are excluded on the Spark
    side (the oracle excludes them via WHERE ... IS NOT NULL)."""
    import frinesis_spark.operators.scalar as scalar_mod
    from frinesis_spark import catalog
    from frinesis_spark.operators.scalar import q_scalar_variant_shred

    events = spark.createDataFrame(
        [
            (1, "click", '{"k": 3}'),
            (2, "click", '{"other": 1}'),
            (3, "view", '{"k": 5}'),
        ],
        "event_id long, event_type string, props string",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        scalar_mod,
        "table",
        lambda s, d, n: events if n == "events" else real_table(s, d, n),
    )
    rows = {r.vtype: r for r in q_scalar_variant_shred(spark, "x").collect()}
    assert rows["click"].n_events == 1  # the no-k click row is dropped
    assert rows["click"].sum_k == 3 and rows["click"].sum_k2 == 6
    assert rows["view"].sum_k == 5


def test_minhash_regimes_agree(spark, monkeypatch):
    """The three stop-set regimes of _minhash_signatures are declared
    result-identical; force the pathological distributed-anti-join path
    (by shrinking _STOP_LIT_CAP below the stop-set size) and pin its
    signatures against the default literal-array path."""
    from frinesis_spark.operators import dedup

    boiler = "aa bb cc dd"  # 2 boilerplate shingles: "aa bb cc", "bb cc dd"
    rows = [(i, f"{boiler} unique{i} tail{i} end{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    lit_path = {
        (r.doc_id, tuple(r.sig))
        for r in dedup._minhash_signatures(docs, max_df=5).collect()
    }
    monkeypatch.setattr(dedup, "_STOP_LIT_CAP", 1)  # stop set (2) > cap
    anti_path = {
        (r.doc_id, tuple(r.sig))
        for r in dedup._minhash_signatures(docs, max_df=5).collect()
    }
    assert lit_path == anti_path
    assert len(lit_path) == 8  # no doc was all-boilerplate


def test_shingle_index_regimes_agree(spark, monkeypatch):
    """Same contract for _shingle_index: the isin-literal filter and
    the left-anti join select identical surviving index entries."""
    from frinesis_spark.operators import dedup

    boiler = "xx yy zz ww"
    rows = [(i, f"{boiler} only{i} here{i} now{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    lit_path = {
        (r.doc_id, r.shingle)
        for r in dedup._shingle_index(docs, max_df=5).collect()
    }
    monkeypatch.setattr(dedup, "_STOP_LIT_CAP", 1)
    anti_path = {
        (r.doc_id, r.shingle)
        for r in dedup._shingle_index(docs, max_df=5).collect()
    }
    assert lit_path == anti_path
    assert not any(s in {"xx yy zz", "yy zz ww"} for _, s in lit_path)


def test_cached_sizes_match_index_recount(spark, sf_dir):
    """The cached per-doc size table equals a fresh recount over the
    cached index (cache is a pure materialization, not a variant)."""
    from frinesis_spark.operators import dedup

    inv = dedup._cached_shingle_index(spark, sf_dir)
    cached = {
        (r.doc_id, r.n_sh)
        for r in dedup._cached_shingle_sizes(spark, sf_dir).collect()
    }
    fresh = {
        (r.doc_id, r.n_sh)
        for r in inv.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .collect()
    }
    assert cached == fresh


def test_cached_simhash_fingerprints_stable(spark, sf_dir):
    """Repeat calls serve the same materialized fingerprint table, and
    its values equal a fresh (uncached) fingerprint pass."""
    from frinesis_spark.catalog import table
    from frinesis_spark.operators import dedup

    first = dedup._cached_simhash_fingerprints(spark, sf_dir)
    again = dedup._cached_simhash_fingerprints(spark, sf_dir)
    assert first is again  # same materialized DataFrame object
    cached = {(r.doc_id, r.simhash) for r in first.collect()}
    fresh = {
        (r.doc_id, r.simhash)
        for r in dedup._simhash_fingerprints(
            table(spark, sf_dir, "documents")
        ).collect()
    }
    assert cached == fresh


def test_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    """Cross-validate the rows-only minhash query against the
    oracle-verified exact-jaccard query — the correctness evidence the
    DuckDB compare can't provide for a non-SQL hash family.

    Measured on both fixtures (sf0.001 and sf0.01): recall 1.0,
    zero false positives, max |est - exact| ≈ 0.05; pinned with slack
    for seed-stable but fixture-drift-tolerant margins."""
    from frinesis_spark.operators import dedup

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.near_minhash_pairs(spark, sf_dir).collect()
    }
    assert exact, "fixture must contain planted near-dup pairs"
    hits = set(exact) & set(est)
    recall = len(hits) / len(exact)
    assert recall >= 0.85, f"minhash recall {recall:.2f} of exact pairs"
    # false-positive mass: est >= 0.5 pairs absent from the exact set
    assert len(set(est) - set(exact)) <= max(2, len(exact) // 5)
    worst = max(abs(exact[p] - est[p]) for p in hits)
    assert worst <= 0.15, f"worst |est-exact| = {worst:.3f}"


def test_simhash_recovers_exact_near_dups(spark, sf_dir):
    """SimHash (Hamming <= 8) must recover most exact-jaccard >= 0.5
    pairs — its token-frequency similarity is a different (looser)
    notion, so only recall is pinned, not precision. Measured: 0.92-0.93
    on both fixtures."""
    from frinesis_spark.operators import dedup

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    sh = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_pairs(spark, sf_dir).collect()
    }
    assert exact
    recall = len(exact & sh) / len(exact)
    assert recall >= 0.7, f"simhash recall {recall:.2f} of exact pairs"
