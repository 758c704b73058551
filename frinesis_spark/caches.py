"""Central reset for the per-(session, corpus) derived-artifact caches.

The dedup/similarity operators build derived artifacts once per
(session, corpus) — shingle inverted index, per-doc shingle sizes,
minhash signatures, simhash fingerprints, LSH bucket table, IVF
centroids+cells — and serve repeat queries from those caches (the
persisted-index pattern; see SCALE.md). That makes any steady-state
timing a WARM measurement. This helper drops every such cache so a
caller (bench.py's cold reps, tests) can measure or re-exercise the
index-build path from scratch.
"""

from __future__ import annotations

import os


def corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Content-identity of one source table: (path, size, mtime_ns) of
    every data file, hashed. Stat-only (no data read); any refresh —
    rewrite, append, compaction — changes it. Raises on a missing
    table: a degenerate constant fingerprint could HIT a previously
    stored artifact and silently answer from the wrong corpus."""
    import glob
    import hashlib

    p = os.path.join(sf_dir, f"{table}.parquet")
    paths = [p] if os.path.isfile(p) else sorted(
        glob.glob(os.path.join(p, "*.parquet"))
    )
    if not paths:
        raise FileNotFoundError(
            f"no {table} parquet under {sf_dir!r} — cannot fingerprint"
        )
    h = hashlib.md5()
    for f in paths:
        st = os.stat(f)
        h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def cached(cache: dict, spark, sf_dir: str, build, table: str = "documents"):
    """Per-(session, corpus dir, corpus fingerprint) memo for derived
    artifacts, bounded at 4 held entries per cache (the clear keeps
    session memory flat across many corpora). The fingerprint slot is
    "" when SPARK_GRAFT_INDEX_STORE is off (immutable-fixture
    assumption); in store mode it makes a mid-session refresh of the
    SOURCE TABLE visible to every artifact — persisted or
    session-local — so two queries in one session can never answer
    about different corpora. ONE definition of the pattern
    (dedup/similarity both route through here): eviction-policy or
    key-scheme fixes land in this function, not in per-module copies.
    Note the store-mode build path (_store_load_or_build) re-computes
    the fingerprint for its directory name — a cheap footer-stat
    sweep; a corpus refresh landing in that microsecond window would
    memo a new-corpus artifact under the old key for the session's
    remainder, an accepted race (the driver's fixtures are immutable
    within a run).
    """
    from frinesis_spark.catalog import session_key

    store = os.environ.get("SPARK_GRAFT_INDEX_STORE")
    fp = corpus_fingerprint(sf_dir, table) if store else ""
    key = (session_key(spark), sf_dir, fp)
    val = cache.get(key)
    if val is None:
        if len(cache) >= 4:
            # Evict the LEAST-RECENTLY-USED entry, not the whole
            # cache: a session alternating over ≥5 corpora previously
            # degraded to a 0% hit rate — every lookup wiped the 4 hot
            # entries and rebuilt a full index per call (review wave
            # 6). Same 4-entry memory bound, insertion-ordered dict
            # with hits refreshed to the end (below), so the front IS
            # the LRU entry (ADVICE r8: pure insertion order evicted a
            # first-inserted-but-hottest artifact).
            del cache[next(iter(cache))]
        val = build()
        cache[key] = val
    else:
        # Refresh recency on hit so eviction is LRU, not FIFO.
        cache[key] = cache.pop(key)
    return val


def clear_derived_caches(unpersist: bool = True) -> int:
    """Drop all derived-artifact caches; returns #entries dropped.

    Block reclamation: most cached values are ``localCheckpoint``-backed
    DataFrames, whose blocks ``Dataset.unpersist()`` does NOT release
    (it only uncaches ``persist()``/``cache()`` state tracked by the
    CacheManager — a checkpointed RDD's persist lives outside it). The
    actual release path is dropping the LAST reference here: clearing
    the dicts frees the Python handle → py4j GC releases the JVM
    Dataset → the checkpointed RDD becomes unreachable → Spark's
    ContextCleaner unpersists its blocks asynchronously. The
    ``unpersist`` flag still covers any plain ``persist()``-cached
    values and is harmless elsewhere (r6 review fix: the old comment
    credited ``unpersist()`` with the release it doesn't perform).
    """
    from frinesis_spark.operators import dedup, similarity

    dicts = [
        dedup._INDEX_CACHE,
        dedup._SIG_CACHE,
        dedup._SIZES_CACHE,
        dedup._SIMHASH_CACHE,
        dedup._SIMHASH_FLOOR_CACHE,
        dedup._EMB_MEMBERSHIP_CACHE,
        similarity._LSH_INDEX_CACHE,
        similarity._IVF_INDEX_CACHE,
    ]
    dropped = 0
    for d in dicts:
        for value in d.values():
            dropped += 1
            if not unpersist:
                continue
            # Values are DataFrames, or tuples containing one (IVF's
            # (cells DataFrame, centroids ndarray)). unpersist() is a
            # no-op on never-persisted AND localCheckpointed frames
            # (see docstring — those free via d.clear() + GC below).
            frames = value if isinstance(value, tuple) else (value,)
            for f in frames:
                if hasattr(f, "unpersist"):
                    try:
                        f.unpersist()
                    except Exception:
                        pass  # session already stopped — nothing to free
        d.clear()
    return dropped
