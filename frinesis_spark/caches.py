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
