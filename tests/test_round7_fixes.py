"""Round-7 fix pins: bucketed foreachBatch upsert store (VERDICT r6
item 4 — untouched buckets must not be rewritten), decontamination
eval-set cap (ADVICE r6)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F


def _dir_digest(path: str) -> dict[str, str]:
    """Map of relative file path → md5 for every file under `path`."""
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            rel = os.path.relpath(p, path)
            out[rel] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def test_bucketed_upsert_untouched_buckets_not_rewritten(spark, tmp_path):
    """A micro-batch that touches one user must rewrite ONLY that
    user's bucket: every other bucket's manifest entry keeps its path
    and its files stay byte-identical (the O(batch) vs O(all keys)
    I/O claim, pinned at file level)."""
    from frinesis_spark.streaming.windows import _BucketedSnapshotStore

    store = _BucketedSnapshotStore(
        str(tmp_path / "store"),
        "user_id",
        [F.col("ts").desc(), F.col("event_id").desc()],
        n_buckets=8,
    )
    schema = "event_id long, ts long, user_id long, value double"
    b0 = spark.createDataFrame(
        [(i, 10 + i, i % 20, float(i)) for i in range(60)], schema
    )
    store.merge(b0, 0)
    assert store.manifest, "batch 0 produced no buckets"
    manifest_before = dict(store.manifest)
    digests_before = {b: _dir_digest(p) for b, p in manifest_before.items()}

    # Batch 1: a single existing user gets a newer row.
    b1 = spark.createDataFrame([(999, 1000, 7, 123.5)], schema)
    touched_bucket = spark.range(1).select(
        F.pmod(F.hash(F.lit(7).cast("long")), F.lit(8)).alias("b")
    ).collect()[0][0]
    store.merge(b1, 1)

    changed = {
        b for b in store.manifest
        if manifest_before.get(b) != store.manifest[b]
    }
    assert changed == {touched_bucket}
    for b, p in store.manifest.items():
        if b == touched_bucket:
            continue
        assert p == manifest_before[b]
        assert _dir_digest(p) == digests_before[b], (
            f"untouched bucket {b} was rewritten"
        )

    # Correctness: the snapshot is latest-row-per-key over both batches.
    snap = {
        r["user_id"]: (r["ts"], r["value"])
        for r in store.snapshot(spark).collect()
    }
    assert len(snap) == 20
    assert snap[7] == (1000, 123.5)
    # user 6's latest from batch 0: event_ids 6,26,46 → ts 56 wins
    assert snap[6] == (56, 46.0)


def test_bucketed_upsert_superseded_dirs_reclaimed(spark, tmp_path):
    """Disk stays one copy of the snapshot: after a second merge the
    superseded bucket directory is gone."""
    from pyspark.sql import functions as F

    from frinesis_spark.streaming.windows import _BucketedSnapshotStore

    base = tmp_path / "store"
    store = _BucketedSnapshotStore(
        str(base),
        "user_id",
        [F.col("ts").desc(), F.col("event_id").desc()],
        n_buckets=4,
    )
    schema = "event_id long, ts long, user_id long, value double"
    store.merge(spark.createDataFrame([(1, 1, 5, 1.0)], schema), 0)
    old_path = dict(store.manifest)
    store.merge(spark.createDataFrame([(2, 2, 5, 2.0)], schema), 1)
    for b, p in old_path.items():
        if store.manifest[b] != p:
            assert not os.path.exists(p), "superseded bucket dir not reclaimed"
    # Exactly one live copy per bucket under base.
    live = sorted(store.manifest.values())
    assert len(live) == len(set(live))


def test_decontaminate_eval_cap_bounds_broadcast(spark, duck, sf_dir):
    """The stand-in eval set is bounded absolutely: doc_ids at/above
    100 * _DECON_EVAL_CAP never enter the eval side even when they
    satisfy the modulus (ADVICE r6 — broadcast must not grow with the
    corpus)."""
    from frinesis_spark.operators import dedup

    # The predicate itself: a doc_id past the cap is corpus, not eval.
    over_cap = 100 * dedup._DECON_EVAL_CAP
    df = spark.createDataFrame(
        [(0,), (100,), (over_cap,), (over_cap + 100,)], "doc_id long"
    )
    is_eval = (F.col("doc_id") % 100 == 0) & (
        F.col("doc_id") < 100 * dedup._DECON_EVAL_CAP
    )
    got = sorted(r[0] for r in df.where(is_eval).collect())
    assert got == [0, 100]
