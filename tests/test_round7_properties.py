"""Property-based checks for the round-7 pipeline operators.

Each test pits the Spark operator against an independent pure-Python
reference on hypothesis-generated corpora (unicode, empty strings,
chunk-boundary-straddling lengths, negative ids), so the declared
contracts hold over input classes the fixtures never contain.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_C = 64  # mirrors dedup._CHUNK_CHARS

# Texts designed to collide: a tiny alphabet in whole-chunk units plus
# arbitrary unicode tails, so aligned chunk matches actually occur.
_chunk_unit = st.sampled_from(["x" * _C, "y" * _C, "Ωé漢" * 21 + "x"])
_texts = st.one_of(
    st.just(""),
    st.text(alphabet=list("abΩé漢 "), max_size=10),  # sub-chunk docs
    st.lists(_chunk_unit, min_size=1, max_size=3).map("".join),
    st.lists(_chunk_unit, min_size=1, max_size=2).map(
        lambda u: "".join(u) + "tail"
    ),
)


def _ref_chunk_stats(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int]]:
    """Pure-Python aligned-chunk dedup: md5 over UTF-8 bytes of each
    64-char slice, duplicated = hash seen in >1 distinct doc."""
    per_doc: dict[int, list[str]] = {}
    owners: dict[str, set[int]] = defaultdict(set)
    for i, t in docs:
        n = max(1, math.ceil(len(t) / _C))
        hs = [
            hashlib.md5(t[j * _C : (j + 1) * _C].encode("utf-8")).hexdigest()
            for j in range(n)
        ]
        per_doc[i] = hs
        for h in hs:
            owners[h].add(i)
    return {
        i: (len(hs), sum(1 for h in hs if len(owners[h]) > 1))
        for i, hs in per_doc.items()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_texts, min_size=1, max_size=8))
def test_substring_chunks_matches_reference(spark, texts, monkeypatch):
    import frinesis_spark.operators.dedup as dedup_mod
    from frinesis_spark import catalog

    docs = list(enumerate(texts))
    sdf = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        dedup_mod,
        "table",
        lambda s, d, n: sdf if n == "documents" else real_table(s, d, n),
    )
    pdf = dedup_mod.QUERIES["dedup_substring_chunks"](spark, "prop://").toPandas()
    got = {
        int(r.doc_id): (int(r.n_chunks), int(r.dup_chunks))
        for r in pdf.itertuples()
    }
    assert got == _ref_chunk_stats(docs)


def _bucket(doc_id: int, res: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:8], 16) % res


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=4),
    id0=st.integers(-(10**6), 10**6),
)
def test_source_mixture_matches_reference(spark, sizes, id0, monkeypatch):
    """The integer keep rule is a pure function of (doc_id, source
    count) — including negative / far-flung doc_ids."""
    import frinesis_spark.operators.text as text_mod
    from frinesis_spark import catalog

    rows = []
    did = id0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((did, f"t{did}", "en", f"src{s}", 1))
            did += 7
    sdf = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    real_table = catalog.table
    monkeypatch.setattr(
        text_mod,
        "table",
        lambda s, d, n: sdf if n == "documents" else real_table(s, d, n),
    )
    pdf = text_mod.QUERIES["pipeline_source_mixture"](spark, "prop://").toPandas()
    counts = {f"src{s}": n for s, n in enumerate(sizes)}
    expect = {
        r[0]
        for r in rows
        if _bucket(r[0], text_mod._MIX_RES) * counts[r[3]]
        < text_mod._MIX_TARGET * text_mod._MIX_RES
    }
    assert set(pdf["doc_id"]) == expect
    # Sources at/below the target keep everything.
    for s, n in enumerate(sizes):
        if n <= text_mod._MIX_TARGET:
            assert (pdf["source"] == f"src{s}").sum() == n


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.sets(st.integers(-(10**9), 10**9), min_size=1, max_size=60))
def test_shuffle_shard_matches_reference(spark, ids, monkeypatch):
    """Shard id and per-shard position are a pure function of the
    doc_id SET — order/partitioning free — and positions are dense."""
    import frinesis_spark.operators.text as text_mod
    from frinesis_spark import catalog

    sdf = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).repartition(5)
    real_table = catalog.table
    monkeypatch.setattr(
        text_mod,
        "table",
        lambda s, d, n: sdf if n == "documents" else real_table(s, d, n),
    )
    pdf = text_mod.QUERIES["pipeline_shuffle_shard"](spark, "prop://").toPandas()

    ref = []
    for i in ids:
        key = hashlib.md5(f"shard:{i}".encode()).hexdigest()
        ref.append((int(key[:8], 16) % text_mod._N_SHARDS, key, i))
    expect = {}
    by_shard: dict[int, list] = defaultdict(list)
    for shard, key, i in ref:
        by_shard[shard].append((key, i))
    for shard, members in by_shard.items():
        for pos, (key, i) in enumerate(sorted(members)):
            expect[i] = (shard, pos, key)
    got = {
        int(r.doc_id): (int(r.shard_id), int(r.pos_in_shard), r.shuffle_key)
        for r in pdf.itertuples()
    }
    assert got == expect
