"""Deduplication operators for LLM training-data pipelines
(BASELINE.json mandate; SURVEY.md §2B rows ``dedup_*``).

Five dedup strategies, all pure Catalyst expressions (no MLlib, no
Python in the hot path) so they stay inside whole-stage codegen:

- exact         — hash groupBy on normalized text
- near_minhash  — MinHash signatures + banded LSH (the 100 TB path)
- simhash       — 64-bit SimHash + banded blocking + Hamming verify
- ngram_jaccard — exact shingle Jaccard via an inverted-index self-join
- embedding_cosine — near-dup pairs by embedding cosine

Scale notes: minhash/simhash/ngram all shuffle on *bucket* keys
(band hash / shingle), never on document pairs, so candidate
generation is linear-ish in corpus size; the O(candidates) verify
step touches only bucket-colliding pairs. The only O(n²) operator is
``dedup_embedding_cosine``'s exact pairwise scan, kept as the
correctness baseline — ``similarity_ann_lsh`` (similarity.py) is its
scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frinesis_spark.catalog import table
from frinesis_spark.functions.vectors import cosine_similarity

# MinHash parameters: 128-long signature, 32 bands × 4 rows.
# P(candidate | jaccard j) = 1-(1-j^4)^32 → ~0.99 at j=0.5, ~0.04 at j=0.1.
_K = 128
_BANDS = 32
_ROWS = _K // _BANDS
_SHINGLE = 3  # words per shingle
_JACCARD_THRESHOLD = 0.5

# SimHash: 64-bit fingerprint, 4 bands × 16 bits; hamming ≤ 8 = near-dup.
_SIM_BANDS = 4
_HAMMING_MAX = 8


def _shingles(text_col: str = "text") -> F.Column:
    """Distinct 3-word shingles of a text column (codegen'd)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {_SHINGLE - 1}, 1)),"
            f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {_SHINGLE})))"
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative (min doc_id) per distinct text.

    Implemented as groupBy(text) rather than ``dropDuplicates`` so the
    surviving row is deterministic. Scale: a single hash-aggregate
    shuffle on the text hash; at 100 TB group on ``md5(text)`` instead
    of the full text to cut shuffle bytes (semantically identical for
    dedup purposes; full-text kept here so the oracle is trivial).
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("doc_id", "n_copies", F.length("text").alias("text_len"))
    )


def _minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig array<long>[K]) via K independent xxhash64 draws.

    Hash family: ``xxhash64(i, shingle)`` for i in 0..K-1 — no modular
    arithmetic (ANSI-safe, overflow-free) and fully deterministic.
    The per-position MIN is a plain hash aggregate: K min() columns,
    all inside one codegen stage.
    """
    exploded = docs.select(
        "doc_id", F.explode(_shingles()).alias("shingle")
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(_K)
    ]
    sig = exploded.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(_K)]).alias("sig")
    )


def q_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs (est. Jaccard ≥ 0.5).

    Pipeline: shingle → K-long MinHash signature → 32 band hashes →
    self-join on (band_idx, band_hash) → verify candidates by exact
    signature agreement fraction. The band join is the only shuffle
    that grows with corpus size; candidate pairs are bucket-local.

    No DuckDB oracle (hash family not reproducible in SQL) →
    rows-only check. Deterministic: fixed hash seeds, fixed threshold.
    """
    docs = table(spark, sf_dir, "documents")
    sig = _minhash_signatures(docs)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.hash(
                    *[F.element_at("sig", b * _ROWS + j + 1) for j in range(_ROWS)],
                    F.lit(b),
                ).alias("band_hash"),
            )
            for b in range(_BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", F.explode(band_structs).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_hash")

    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(_K))
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= _JACCARD_THRESHOLD)
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-duplicate pairs (Hamming ≤ 8).

    Per-token xxhash64 votes on each of the 64 bits; the fingerprint
    is reassembled from 64 SUM aggregates (one codegen'd hash-agg).
    Blocking: 4 bands of 16 bits — a pair at Hamming ≤ 8 can miss all
    bands only if every band differs, so recall is high for small
    distances; verify computes exact ``bit_count(xor)``.

    Rows-only check (bit-level hash family not SQL-reproducible).
    """
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    h = F.xxhash64(F.col("token"))
    votes = [
        F.sum(F.shiftright(h, bit).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{bit}")
        for bit in range(64)
    ]
    voted = tokens.groupBy("doc_id").agg(*votes)
    fingerprint = voted.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"v{bit}") > 0, F.lit(1).cast("long")).otherwise(0)
                * F.lit(2 ** bit if bit < 63 else -(2 ** 63)).cast("long")
                for bit in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )

    band_structs = F.array(
        *[
            F.struct(
                F.lit(k).alias("band_idx"),
                F.shiftrightunsigned(F.col("simhash"), 16 * k)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
            for k in range(_SIM_BANDS)
        ]
    )
    bands = fingerprint.select(
        "doc_id", "simhash", F.explode(band_structs).alias("band")
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")

    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= _HAMMING_MAX)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via an inverted-index join.

    explode(shingles) → self-join on the shingle (the inverted index)
    → count common shingles per pair → |A∩B| / (|A|+|B|-|A∩B|).
    Shuffles on the shingle key, so only pairs sharing ≥1 shingle are
    ever materialized — never the n² cross product. At 100 TB, drop
    stop-shingles (document frequency cap) before the join to bound
    the hottest buckets.

    DuckDB-oracle-checkable: shingling is expressible with list
    functions on both sides.
    """
    docs = table(spark, sf_dir, "documents")
    sets = docs.select("doc_id", _shingles().alias("sh"))
    sizes = sets.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sets.select("doc_id", F.explode("sh").alias("shingle"))

    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 6).alias("jaccard"),
            F.col("n_common").cast("long").alias("n_common"),
        )
        .where(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.45, exact pairwise.

    Correctness baseline for vector dedup — a deliberate O(n²) scan
    kept oracle-checkable; the linear-time path is the LSH-bucketed
    variant in similarity.py. Cosine accumulates in double (identical
    per-row fold to the oracle), rounded to 6 dp for cross-engine hash
    stability.
    """
    e = table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    cos = cosine_similarity(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .where(cos >= 0.45)
        .select("a_id", "b_id", F.round(cos, 6).alias("cos_sim"))
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_near_minhash": q_dedup_near_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
}

_SHINGLE_SQL = """
        SELECT doc_id,
               LIST_DISTINCT(LIST_TRANSFORM(
                   GENERATE_SERIES(1, GREATEST(LEN(STRING_SPLIT(text, ' ')) - 2, 1)),
                   i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' ')
               )) AS sh
        FROM documents
"""

ORACLE = {
    "dedup_exact": """
        SELECT MIN(doc_id) AS doc_id,
               COUNT(*) AS n_copies,
               LENGTH(text) AS text_len
        FROM documents
        GROUP BY text
    """,
    # dedup_near_minhash / dedup_simhash: intentionally no oracle —
    # xxhash64/murmur3 hash families are not reproducible in DuckDB SQL
    # → driver rows-only check; exactness is covered by
    # dedup_ngram_jaccard, which verifies the same planted near-dup
    # pairs with exact Jaccard.
    "dedup_ngram_jaccard": f"""
        WITH sets AS ({_SHINGLE_SQL}),
        inv AS (
            SELECT doc_id, UNNEST(sh) AS shingle FROM sets
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM inv a JOIN inv b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               ROUND(n_common / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard,
               CAST(n_common AS BIGINT) AS n_common
        FROM common
        JOIN (SELECT doc_id, LEN(sh) AS n_sh FROM sets) na ON na.doc_id = doc_a
        JOIN (SELECT doc_id, LEN(sh) AS n_sh FROM sets) nb ON nb.doc_id = doc_b
        WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
    """,
    "dedup_embedding_cosine": """
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               ROUND(
                   LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[]))
                   / (SQRT(LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                            CAST(a.embedding AS DOUBLE[])))
                      * SQRT(LIST_DOT_PRODUCT(CAST(b.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])))),
                   6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
              / (SQRT(LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                       CAST(a.embedding AS DOUBLE[])))
                 * SQRT(LIST_DOT_PRODUCT(CAST(b.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))))
              >= 0.45
    """,
}
