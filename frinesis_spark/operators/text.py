"""Text analysis operators for LLM training-data pipelines
(SURVEY.md §2B ``text_analysis_stats`` + the BASELINE.json mandate:
language-ID, quality scoring, token counting, fingerprinting).

All four are per-row scalar pipelines + one hash aggregate — map-side
parallel, shuffle only on the (tiny) group keys. No Python anywhere:
tokenization, stopword matching, regex token extraction and md5
fingerprints are Catalyst expressions, so the hot path is whole-stage
codegen even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from frinesis_spark.catalog import table
from frinesis_spark.functions.numeric import davg, dsum, oracle_davg, oracle_dsum

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately small: language ID here demonstrates the *plan shape*
# (vectorized set-intersection scoring + deterministic argmax); a real
# deployment swaps in fastText/CLD3 lexicons without changing the plan.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "is", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "un"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "les", "et", "des", "un", "une", "est", "dans"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}
_LANG_ORDER = ["en", "es", "de", "fr", "zh"]  # argmax tie-break precedence

_STOPWORDS = _LANG_MARKERS["en"]
# text_token_count retired r12 (verdict item 4 registry swap: its
# ws/regex token sums are carried by text_analysis_stats (per-lang
# token volumes) and tokenize_pack_sequences (per-doc counts); the
# dedup_embedding_ann_audit production grading shape took the slot).


def _hex_bucket(hex_col: Column, mod: int) -> Column:
    """Bucket from a hex digest column: first 8 hex chars as an
    integer, mod ``mod``."""
    return (
        F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long") % mod
    )


def _md5_bucket(key: Column, mod: int) -> Column:
    """THE content-independent bucket primitive behind sampling,
    packing, mixture resampling and shard assignment: md5 of the key
    rendered as text, first 8 hex chars as an integer, mod ``mod``.
    A pure function of the key — identical across engines, runs and
    re-shards. The oracle twin is ``_md5_bucket_sql``; change BOTH or
    parity breaks."""
    return _hex_bucket(F.md5(key.cast("string")), mod)


def _md5_bucket_sql(col: str, mod: int) -> str:
    """DuckDB twin of :func:`_md5_bucket` (0x-prefixed hex cast)."""
    return (
        f"CAST(CONCAT('0x', SUBSTRING(MD5(CAST({col} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {mod}"
    )


def q_text_analysis_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: doc counts, char/token volumes,
    source diversity, and an n_chars-vs-length(text) consistency count."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dsum(F.col("n_chars").cast("double")).alias("total_chars"),
        davg(F.col("n_chars").cast("double")).alias("avg_chars"),
        F.sum(n_tokens).alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(
            (F.length("text") == F.col("n_chars")).cast("long")
        ).alias("n_chars_consistent"),
    )


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID: score = |tokens ∩ markers(lang)|,
    argmax with fixed precedence (CASE chain — identical semantics in
    the oracle, no struct-comparison subtleties)."""
    d = table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).cast("long")
        for lang, words in _LANG_MARKERS.items()
    }
    out = d.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        *[scores[lang].alias(f"score_{lang}") for lang in _LANG_ORDER],
    )
    # First language in precedence order whose score equals the max.
    best_o = F.greatest(*[F.col(f"score_{lang}") for lang in _LANG_ORDER])
    pred_o = F.lit(None).cast("string")
    for lang in reversed(_LANG_ORDER):
        pred_o = F.when(F.col(f"score_{lang}") == best_o, F.lit(lang)).otherwise(
            pred_o
        )
    return out.select(
        "doc_id",
        "lang_true",
        pred_o.alias("lang_pred"),
        best_o.alias("best_score"),
        (pred_o == F.col("lang_true")).alias("is_match"),
    )


def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features + composite score per document:
    token count, mean token length, stopword ratio, symbol ratio.

    All ratios are single double divisions of exact integers →
    bit-deterministic; the composite is rounded at 6 dp.

    Empty-document policy (r6 differential finding): an empty text has
    ``length(text) = 0``, and a plain ``/`` would kill the job with
    ANSI DIVIDE_BY_ZERO on that one row (real corpora contain empty
    docs — failed extractions). ``try_divide`` yields NULL for
    alpha_ratio and (by propagation) quality_score, exactly matching
    DuckDB's 0/0 → NULL. The token-keyed ratios need no guard:
    ``split`` returns at least one (empty-string) token, so
    ``n_tokens >= 1`` always.
    """
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words).cast("long")
    n_chars = F.length("text").cast("long")
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("long")
    stop_hits = F.size(
        F.filter(
            words,
            lambda w: F.array_contains(
                F.array(*[F.lit(s) for s in _STOPWORDS]), w
            ),
        )
    ).cast("long")
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus separators
    stop_ratio = stop_hits / n_tokens
    alpha_ratio = F.try_divide(alpha_chars, n_chars)
    score = F.round(
        0.4 * alpha_ratio
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.3 * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)),
        6,
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        score.alias("quality_score"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: content hash (md5 of raw text) and a
    bag-of-words fingerprint (md5 of the sorted distinct token list —
    invariant to word order, the classic near-dup blocking key)."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(words)))
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_fp"),
        # NULL text → NULL fingerprints, like md5(NULL): concat_ws
        # folds a NULL token array to '' so the bare md5(bag) aliased
        # a NULL doc to the EMPTY doc's blocking key and diverged from
        # the oracle's NULL (r9 review wave 4).
        F.when(F.col("text").isNotNull(), F.md5(bag)).alias("bag_fp"),
        F.substring(F.md5(F.col("text")), 1, 8).alias("short_fp"),
    )


def q_pipeline_llm_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end LLM data-prep composite: quality filter → exact
    dedup → fingerprint+stats projection, in one declarative plan.

    The point of expressing the whole pipeline as one DataFrame: the
    quality predicate is cheap and row-local, so Catalyst evaluates it
    BEFORE the dedup shuffle — at 100 TB the shuffle sees only the
    surviving fraction, which is the main cost lever of a prep
    pipeline (filter early, shuffle late).
    """
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    # try_divide: an empty document (length 0 — failed extractions are
    # normal in real corpora) must be FILTERED (NULL ratio), not kill
    # the job with ANSI DIVIDE_BY_ZERO (the r6 quality_score class;
    # the oracle's plain / yields NULL in DuckDB, so the row drops
    # identically on both engines).
    alpha_ratio = F.try_divide(
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")),
        F.length("text"),
    )
    filtered = d.where((alpha_ratio >= 0.6) & (n_tokens >= 20))
    deduped = filtered.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return deduped.select(
        "doc_id",
        "n_copies",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("text")).alias("content_fp"),
    )


def q_explode_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency via the generator/lateral path: explode
    each document's whitespace tokens, hash-aggregate counts, top 50.

    Explode is the Spark surface for SQL LATERAL / UNNEST; the plan is
    Generate → partial hash agg (map-side combine on the exploded
    tokens, so the shuffle carries one row per distinct token per
    partition, not one per token occurrence) → final agg → top-k sort.
    That partial-combine property is what makes corpus-wide term
    counting feasible at 100 TB — shuffle volume is bounded by
    vocabulary × partitions, not token count.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(50)
    )


def q_text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-trigram profile: the top-10 most frequent
    trigrams per language — the feature table an n-gram language
    identifier trains on (Cavnar-Trenkle rank profiles).

    Trigram extraction is a pure Catalyst HOF pipeline: ``sequence``
    over start offsets → ``transform`` to substrings → ``explode`` —
    no Python, no UDF. The aggregate partial-combines map-side, so the
    shuffle carries (lang, trigram) partial counts (bounded by the
    trigram vocabulary, ~alphabet³), not one row per trigram
    occurrence; top-k per group is a ranking window over the tiny
    aggregated table.
    """
    d = table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    counted = (
        d.select(
            "lang",
            F.explode(
                F.expr("transform(sequence(1, length(text) - 2),"
                       " i -> substring(text, i, 3))")
            ).alias("tri"),
        )
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "tri")
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("lang", "rank", "tri", "n")
    )


def q_sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling: keep 10% of English documents
    and 30% of every other language, selected by a content-independent
    md5 hash of the key — the train/validation split primitive of a
    training-data pipeline.

    Hash-bucket sampling (``md5(key) mod 100 < rate``) beats
    ``sample()``/RAND for pipelines: the decision is a pure function
    of the key, so it is identical across engines, runs, partitionings
    and retries — no seed plumbing, no resample drift when the corpus
    is re-sharded. Map-only (filter pushes to the scan); the oracle
    computes the same buckets from the same md5 hex, so row-level
    equality is exact.
    """
    d = table(spark, sf_dir, "documents")
    bucket = _md5_bucket(F.col("doc_id"), 100)
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(30))
    return (
        d.select("doc_id", "lang", "source", bucket.alias("sample_bucket"))
        .where(F.col("sample_bucket") < rate)
    )


# PII / denylist scrubbing patterns. Kept RE2-and-Java compatible
# (char classes, \b, \d, bounded braces — no lookarounds) so ONE
# pattern text drives both Spark's regexp_replace/regexp_count (Java)
# and DuckDB's REGEXP_* (RE2). DuckDB's REGEXP_REPLACE needs the 'g'
# flag — it replaces only the first match by default, while Spark
# always replaces all.
_PII_PATTERNS = (
    # (tag, pattern) — replacements chain in this order, and each
    # pattern COUNTS on the text after the earlier replacements (the
    # r6 fix: counting on the original double-counts overlaps — the
    # 'customer' inside an already-redacted email must not count).
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    # Denylist term scrub — the fixture's stand-in for entity/term
    # redaction (its synthetic prose has no real emails/phones, so the
    # first two patterns prove the negative path while this one
    # exercises real replacements).
    ("TERM", r"\bcustomer\b"),
)


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / denylist scrubbing: regex-redact emails, phone numbers and
    denylisted terms from ``documents.text``, reporting per-document
    redaction counts — the compliance pass every LLM training-data
    pipeline runs before tokenization.

    Map-only projection: every regexp_replace/regexp_count is a
    Catalyst expression inside whole-stage codegen — zero shuffles,
    zero Python, so at 100 TB this is a pure scan-speed pass (and the
    natural place to fuse with other per-row scalar stages).
    Replacements chain in pattern order and each pattern's count is
    taken on the text AFTER the earlier patterns' replacements (not on
    the original), so overlapping matches are never double-counted:
    'customer@x.com' is one EMAIL redaction, not EMAIL + TERM —
    n_redactions equals the number of substitutions actually applied
    (r6 review fix). The '<TAG>' markers cannot themselves match any
    pattern, so chained counting introduces no phantom matches.
    """
    d = table(spark, sf_dir, "documents")
    clean = F.col("text")
    n_red = F.lit(0)
    for tag, pat in _PII_PATTERNS:
        n_red = n_red + F.regexp_count(clean, F.lit(pat))
        clean = F.regexp_replace(clean, pat, f"<{tag}>")
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        n_red.cast("long").alias("n_redactions"),
    )


def q_text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filtering: per-document duplicate-token
    and duplicate-bigram ratios, with an integer-exact ``repetitive``
    flag — the quality gate that removes boilerplate/spam before LLM
    training (Rae et al. 2021 'Scaling Language Models', repetition
    rules C.2).

    Plan: two scan branches (word and bigram; bigrams built by a
    Catalyst ``transform(sequence(...))`` — no Python), each exploding
    into a partial-aggregated shuffle keyed on (doc_id, token) with
    map-side combine, then re-aggregated per doc_id. n_words/n_bigrams
    are derived from those same aggregates (SUM of the per-token
    counts), so no third scan joins the base table back. Shuffle
    volume is bounded by the distinct-(doc, token) count, not total
    tokens, and at 100 TB each doc's tokens stay in one task (doc_id
    keying) so no hot keys.

    Docs with fewer than 2 words have no bigrams: the word side LEFT
    JOINs the bigram side, their bigram metrics are NULL, and the flag
    coalesces the bigram rule to false — every document gets a
    verdict (a quality gate that silently drops rows would delete the
    very docs it cannot judge).

    The flag compares with INTEGER cross-multiplication
    (``top*100 > n*30``) instead of float thresholds, so the decision
    is bit-identical on every engine and scale; the reported ratios are
    single IEEE divisions of exact integer counts.
    """
    d = table(spark, sf_dir, "documents")
    # coalesce(text, ''): a NULL-text doc must still GET a verdict
    # (split(NULL) explodes to zero rows and the doc silently vanished
    # from the gate — the exact failure the docstring forbids; r9
    # review wave 4). '' splits to one empty token on both engines.
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    base = d.select("doc_id", words.alias("ws"))
    wcnt = (
        base.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id", "w")
        .count()
    )
    wagg = wcnt.groupBy("doc_id").agg(
        F.sum("count").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("count").alias("top_word_n"),
    )
    bigrams = F.expr(
        "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))"
    )
    bcnt = (
        base.where(F.size("ws") >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .count()
    )
    bagg = bcnt.groupBy("doc_id").agg(
        F.sum("count").alias("n_bigrams"),
        F.max("count").alias("top_bigram_n"),
    )
    n_w = F.col("n_words")
    top_w = F.col("top_word_n")
    top_b = F.col("top_bigram_n")
    return wagg.join(bagg, "doc_id", "left").select(
        "doc_id",
        "n_words",
        (F.col("n_distinct").cast("double") / n_w).alias("distinct_ratio"),
        (top_w.cast("double") / n_w).alias("top_word_ratio"),
        (top_b.cast("double") / F.col("n_bigrams")).alias("top_bigram_ratio"),
        (
            (top_w * 100 > n_w * 30)
            | F.coalesce(
                top_b * 100 > F.col("n_bigrams") * 18, F.lit(False)
            )
        ).alias("repetitive"),
    )


# Sequence-packing parameters: context length and bucket fan-out. 8
# buckets keeps the sf0.01 fixture non-degenerate; at 100 TB the bucket
# count scales to the executor count (each bucket packs independently).
_PACK_CTX = 512
_PACK_BUCKETS = 8

# Target docs per source for mixture resampling, and the bucket
# resolution of the hash-threshold keep rule (1/10000 rate steps).
_MIX_TARGET = 8
_MIX_RES = 10_000

# Training-export shard count for the deterministic global shuffle.
_N_SHARDS = 8


def q_tokenize_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining: assign every document a
    (bucket, pack_id, offset) slot in a stream of fixed-size
    ``_PACK_CTX``-token training sequences — the concat-and-chunk
    packing most pretraining data loaders use (documents may straddle
    pack boundaries; the offset says where each doc starts).

    Distributed shape: documents hash into ``_PACK_BUCKETS`` streams by
    an md5 bucket of doc_id (content-independent → reproducible across
    engines/runs/re-shards, same rationale as sample_stratified_hash),
    then ONE shuffle partitions by bucket and a running-sum window over
    the deterministic doc_id order yields each doc's cumulative token
    offset. pack_id/offset are integer ``div``/``%`` of exact BIGINT
    sums — no floats anywhere. At 100 TB: packing is embarrassingly
    parallel across buckets (bucket count ∝ executors), each bucket's
    window is one sorted stream, and the output feeds a
    partitionBy(bucket, pack_id) writer so downstream loaders read
    packs co-located.
    """
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    bucket = _md5_bucket(F.col("doc_id"), _PACK_BUCKETS)
    base = d.select(
        "doc_id", bucket.alias("bucket"), n_tok.alias("n_tokens")
    )
    w = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "cum_before"
    )
    return base.select("doc_id", "bucket", "n_tokens", cum_before).select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.expr(f"cum_before div {_PACK_CTX}").alias("pack_id"),
        (F.col("cum_before") % _PACK_CTX).alias("pack_offset"),
    )


def q_pipeline_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture resampling: rebalance an over/under-represented
    corpus so every source contributes ≈ ``_MIX_TARGET`` documents in
    expectation — the domain-mixing step of corpus assembly (web dumps
    dwarf books/code; the training mix wants controlled proportions).

    Two passes: (1) per-source counts — a partial-agg shuffle whose
    output is |sources| rows, broadcast back; (2) a map-only keep rule
    ``bucket(doc) × n_source < target × resolution`` over a
    content-independent md5 bucket of doc_id. The comparison is PURE
    INTEGER (no per-row float rate), so the decision is bit-identical
    across engines/runs/re-shards, and the keep rate self-adjusts as
    the corpus grows: 10× more docs in a source → 1/10 the keep rate,
    constant expected output per source. At 100 TB the counts pass is
    a metadata-scale aggregate and the sample pass is one scan with
    the filter pushed down to the join output — no global sort, no
    per-source repartition.
    """
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    bucket = _md5_bucket(F.col("doc_id"), _MIX_RES)
    return (
        d.select("doc_id", "lang", "source", bucket.alias("mix_bucket"))
        .join(F.broadcast(counts), "source")
        .where(
            F.col("mix_bucket") * F.col("n_source")
            < F.lit(_MIX_TARGET * _MIX_RES)
        )
        .select("doc_id", "source", "lang", "n_source", "mix_bucket")
    )


def q_pipeline_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export: every document gets a content-independent pseudo-random
    key (md5 of a salted doc_id), a shard by key-prefix bucket, and a
    dense position within its shard — the "shuffle the corpus and
    write N shard files" step every pretraining run needs, made
    reproducible (same corpus → same order, no RNG seed plumbing).

    Scale shape: shard assignment is map-only; ONE shuffle partitions
    by shard_id and the per-shard ``row_number`` orders each shard by
    the md5 key (uniformly distributed → shards are balanced to
    ~±sqrt). There is deliberately NO global row_number — a total
    order over 100 TB is a single-reducer bottleneck; per-shard order
    + shard id is exactly what a sharded data loader consumes. At
    scale, shard count scales with the cluster and the write side is
    ``partitionBy(shard_id)`` with files emitted in position order.
    """
    d = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    shard = _hex_bucket(F.col("shuffle_key"), _N_SHARDS)
    w = W.partitionBy("shard_id").orderBy("shuffle_key")
    return (
        d.select("doc_id", key.alias("shuffle_key"))
        .select("doc_id", "shuffle_key", shard.alias("shard_id"))
        .select(
            "doc_id",
            "shard_id",
            (F.row_number().over(w) - 1).cast("long").alias("pos_in_shard"),
            "shuffle_key",
        )
    )


# Tracking query parameters a web-corpus URL canonicalizer strips —
# the standard analytics/affiliate noise set.
_URL_TRACKING = "utm_[a-z]+|fbclid|gclid|ref"


def q_text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the normalization step URL-level web-
    corpus dedup keys on (the same page arrives as ``HTTPS://WWW.
    Example.COM:443/a/?utm_source=feed`` and ``https://example.com/a``
    from two crawls; canonical equality is what makes them ONE key).

    The corpus has no URL column, so each document synthesizes a
    deterministic messy URL from its (doc_id, source) — four variant
    shapes cycling on doc_id covering uppercase scheme/host, www.,
    default :443/:80 ports, tracking params in every position,
    fragments and trailing slashes — exactly the merge-queries
    pattern: the oracle rebuilds the same strings, so the whole
    canonicalization chain hash-verifies.

    Canonical form, applied as chained regexp (map-only, zero
    shuffles, whole-stage codegen — fuses with any other per-row
    pass at 100 TB): drop fragment → lowercase scheme://authority →
    strip default port → strip www. → drop tracking params
    (``utm_*``/fbclid/gclid/ref, any position) → strip empty ``?`` →
    strip trailing slashes. Output adds the host and path extractions
    a downstream groupBy-host / path-prefix analysis keys on. Spark
    regexps are Java, DuckDB's are RE2 — the patterns stay inside the
    shared subset (char classes, alternation, anchors; RE2 has no
    lookahead, so trailing-slash stripping captures the delimiter
    instead).
    """
    d = table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example.COM:443/Docs/"),
                sid,
                F.lit("/?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("http://blog.example.org/post/"),
                sid,
                F.lit("?id="),
                sid,
                F.lit("&utm_medium=email&ref=rss#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.net/a/b/"),
                sid,
                F.lit("/"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTP://Example.com:80/path/"),
                sid,
                F.lit("?fbclid=abc123&q=term"),
            )
        )
    )
    u = canonicalize_url(url)
    host = F.regexp_extract(u, "^[a-z]+://([^/:?#]+)", 1)
    path = F.regexp_extract(u, "^[a-z]+://[^/?#]*(/[^?#]*)", 1)
    return d.select(
        "doc_id",
        url.alias("raw_url"),
        u.alias("canon_url"),
        host.alias("host"),
        path.alias("path"),
    )


def canonicalize_url(url):
    """The canonicalization chain as a reusable Column transform —
    idempotent by construction (a canonical URL passes through
    unchanged; pinned by tests/test_round8_ops.py)."""
    u = F.regexp_replace(url, "#.*$", "")  # fragment
    prefix = F.lower(F.regexp_extract(u, "^[^:]+://[^/?#]*", 0))
    # len = length(u): open-ended to-end substring like the oracle's
    # 2-arg SUBSTR — the old 1 MiB literal cap silently truncated any
    # longer remainder and corrupted the dedup key (r9 review wave 4).
    u = F.concat(
        prefix,
        F.substring(
            u,
            F.length(F.regexp_extract(u, "^[^:]+://[^/?#]*", 0)) + 1,
            F.length(u),
        ),
    )
    # Delimiter captured (RE2 has no lookahead): without it, ports
    # merely STARTING with 443/80 corrupt the host (':8080' →
    # 'host80' — review find; the fixture only synthesizes exact
    # default ports, so only a crafted test can see this).
    u = F.regexp_replace(u, "^(https://[^/?#]*):443($|[/?].*)", "$1$2")
    u = F.regexp_replace(u, "^(http://[^/?#]*):80($|[/?].*)", "$1$2")
    u = F.regexp_replace(u, "^(https?://)www\\.", "$1")
    track = _URL_TRACKING
    u = F.regexp_replace(u, f"&({track})=[^&#]*", "")
    u = F.regexp_replace(u, f"\\?({track})=[^&#]*&", "?")
    u = F.regexp_replace(u, f"\\?({track})=[^&#]*$", "")
    u = F.regexp_replace(u, "/+(\\?)", "$1")
    u = F.regexp_replace(u, "/+$", "")
    return u


QUERIES = {
    "text_url_canonicalize": q_text_url_canonicalize,
    "explode_token_freq": q_explode_token_freq,
    "text_repetition_filter": q_text_repetition_filter,
    "tokenize_pack_sequences": q_tokenize_pack_sequences,
    "text_pii_scrub": q_text_pii_scrub,
    "text_ngram_profile": q_text_ngram_profile,
    "sample_stratified_hash": q_sample_stratified_hash,
    "text_analysis_stats": q_text_analysis_stats,
    "text_language_id": q_text_language_id,
    "text_quality_score": q_text_quality_score,
    "text_fingerprint": q_text_fingerprint,
    "pipeline_llm_prep": q_pipeline_llm_prep,
    "pipeline_source_mixture": q_pipeline_source_mixture,
    "pipeline_shuffle_shard": q_pipeline_shuffle_shard,
}


def _marker_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"


_SCORE_SQL = {
    lang: (
        f"CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')), "
        f"{_marker_list(lang)})) AS BIGINT)"
    )
    for lang in _LANG_ORDER
}
_BEST_SQL = "GREATEST(" + ", ".join(_SCORE_SQL[lang] for lang in _LANG_ORDER) + ")"
_PRED_SQL = (
    "CASE "
    + " ".join(
        f"WHEN {_SCORE_SQL[lang]} = {_BEST_SQL} THEN '{lang}'"
        for lang in _LANG_ORDER
    )
    + " END"
)
_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"

def _pii_scrub_sql() -> str:
    """Same patterns, DuckDB RE2 side ('g' flag for replace-all).
    Counts mirror the Spark side: each pattern counts on the text
    after the earlier replacements (no overlap double-count)."""
    clean = "text"
    counts = []
    for tag, pat in _PII_PATTERNS:
        counts.append(f"LEN(REGEXP_EXTRACT_ALL({clean}, '{pat}'))")
        clean = f"REGEXP_REPLACE({clean}, '{pat}', '<{tag}>', 'g')"
    return f"""
        SELECT doc_id,
               {clean} AS clean_text,
               CAST({' + '.join(counts)} AS BIGINT) AS n_redactions
        FROM documents
    """


def _url_canon_sql() -> str:
    track = _URL_TRACKING
    return f"""
        WITH raw AS (
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 4 = 0 THEN
                       'HTTPS://WWW.Example.COM:443/Docs/'
                       || CAST(doc_id AS VARCHAR)
                       || '/?utm_source=feed&utm_campaign=x'
                     WHEN doc_id % 4 = 1 THEN
                       'http://blog.example.org/post/'
                       || CAST(doc_id AS VARCHAR) || '?id='
                       || CAST(doc_id AS VARCHAR)
                       || '&utm_medium=email&ref=rss#frag'
                     WHEN doc_id % 4 = 2 THEN
                       'https://' || source || '.example.net/a/b/'
                       || CAST(doc_id AS VARCHAR) || '/'
                     ELSE
                       'HTTP://Example.com:80/path/'
                       || CAST(doc_id AS VARCHAR)
                       || '?fbclid=abc123&q=term'
                   END AS raw_url
            FROM documents
        ),
        s1 AS (
            SELECT doc_id, raw_url,
                   REGEXP_REPLACE(raw_url, '#.*$', '') AS u
            FROM raw
        ),
        s2 AS (
            SELECT doc_id, raw_url,
                   LOWER(REGEXP_EXTRACT(u, '^[^:]+://[^/?#]*'))
                   || SUBSTR(u,
                        LENGTH(REGEXP_EXTRACT(u, '^[^:]+://[^/?#]*')) + 1)
                   AS u
            FROM s1
        ),
        s3 AS (
            SELECT doc_id, raw_url,
                REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                    u,
                    '^(https://[^/?#]*):443($|[/?].*)', '\\1\\2'),
                    '^(http://[^/?#]*):80($|[/?].*)', '\\1\\2'),
                    '^(https?://)www\\.', '\\1') AS u
            FROM s2
        ),
        s4 AS (
            SELECT doc_id, raw_url,
                REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                    u,
                    '&({track})=[^&#]*', '', 'g'),
                    '\\?({track})=[^&#]*&', '?', 'g'),
                    '\\?({track})=[^&#]*$', '') AS u
            FROM s3
        ),
        s5 AS (
            SELECT doc_id, raw_url,
                -- 'g' flags (r9 review wave 4): Spark regexp_replace is
                -- ALWAYS global; DuckDB defaults to first-match-only
                REGEXP_REPLACE(REGEXP_REPLACE(u, '/+(\\?)', '\\1', 'g'),
                               '/+$', '') AS canon_url
            FROM s4
        )
        SELECT doc_id, raw_url, canon_url,
               COALESCE(REGEXP_EXTRACT(canon_url,
                   '^[a-z]+://([^/:?#]+)', 1), '') AS host,
               COALESCE(REGEXP_EXTRACT(canon_url,
                   '^[a-z]+://[^/?#]*(/[^?#]*)', 1), '') AS path
        FROM s5
    """


ORACLE = {
    "text_url_canonicalize": _url_canon_sql(),
    "text_pii_scrub": _pii_scrub_sql(),
    # DuckDB arrays are 1-based (Spark's 0-based): range(1, len) with
    # ws[i] || ' ' || ws[i+1] builds the same len-1 bigrams as Spark's
    # sequence(0, size-2). MAX/COUNT stay BIGINT (no SUM → no HUGEINT
    # widening); ratios are the same single IEEE divisions.
    "text_repetition_filter": """
        WITH base AS (
            -- COALESCE mirrors the Spark side (r9): a NULL-text doc
            -- still gets a verdict instead of vanishing from the gate
            SELECT doc_id, STRING_SPLIT(COALESCE(text, ''), ' ') AS ws
            FROM documents
        ),
        wcnt AS (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST(ws) AS w FROM base)
            GROUP BY doc_id, w
        ),
        wagg AS (
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(MAX(c) AS BIGINT) AS top_word_n
            FROM wcnt GROUP BY doc_id
        ),
        bcnt AS (
            SELECT doc_id, b, COUNT(*) AS c
            FROM (SELECT doc_id,
                         UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ws)),
                                i -> ws[i] || ' ' || ws[i + 1])) AS b
                  FROM base WHERE LEN(ws) >= 2)
            GROUP BY doc_id, b
        ),
        bagg AS (
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                   CAST(MAX(c) AS BIGINT) AS top_bigram_n
            FROM bcnt GROUP BY doc_id
        )
        SELECT doc_id, n_words,
               CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
               CAST(top_word_n AS DOUBLE) / n_words AS top_word_ratio,
               CAST(top_bigram_n AS DOUBLE) / n_bigrams AS top_bigram_ratio,
               (top_word_n * 100 > n_words * 30
                OR COALESCE(top_bigram_n * 100 > n_bigrams * 18, FALSE))
                   AS repetitive
        FROM wagg
        LEFT JOIN bagg USING (doc_id)
    """,
    # Window SUM over BIGINT widens to HUGEINT in DuckDB — cast back
    # before the integer div/mod so dtypes match Spark's BIGINT.
    "tokenize_pack_sequences": f"""
        WITH base AS (
            SELECT doc_id,
                   {_md5_bucket_sql('doc_id', _PACK_BUCKETS)} AS bucket,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, bucket, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY bucket ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       - n_tokens AS cum_before
            FROM base
        )
        SELECT doc_id, bucket, n_tokens,
               cum_before // {_PACK_CTX} AS pack_id,
               cum_before % {_PACK_CTX} AS pack_offset
        FROM cum
    """,
    # Integer keep rule (bucket × n_source < target × resolution):
    # COUNT(*) stays BIGINT on both engines, so no float rate exists
    # anywhere in the decision — exact row-level parity by design.
    "pipeline_source_mixture": f"""
        WITH c AS (
            SELECT source, COUNT(*) AS n_source
            FROM documents GROUP BY source
        ),
        b AS (
            SELECT doc_id, lang, source,
                   {_md5_bucket_sql('doc_id', _MIX_RES)} AS mix_bucket
            FROM documents
        )
        SELECT doc_id, b.source, lang, n_source, mix_bucket
        FROM b JOIN c ON b.source = c.source
        WHERE mix_bucket * n_source < {_MIX_TARGET * _MIX_RES}
    """,
    "pipeline_shuffle_shard": f"""
        WITH k AS (
            SELECT doc_id,
                   MD5(CONCAT('shard:', CAST(doc_id AS VARCHAR)))
                       AS shuffle_key
            FROM documents
        ),
        s AS (
            SELECT doc_id, shuffle_key,
                   CAST(CONCAT('0x', SUBSTRING(shuffle_key, 1, 8))
                        AS BIGINT) % {_N_SHARDS} AS shard_id
            FROM k
        )
        SELECT doc_id, shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY shard_id ORDER BY shuffle_key) - 1
                   AS BIGINT) AS pos_in_shard,
               shuffle_key
        FROM s
    """,
    "sample_stratified_hash": f"""
        WITH b AS (
            SELECT doc_id, lang, source,
                   {_md5_bucket_sql('doc_id', 100)} AS sample_bucket
            FROM documents
        )
        SELECT doc_id, lang, source, sample_bucket
        FROM b
        WHERE sample_bucket < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
    """,
    "text_ngram_profile": """
        WITH tris AS (
            SELECT lang,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(text) - 1),
                                         i -> SUBSTRING(text, i, 3))) AS tri
            FROM documents
            WHERE LENGTH(text) >= 3
        ),
        counted AS (
            SELECT lang, tri, COUNT(*) AS n
            FROM tris GROUP BY lang, tri
        )
        SELECT lang, rank, tri, n FROM (
            SELECT lang, tri, n,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n DESC, tri) AS BIGINT)
                       AS rank
            FROM counted
        ) WHERE rank <= 10
    """,
    "explode_token_freq": """
        SELECT token, COUNT(*) AS n
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token
              FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 50
    """,
    "text_analysis_stats": f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               {oracle_dsum('CAST(n_chars AS DOUBLE)')} AS total_chars,
               {oracle_davg('CAST(n_chars AS DOUBLE)')} AS avg_chars,
               CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
               COUNT(DISTINCT source) AS n_sources,
               CAST(SUM(CASE WHEN LENGTH(text) = n_chars THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_chars_consistent
        FROM documents
        GROUP BY lang
    """,
    "text_language_id": f"""
        SELECT doc_id,
               lang AS lang_true,
               {_PRED_SQL} AS lang_pred,
               {_BEST_SQL} AS best_score,
               ({_PRED_SQL}) = lang AS is_match
        FROM documents
    """,
    "text_quality_score": f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars,
                   CAST(LENGTH(REGEXP_REPLACE(text, '[^a-z]', '', 'g'))
                        AS BIGINT) AS alpha_chars,
                   CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                        w -> LIST_CONTAINS({_STOP_LIST}, w))) AS BIGINT)
                       AS stop_hits
            FROM documents
        )
        SELECT doc_id,
               n_tokens,
               ROUND((n_chars - (n_tokens - 1)) / n_tokens, 6) AS mean_token_len,
               ROUND(stop_hits / n_tokens, 6) AS stopword_ratio,
               -- NULLIF: duckdb>=1.1 IEEE mode turns 0/0 into NaN, not
               -- NULL (and NaN >= t is TRUE) — version-proofed like the
               -- cosine oracles (r9 review wave 4, the flagged sweep)
               ROUND(alpha_chars / NULLIF(n_chars, 0), 6) AS alpha_ratio,
               ROUND(0.4 * (alpha_chars / NULLIF(n_chars, 0))
                     + 0.3 * LEAST((stop_hits / n_tokens) * 5.0, 1.0)
                     + 0.3 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0),
                     6) AS quality_score
        FROM feats
    """,
    "text_fingerprint": """
        SELECT doc_id,
               MD5(text) AS content_fp,
               MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
                   STRING_SPLIT(text, ' '))), ' ')) AS bag_fp,
               SUBSTRING(MD5(text), 1, 8) AS short_fp
        FROM documents
    """,
    "pipeline_llm_prep": """
        WITH filtered AS (
            SELECT doc_id, text
            FROM documents
            WHERE LENGTH(REGEXP_REPLACE(text, '[^a-z]', '', 'g'))
                  / NULLIF(LENGTH(text), 0) >= 0.6
              AND LEN(STRING_SPLIT(text, ' ')) >= 20
        ),
        deduped AS (
            SELECT MIN(doc_id) AS doc_id,
                   COUNT(*) AS n_copies,
                   text
            FROM filtered
            GROUP BY text
        )
        SELECT doc_id, n_copies,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
               MD5(text) AS content_fp
        FROM deduped
    """,
}
