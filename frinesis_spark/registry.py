"""Central registry assembling the driver contract.

Merges every operator module's ``QUERIES`` / ``ORACLE`` dicts; used by
``__spark_entry__.py`` and by the local parity tests (which mirror the
driver's DuckDB hash-compare at a smaller scale factor).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = []


def _load_modules():
    global _MODULES
    if _MODULES:
        return _MODULES
    from frinesis_spark.operators import relational, scalar

    # Registration order IS the driver's correctness-run order, and the
    # driver's budget can truncate the tail (round 1 stopped mid-`text`,
    # leaving 23 queries unverified). Order by (never-yet-verified,
    # cheap) first so a truncated run still covers everything at least
    # once across rounds; the expensive iterative dedup/similarity block
    # goes last.
    mods = []
    for optional in (
        "frinesis_spark.operators.text",
        "frinesis_spark.operators.multimodal",
        "frinesis_spark.streaming.windows",
        "frinesis_spark.streaming.stateful",
        # transformWithStateInPandas is NOT registered: its worker
        # protocol needs google.protobuf, absent from this container
        # for eight straight rounds (r9 final disposition: filesystem
        # search found no wheel or package to vendor, and installing
        # is out of scope) — the implementation is retired to
        # tests/fixtures/tws_user_profile.py; stream_user_profile
        # (streaming/stateful.py) carries the semantics in the
        # contract
        "frinesis_spark.sinks.kinesis_query",
        "frinesis_spark.sources.kinesis_query",
        "frinesis_spark.sources.files",
        "frinesis_spark.sinks.files",
        "frinesis_spark.operators.sqlapi",
        "frinesis_spark.operators.timeseries",
    ):
        try:
            mods.append(__import__(optional, fromlist=["QUERIES"]))
        except ImportError:
            pass
    mods.extend([relational, scalar])
    for optional in (
        "frinesis_spark.operators.dedup",
        "frinesis_spark.operators.similarity",
    ):
        try:
            mods.append(__import__(optional, fromlist=["QUERIES"]))
        except ImportError:
            pass
    _MODULES = mods
    return mods


# The driver checks ~50 queries per round in registration order, so the
# order is a verification budget. Four tiers (refreshed at r9 start from
# CORRECTNESS_r08.json via tools/refresh_tiers.py):
#   0. changed since the r8 verdict — operators whose behavior this
#      round touched, so their green rows no longer cover them;
#   1. never driver-verified (implicit: in no list);
#   2. stale evidence, ordered OLDEST ROUND FIRST within the tier:
#      the 39 r6-green rows the r8 verdict flagged as the backlog lead,
#      then the 47 r7-green rows absent from the r8 window;
#   3. green in CORRECTNESS_r08 (freshest evidence, cheapest to skip).
# Window arithmetic (r9): |tier0| + new tier-1 registrations + the 39
# r6-stale rows must fit the ~50-slot window (r8 verdict item 1: "no
# registered query's evidence older than r7" at the r9 verdict).
# Final r9 fill: 3 tier0 + 5 new (dedup_embedding_ann,
# dedup_containment_ngram, window_anomaly_zscore, agg_approx_quantile,
# stream_incremental_batches) + 39 r6-stale = 47 ≤ 50 — registration
# FROZEN for the round at 3 slots of slack.
_CHANGED_SINCE_VERDICT = (
    # r9: the last two rows-only queries became self-grading (VERDICT
    # r8 item 2): both now join their candidate pairs against the
    # exact n-gram Jaccard pair set in-query and emit a recall-floor
    # boolean the DuckDB oracle asserts — they carry oracles for the
    # first time and must verify under them
    "dedup_near_minhash",
    "dedup_simhash",
    # r9: scd2_merge re-planned onto ONE full-outer join + map-side
    # explode (was two shuffle joins of the same inputs), and its
    # oracle gained the change-detection guard the Spark side has had
    # since r8 — fixture output bit-identical (local sim green), but
    # the merge core's plan shape changed, so it re-verifies
    "merge_scd2",
)
# Demoted under the tier-0 policy (fixture output BIT-IDENTICAL,
# re-verified by a full local driver sim at r9 start): the simhash
# fingerprint worker's trailing-NULL-text reduceat fix (fixture has no
# NULL text; crafted-frame pins in tests/test_round9_fixes.py),
# window_rolling_quantile's bounded context-pair window (bit-identity
# vs the serial plan re-pinned by the r8 differentials), and
# source_compressed_roundtrip's eqNullSafe codecs_agree (fixture has
# no all-NULL-acctbal nation; crafted pin in test_round9_fixes.py).
# Review-wave-2 demotions (same policy, targeted local sims green):
# the `\z` end anchors in scalar_conditional_regex /
# scalar_array_map_json / scalar_variant_shred (fixture has no
# trailing-newline values; divergence + fix pinned in
# tests/test_round9_differential.py) and scalar_variant_shred's
# to_json(struct) payload + NULL-event_type filter (fixture
# event_types are non-null plain strings — hash unchanged; hostile
# frames pinned in the same file).
# Review-wave-3 demotions (fixture hashes verified unchanged by
# targeted sims; crafted divergences pinned in
# tests/test_round9_differential.py): funnel_conversion's NULL-user
# filter, agg_mode_frequent's asc_nulls_last tie-break,
# window_lag_lead's asc_nulls_last sort, time_ohlc_bars' oracle FLOOR
# bucketing (pre-1970 only), and the shared _revenue() extraction
# (same expression text, three sites).
# Review-wave-4 demotions (text.py; fixture hashes verified unchanged
# by targeted sims, crafted pins in test_round9_differential.py):
# text_fingerprint's NULL-text bag_fp guard, the NULLIF
# version-proofing sweep in text_quality_score/pipeline_llm_prep
# oracles (the r8 watch-item), text_url_canonicalize's 'g' flags +
# open-ended substring, and text_repetition_filter's
# NULL-text-gets-a-verdict coalesce (both sides).
# Review-wave-7 demotions (connectors/multimodal; fixture hashes
# verified unchanged, crafted pins in test_round9_differential.py):
# source_text_lines_roundtrip's NULL-text filter (both sides — the
# line format cannot represent NULL), multimodal_join's
# try_element_at (empty-array ANSI job kill), and
# source_compressed_roundtrip's null-safe join key + count-based
# presence flag (NULL-nation group must match itself).
# Review-wave-8 demotions (kinesis; fixture hashes verified unchanged
# by targeted sims, unit pins in test_round9_fixes.py + the full
# 50-test kinesis suite green): PutRecords byte-limit chunking +
# oversize-record drop (fixture payloads are tiny), the replay
# stop-bound guard for vanished sequence numbers, budget-aware
# GetRecords Limit, the missing-partition-key UUID fallback, and
# eager write_batch (the registered query always actioned it).
# Review-wave-9 demotions (streaming; fixture hashes verified
# unchanged, crafted pins in test_round9_differential.py):
# stream_sliding_agg's oracle FLOOR bucketing (pre-1970 only) and
# stream_dedup_stateful's watermark removal (the watermark bounded
# nothing — event time is not a dedup key — but armed the late-row
# drop on multi-batch replays; single-batch fixture output
# bit-identical).

_STALE_EVIDENCE = {
    "agg_filtered_conditional": 6,
    "agg_regression": 6,
    "agg_rollup_cube": 6,
    "dedup_embedding_cosine": 6,
    "dedup_exact": 6,
    "dedup_fuzzy_editdist": 6,
    "join_asof_tolerance": 6,
    "multimodal_decode": 6,
    "multimodal_frame_sample": 6,
    "multimodal_join": 6,
    "multimodal_resize": 6,
    "scalar_array_map_json": 6,
    "scalar_string_date_math": 6,
    "similarity_topk_cosine": 6,
    "source_json_roundtrip": 6,
    "sql_tpch_q11": 6,
    "sql_tpch_q12": 6,
    "sql_tpch_q13": 6,
    "sql_tpch_q15": 6,
    "sql_tpch_q16": 6,
    "sql_tpch_q18": 6,
    "sql_tpch_q19": 6,
    "sql_tpch_q2": 6,
    "sql_tpch_q20": 6,
    "sql_tpch_q7": 6,
    "sql_tpch_q8": 6,
    "sql_tpch_q9": 6,
    "stream_session_window": 6,
    "stream_user_profile": 6,
    "text_analysis_stats": 6,
    "text_fingerprint": 6,
    "text_language_id": 6,
    "text_pii_scrub": 6,
    "text_quality_score": 6,
    "text_token_count": 6,
    "time_ohlc_bars": 6,
    "tokenize_pack_sequences": 6,
    "udf_python": 6,
    "window_lag_lead": 6,
    "agg_collect_sorted": 7,
    "agg_distinct": 7,
    "agg_group_sum": 7,
    "agg_grouping_sets": 7,
    "agg_stats_corr": 7,
    "agg_string_concat": 7,
    "analytics_cumulative_distinct": 7,
    "analytics_retention_cohort": 7,
    "dedup_decontaminate": 7,
    "dedup_substring_chunks": 7,
    "embedding_quantize_int8": 7,
    "explode_token_freq": 7,
    "filter_in_between_like": 7,
    "funnel_conversion": 7,
    "join_anti": 7,
    "join_broadcast": 7,
    "join_bucketed_colocated": 7,
    "join_inner_equi": 7,
    "join_left_outer": 7,
    "join_multiway_star": 7,
    "join_semi": 7,
    "pipeline_llm_prep": 7,
    "pipeline_shuffle_shard": 7,
    "pipeline_source_mixture": 7,
    "project_filter": 7,
    "scalar_variant_shred": 7,
    "scan_parquet": 7,
    "sink_compacted_parquet": 7,
    "sink_partitioned_parquet": 7,
    "sink_sorted_clustered": 7,
    "source_csv_roundtrip": 7,
    "source_schema_evolution": 7,
    "source_text_lines_roundtrip": 7,
    "sql_tpch_q1": 7,
    "sql_tpch_q14": 7,
    "sql_tpch_q17": 7,
    "sql_tpch_q21": 7,
    "sql_tpch_q22": 7,
    "sql_tpch_q3": 7,
    "sql_tpch_q4": 7,
    "stream_foreach_batch_upsert": 7,
    "time_downsample_m4": 7,
    "time_gapfill_locf": 7,
    "window_first_last": 7,
    "window_ranking_suite": 7,
    "window_running_frame": 7,
    "window_session_islands": 7,
}
_VERIFIED_LAST = frozenset(
    {
        "agg_approx_distinct",
        "agg_bool_bitwise",
        "agg_histogram",
        "agg_mode_frequent",
        "agg_percentile",
        "agg_pivot",
        "analytics_ab_test",
        "dedup_cluster_cc",
        "dedup_incremental_jaccard",
        "dedup_ngram_jaccard",
        "join_asof",
        "join_bloom_prefilter",
        "join_cross_dims",
        "join_interval_buckets",
        "join_range_theta",
        "join_salted_skew",
        "merge_upsert",
        "sample_stratified_hash",
        "scalar_conditional_regex",
        "set_union_except_intersect",
        "similarity_ann_ivf",
        "similarity_ann_lsh",
        "sink_kinesis_batched",
        "sort_limit",
        "source_compressed_roundtrip",
        "source_kinesis_datasource",
        "source_kinesis_read",
        "source_orc_roundtrip",
        "sql_tpch_q10",
        "sql_tpch_q5",
        "sql_tpch_q6",
        "stream_custom_sessionize",
        "stream_dedup_stateful",
        "stream_sliding_agg",
        "stream_stream_join",
        "stream_tumbling_agg",
        "stream_watermark_late",
        "text_ngram_profile",
        "text_repetition_filter",
        "text_url_canonicalize",
        "time_resample_interp",
        "time_rollup_hypertable",
        "udtf_table_chunks",
        "window_ewma_smooth",
        "window_rank_topk",
        "window_rolling_quantile",
        "window_time_range",
    }
)

def _check_tiers(registered: set[str]) -> None:
    """Fail loudly on tier-list typos (ADVICE r3): every hand-maintained
    tier name must be a registered query, mirroring oracle_sql()'s
    unknown-entry check — otherwise a rename silently demotes a query
    to the wrong verification tier."""
    tiers = (
        ("_CHANGED_SINCE_VERDICT", set(_CHANGED_SINCE_VERDICT)),
        ("_STALE_EVIDENCE", set(_STALE_EVIDENCE)),
        ("_VERIFIED_LAST", _VERIFIED_LAST),
    )
    for tier_name, tier in tiers:
        unknown = tier - registered
        if unknown:
            raise ValueError(
                f"registry tier {tier_name} names unregistered queries "
                f"{sorted(unknown)} — refresh the tier lists"
            )
    # Pairwise disjointness (ADVICE r7): a name in two tiers is only
    # harmless because _reorder checks _CHANGED_SINCE_VERDICT first;
    # assert it so a precedence change or one-sided removal can't
    # silently mis-tier a query.
    for i in range(len(tiers)):
        for j in range(i + 1, len(tiers)):
            dup = tiers[i][1] & tiers[j][1]
            if dup:
                raise ValueError(
                    f"query names {sorted(dup)} appear in both "
                    f"{tiers[i][0]} and {tiers[j][0]} — tiers must be "
                    "disjoint"
                )


def _reorder(names: list[str]) -> list[str]:
    pos = {n: i for i, n in enumerate(_CHANGED_SINCE_VERDICT)}

    def key(item: tuple[int, str]) -> tuple[int, int, int]:
        i, n = item
        if n in pos:
            return (0, 0, pos[n])
        if n not in _STALE_EVIDENCE and n not in _VERIFIED_LAST:
            return (1, 0, i)  # never verified
        if n in _STALE_EVIDENCE:
            # stale evidence: oldest green round first so the r1/r2
            # dozen is guaranteed a slot even if the window truncates
            return (2, _STALE_EVIDENCE[n], i)
        return (3, 0, i)  # fresh last-round evidence

    return [n for _, n in sorted(enumerate(names), key=key)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _load_modules():
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod.__name__}")
        out.update(mod.QUERIES)
    _check_tiers(set(out))
    return {n: out[n] for n in _reorder(list(out))}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _load_modules():
        out.update(getattr(mod, "ORACLE", {}))
    q_order = list(queries())
    unknown = out.keys() - set(q_order)
    if unknown:
        raise ValueError(f"oracle entries without a query: {unknown}")
    # Mirror queries() order exactly (not an independent _reorder over
    # the oracle names, whose within-tier tie-break could differ) so
    # both halves of the driver contract present one verification order.
    return {n: out[n] for n in q_order if n in out}
