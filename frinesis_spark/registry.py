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
        "frinesis_spark.streaming.tws",
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
# order is a verification budget. Four tiers (refreshed at r6 start from
# CORRECTNESS_r05.json via tools/refresh_tiers.py):
#   0. changed since the r5 verdict — operators whose code this round
#      touched, so their green r5 rows no longer cover them;
#   1. never driver-verified (new r6 registrations, if any);
#   2. stale evidence, ordered OLDEST ROUND FIRST within the tier:
#      the 12 r3-green rows the r5 verdict flagged for rotation, then
#      the 44 r4-green rows absent from the r5 window;
#   3. green in CORRECTNESS_r05 (freshest evidence, cheapest to skip).
# Window arithmetic (r6): registry folded 106 → 104 (r5 verdict #7:
# agg_rollup+agg_cube → agg_rollup_cube, window_rank_cume+
# window_ntile_ranks → window_ranking_suite — near-identical surfaces
# that re-verified separately every rotation). The window fills as
# 8 tier0 (scalar_array_map_json, stream_session_window, the three
# Catalyst-cosine consumers of the try_divide fix, agg_stats_corr,
# agg_regression, text_quality_score — agg_regression was r3-stale
# and text_quality_score r4-stale anyway, so those two promotions
# cost at most one extra slot) + 18 tier1 + 11 r3-stale + 13 of the
# 43 r4-stale = 50; the ~29-row r4 remainder rotates to r7 (and
# leads r7's window as its oldest tier — max evidence age at any
# verdict stays 2 rounds). Slack spent this round: 8 tier0 + 18 tier1
# (2 folded queries + 12 TPC-H shapes q9/q13/q18/q19/q20 then
# q2/q7/q8/q11/q12/q15/q16 — the classic suite is now complete at
# 22/22 — + text_pii_scrub + dedup_decontaminate +
# text_repetition_filter + tokenize_pack_sequences) = 23 of the
# 38-slot post-rotation budget. Steady state: 120 registered vs a
# 50-slot window = 2.4-round average rotation; tier0 discipline
# (small code-change fan-out) keeps the worst case at 3 rounds for
# the lowest-risk code-unchanged rows only. Registry growth stops
# here for r6.
_CHANGED_SINCE_VERDICT = (
    # r6: props parsed as map<string,string> + regex-gated try_cast per
    # key on both engines — NULL-aligned under non-long values (ADVICE
    # r5 + the r6 review's TRY_CAST-rounds-'3.5' divergence)
    "scalar_array_map_json",
    # r6: oracle split condition corrected >= → > (Spark session_window
    # merges an event landing exactly at the prior session's end — the
    # adversarial differential test caught the boundary divergence)
    "stream_session_window",
    # r6: cosine_similarity → try_divide (a zero-norm embedding used to
    # kill the whole job with ANSI DIVIDE_BY_ZERO; NULL now, matching
    # DuckDB's x/0). Every Catalyst-cosine consumer re-verifies.
    "similarity_topk_cosine",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    # r6: corr composed from covar_pop/(σ·σ) with try_divide (F.corr
    # throws on a zero-variance group — same ANSI job-kill class);
    # regr_* outputs +0.0-normalized (engines disagree on the SIGN of
    # an exactly-zero intercept, which repr-hashing distinguishes).
    "agg_stats_corr",
    "agg_regression",
    # r6: alpha_ratio → try_divide (an EMPTY document — length 0 —
    # killed the job with ANSI DIVIDE_BY_ZERO; NULL now, like DuckDB)
    "text_quality_score",
)

_STALE_EVIDENCE = {
    "agg_filtered_conditional": 3,
    "agg_regression": 3,
    "dedup_embedding_cosine": 3,
    "dedup_exact": 3,
    "dedup_fuzzy_editdist": 3,
    "funnel_conversion": 3,
    "join_asof_tolerance": 3,
    "scalar_conditional_regex": 3,
    "scalar_string_date_math": 3,
    "time_ohlc_bars": 3,
    "udf_python": 3,
    "window_lag_lead": 3,
    "agg_approx_distinct": 4,
    "agg_distinct": 4,
    "agg_group_sum": 4,
    "agg_grouping_sets": 4,
    "analytics_retention_cohort": 4,
    "embedding_quantize_int8": 4,
    "filter_in_between_like": 4,
    "join_anti": 4,
    "join_broadcast": 4,
    "join_bucketed_colocated": 4,
    "join_inner_equi": 4,
    "join_left_outer": 4,
    "join_multiway_star": 4,
    "join_semi": 4,
    "merge_scd2": 4,
    "multimodal_decode": 4,
    "multimodal_frame_sample": 4,
    "multimodal_join": 4,
    "multimodal_resize": 4,
    "pipeline_llm_prep": 4,
    "project_filter": 4,
    "scan_parquet": 4,
    "sink_compacted_parquet": 4,
    "sink_partitioned_parquet": 4,
    "source_csv_roundtrip": 4,
    "source_json_roundtrip": 4,
    "source_text_lines_roundtrip": 4,
    "sql_tpch_q1": 4,
    "sql_tpch_q14": 4,
    "sql_tpch_q17": 4,
    "sql_tpch_q21": 4,
    "sql_tpch_q22": 4,
    "sql_tpch_q3": 4,
    "sql_tpch_q4": 4,
    "stream_foreach_batch_upsert": 4,
    "stream_user_profile": 4,
    "text_analysis_stats": 4,
    "text_fingerprint": 4,
    "text_language_id": 4,
    "text_quality_score": 4,
    "text_token_count": 4,
    "time_gapfill_locf": 4,
    "window_session_islands": 4,
}

_VERIFIED_LAST = frozenset(
    {
        "agg_bool_bitwise",
        "agg_collect_sorted",
        "agg_histogram",
        "agg_percentile",
        "agg_pivot",
        "agg_stats_corr",
        "agg_string_concat",
        "dedup_cluster_cc",
        "dedup_incremental_jaccard",
        "dedup_near_minhash",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "explode_token_freq",
        "join_asof",
        "join_cross_dims",
        "join_range_theta",
        "join_salted_skew",
        "merge_upsert",
        "sample_stratified_hash",
        "scalar_array_map_json",
        "scalar_variant_shred",
        "set_union_except_intersect",
        "similarity_ann_ivf",
        "similarity_ann_lsh",
        "similarity_topk_cosine",
        "sink_kinesis_batched",
        "sort_limit",
        "source_kinesis_datasource",
        "source_kinesis_read",
        "source_orc_roundtrip",
        "sql_tpch_q10",
        "sql_tpch_q5",
        "sql_tpch_q6",
        "stream_custom_sessionize",
        "stream_dedup_stateful",
        "stream_session_window",
        "stream_sliding_agg",
        "stream_stream_join",
        "stream_tumbling_agg",
        "stream_watermark_late",
        "text_ngram_profile",
        "time_rollup_hypertable",
        "udtf_table_chunks",
        "window_first_last",
        "window_rank_topk",
        "window_running_frame",
        "window_time_range",
    }
)


def _check_tiers(registered: set[str]) -> None:
    """Fail loudly on tier-list typos (ADVICE r3): every hand-maintained
    tier name must be a registered query, mirroring oracle_sql()'s
    unknown-entry check — otherwise a rename silently demotes a query
    to the wrong verification tier."""
    for tier_name, tier in (
        ("_CHANGED_SINCE_VERDICT", set(_CHANGED_SINCE_VERDICT)),
        ("_STALE_EVIDENCE", set(_STALE_EVIDENCE)),
        ("_VERIFIED_LAST", _VERIFIED_LAST),
    ):
        unknown = tier - registered
        if unknown:
            raise ValueError(
                f"registry tier {tier_name} names unregistered queries "
                f"{sorted(unknown)} — refresh the tier lists"
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
