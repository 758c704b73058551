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
        # streaming.tws is NOT registered: transformWithStateInPandas
        # needs protobuf, broken in this container for six straight
        # rounds — demoted to an optional module per the r6 verdict
        # (see its module docstring; tests/test_tws.py stays env-gated)
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
# order is a verification budget. Four tiers (refreshed at r8 start from
# CORRECTNESS_r07.json via tools/refresh_tiers.py):
#   0. changed since the r7 verdict — operators whose behavior this
#      round touched, so their green rows no longer cover them;
#   1. never driver-verified (implicit: in no list);
#   2. stale evidence, ordered OLDEST ROUND FIRST within the tier:
#      the 35 r5-green rows the r7 verdict flagged as the backlog lead,
#      then the 41 r6-green rows absent from the r7 window (43 were
#      refreshed as r6-stale; 2 — the ANN pair — moved to tier 0);
#   3. green in CORRECTNESS_r07 (freshest evidence, cheapest to skip).
# Window arithmetic (r8): 128 carried + 8 new (join_bloom_prefilter,
# text_url_canonicalize, time_resample_interp, analytics_ab_test,
# agg_mode_frequent, source_compressed_roundtrip, window_ewma_smooth,
# join_interval_buckets — tier 1 by construction, verified in their
# debut round) = 136 registered. The 35 r5 rows MUST all land in the
# ~50-slot window (r7 verdict item 1: "no registered query's evidence
# older than r6" at the r8 verdict); the window fills as |tier0|=6 +
# 8 never-verified + 35 r5-stale = 49 ≤ 50, so the guarantee holds
# with ONE slot of slack (the r7 tier-0 policy holds: only
# BEHAVIOR-relevant changes consume slots; registration growth and
# further tier-0 promotion are frozen for r8 — the slack is spent). The 41 remaining r6 rows
# then age to 2 rounds — still inside the registry's ≤2-round
# guarantee — and lead r9.
_CHANGED_SINCE_VERDICT = (
    # r8: window_rolling_quantile re-planned onto bounded-overlap
    # re-chunking (r7 verdict item 2) — parallelism no longer bounded
    # by |event_type|; same oracle, differential-pinned vs old plan
    "window_rolling_quantile",
    # r8: the rows-only trio became self-checking (VERDICT r7 item 4):
    # agg_approx_distinct emits exact counts + a 4σ error-bound
    # boolean; the ANN pair emit (n_queries, k, recall-floor boolean)
    # graded in-query against the exact top-k — all three now carry
    # DuckDB oracles and must re-verify
    "agg_approx_distinct",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    # r8: scd2 merge core gained the change-detection guard that makes
    # at-least-once batch replay idempotent (r7 verdict item 6) —
    # fixture output is bit-identical but no-op updates now behave
    # differently, so it re-verifies (merge_upsert, also refactored
    # onto the shared core, is already at the head of the stale tier)
    "merge_scd2",
    # r8: prio_num's no-match path pinned NULL (bare ANSI cast of
    # regexp_extract's '' no-match killed the job on crafted data)
    "scalar_conditional_regex",
)
# Demoted under the tier-0 policy (fixture output BIT-IDENTICAL —
# re-verified by full local sims this round — with crafted-frame
# differential evidence in tests/test_round8_fixes.py): the
# multimodal trio's NULL-payload paths (fixture has no NULL text),
# q_multimodal_resize's hash-free dims projection (same values,
# cheaper plan), stream_user_profile's NULL-skipping max and
# stream_custom_sessionize's integer-µs gap compare (boundary-gap
# crafted stream test in tests/test_round8_fixes.py; sessionize is in
# the r5-stale window anyway so it re-verifies regardless); wave 6's
# cosine-oracle NULLIF (inert on this duckdb — 1.0 already NULLs x/0;
# version-proofing only), the norm-precompute (bit-identical cosines,
# local sim re-verified), and sql_tpch_q16's <= threshold guard (ONE
# shared SQL text runs on both engines, so it re-agrees by
# construction — the r7 q7/q8 demotion precedent; local sim green).

_STALE_EVIDENCE = {
    "agg_bool_bitwise": 5,
    "agg_histogram": 5,
    "agg_percentile": 5,
    "agg_pivot": 5,
    "dedup_cluster_cc": 5,
    "dedup_incremental_jaccard": 5,
    "dedup_near_minhash": 5,
    "dedup_ngram_jaccard": 5,
    "dedup_simhash": 5,
    "join_asof": 5,
    "join_cross_dims": 5,
    "join_range_theta": 5,
    "join_salted_skew": 5,
    "merge_upsert": 5,
    "sample_stratified_hash": 5,
    "set_union_except_intersect": 5,
    "sink_kinesis_batched": 5,
    "sort_limit": 5,
    "source_kinesis_datasource": 5,
    "source_kinesis_read": 5,
    "source_orc_roundtrip": 5,
    "sql_tpch_q10": 5,
    "sql_tpch_q5": 5,
    "sql_tpch_q6": 5,
    "stream_custom_sessionize": 5,
    "stream_dedup_stateful": 5,
    "stream_sliding_agg": 5,
    "stream_stream_join": 5,
    "stream_tumbling_agg": 5,
    "stream_watermark_late": 5,
    "text_ngram_profile": 5,
    "time_rollup_hypertable": 5,
    "udtf_table_chunks": 5,
    "window_rank_topk": 5,
    "window_time_range": 5,
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
    "text_repetition_filter": 6,
    "text_token_count": 6,
    "time_ohlc_bars": 6,
    "tokenize_pack_sequences": 6,
    "udf_python": 6,
    "window_lag_lead": 6,
}
_VERIFIED_LAST = frozenset(
    {
        "agg_collect_sorted",
        "agg_distinct",
        "agg_group_sum",
        "agg_grouping_sets",
        "agg_stats_corr",
        "agg_string_concat",
        "analytics_cumulative_distinct",
        "analytics_retention_cohort",
        "dedup_decontaminate",
        "dedup_substring_chunks",
        "embedding_quantize_int8",
        "explode_token_freq",
        "filter_in_between_like",
        "funnel_conversion",
        "join_anti",
        "join_broadcast",
        "join_bucketed_colocated",
        "join_inner_equi",
        "join_left_outer",
        "join_multiway_star",
        "join_semi",
        "pipeline_llm_prep",
        "pipeline_shuffle_shard",
        "pipeline_source_mixture",
        "project_filter",
        "scalar_variant_shred",
        "scan_parquet",
        "sink_compacted_parquet",
        "sink_partitioned_parquet",
        "sink_sorted_clustered",
        "source_csv_roundtrip",
        "source_schema_evolution",
        "source_text_lines_roundtrip",
        "sql_tpch_q1",
        "sql_tpch_q14",
        "sql_tpch_q17",
        "sql_tpch_q21",
        "sql_tpch_q22",
        "sql_tpch_q3",
        "sql_tpch_q4",
        "stream_foreach_batch_upsert",
        "time_downsample_m4",
        "time_gapfill_locf",
        "window_first_last",
        "window_ranking_suite",
        "window_running_frame",
        "window_session_islands",
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
