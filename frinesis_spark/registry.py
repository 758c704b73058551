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
# order is a verification budget. Four tiers (refreshed each round from
# the newest CORRECTNESS/VERDICT artifacts — r4 state, from
# CORRECTNESS_r03.json):
#   0. changed since the r3 verdict — operators whose code this round
#      touched, so their green r3 rows no longer cover them;
#   1. never driver-verified at all (new this round — the r4 SQL
#      subquery suite + stream_user_profile fall here automatically);
#   2. stale evidence: last green in r2 (38 queries) or r1
#      (similarity_topk_cosine) and code-unchanged since — the whole
#      set the r3 verdict flagged as the top rotation priority;
#   3. green in CORRECTNESS_r03 (freshest evidence, cheapest to skip).
# Budget check (r4): |tier0| 6 + |tier1| 17 + |tier2| 39 = 62 for the
# ~50-slot window — the 12 queries added late in r4 (3 timeseries,
# UDTF chunker, variant shred, grouping sets, SCD-2 merge, text-lines
# source, SQL Q1/Q14, compaction, incremental dedup) push the last ~12
# tier-2 (r2-green, code-unchanged) rows past the nominal budget; they and the 44 r3-green rows rotate in r5 (two-round
# rotation, declared per the r3 verdict's window-budget note).
_CHANGED_SINCE_VERDICT = (
    "sql_tpch_q3",  # register_views caching sentinel (shared sqlapi path)
    "dedup_ngram_jaccard",  # stop-shingle DF cap
    "dedup_near_minhash",  # stop-shingle DF cap (shared shingler)
    "dedup_cluster_cc",  # checkpoint-dir parameter
    "embedding_quantize_int8",  # zero-scale guard
    "stream_foreach_batch_upsert",  # version cleanup + empty-replay guard
)

# Last green row r2 (or r1 for similarity_topk_cosine), code unchanged
# since; no r3 row — the driver's window must re-verify these first
# after tier 0/1.
_STALE_EVIDENCE = frozenset(
    {
        "text_analysis_stats",
        "text_language_id",
        "text_quality_score",
        "text_token_count",
        "text_fingerprint",
        "pipeline_llm_prep",
        "multimodal_join",
        "multimodal_decode",
        "multimodal_resize",
        "multimodal_frame_sample",
        "source_csv_roundtrip",
        "source_json_roundtrip",
        "sink_partitioned_parquet",
        "join_bucketed_colocated",
        "scan_parquet",
        "project_filter",
        "filter_in_between_like",
        "join_inner_equi",
        "join_broadcast",
        "join_left_outer",
        "join_semi",
        "join_anti",
        "join_multiway_star",
        "agg_group_sum",
        "agg_distinct",
        "agg_approx_distinct",
        "agg_rollup",
        "agg_cube",
        "agg_percentile",
        "agg_pivot",
        "window_rank_topk",
        "window_running_frame",
        "window_ntile_ranks",
        "agg_collect_sorted",
        "agg_histogram",
        "agg_string_concat",
        "window_rank_cume",
        "join_cross_dims",
        "similarity_topk_cosine",
    }
)

# Every green row in CORRECTNESS_r03.json (50 queries). Members that
# also appear in _CHANGED_SINCE_VERDICT are outranked by tier 0 — the
# r3 evidence predates this round's code change.
_VERIFIED_R3 = frozenset(
    {
        "dedup_embedding_cosine",
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        "join_range_theta",
        "join_asof",
        "scalar_array_map_json",
        "time_rollup_hypertable",
        "window_time_range",
        "sql_tpch_q3",
        "stream_tumbling_agg",
        "stream_sliding_agg",
        "stream_session_window",
        "stream_watermark_late",
        "stream_dedup_stateful",
        "stream_stream_join",
        "stream_custom_sessionize",
        "sink_kinesis_batched",
        "source_kinesis_read",
        "source_kinesis_datasource",
        "explode_token_freq",
        "text_ngram_profile",
        "sample_stratified_hash",
        "stream_foreach_batch_upsert",
        "source_orc_roundtrip",
        "sql_tpch_q5",
        "sql_tpch_q6",
        "sql_tpch_q10",
        "join_asof_tolerance",
        "window_lag_lead",
        "agg_filtered_conditional",
        "time_ohlc_bars",
        "funnel_conversion",
        "agg_regression",
        "dedup_fuzzy_editdist",
        "embedding_quantize_int8",
        "window_first_last",
        "agg_bool_bitwise",
        "sort_limit",
        "set_union_except_intersect",
        "join_salted_skew",
        "merge_upsert",
        "agg_stats_corr",
        "scalar_string_date_math",
        "scalar_conditional_regex",
        "udf_python",
        "dedup_exact",
        "dedup_near_minhash",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_cluster_cc",
    }
)


def _check_tiers(registered: set[str]) -> None:
    """Fail loudly on tier-list typos (ADVICE r3): every hand-maintained
    tier name must be a registered query, mirroring oracle_sql()'s
    unknown-entry check — otherwise a rename silently demotes a query
    to the wrong verification tier."""
    for tier_name, tier in (
        ("_CHANGED_SINCE_VERDICT", set(_CHANGED_SINCE_VERDICT)),
        ("_STALE_EVIDENCE", _STALE_EVIDENCE),
        ("_VERIFIED_R3", _VERIFIED_R3),
    ):
        unknown = tier - registered
        if unknown:
            raise ValueError(
                f"registry tier {tier_name} names unregistered queries "
                f"{sorted(unknown)} — refresh the tier lists"
            )


def _reorder(names: list[str]) -> list[str]:
    pos = {n: i for i, n in enumerate(_CHANGED_SINCE_VERDICT)}

    def key(item: tuple[int, str]) -> tuple[int, int]:
        i, n = item
        if n in pos:
            return (0, pos[n])
        if n not in _STALE_EVIDENCE and n not in _VERIFIED_R3:
            return (1, i)  # never verified
        if n in _STALE_EVIDENCE:
            return (2, i)  # stale (r1/r2) evidence
        return (3, i)  # fresh r3 evidence

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
    unknown = out.keys() - queries().keys()
    if unknown:
        raise ValueError(f"oracle entries without a query: {unknown}")
    return {n: out[n] for n in _reorder(list(out))}
