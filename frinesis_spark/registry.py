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
# the newest CORRECTNESS artifact via tools/refresh_tiers.py — r5
# state, from CORRECTNESS_r04.json):
#   0. changed since the r4 verdict — operators whose code this round
#      touched, so their green r4 rows no longer cover them;
#   1. never driver-verified at all (none at r5 start — every one of
#      the 106 registered queries has a green row somewhere);
#   2. stale evidence, ordered OLDEST ROUND FIRST within the tier:
#      similarity_topk_cosine (r1), 11 r2-green agg/window/join rows,
#      then the 44 r3-green rows absent from the r4 window;
#   3. green in CORRECTNESS_r04 (freshest evidence, cheapest to skip).
# Window arithmetic (r5, from refresh_tiers.py): 0 never + 56 stale
# (1×r1 + 11×r2 + 44×r3) + |tier0| changed-this-round = 56+ for the
# ~50-slot window. The r1/r2 dozen fills the very front (the r4
# verdict's top item); the last ~6-12 r3-stale rows rotate to r6,
# completing the declared two-round rotation. No new §2C queries are
# added in r5 precisely to keep this arithmetic closable (verdict #7).
_CHANGED_SINCE_VERDICT = (
    "dedup_ngram_jaccard",  # unrounded-jaccard filter + cached sizes
    "dedup_incremental_jaccard",  # unrounded-jaccard filter + cached sizes
    "dedup_cluster_cc",  # consumes the changed ngram_jaccard pair path
    "dedup_near_minhash",  # DF-cap collision contract documented + tested
    "dedup_simhash",  # fingerprint table moved into the statistics cache
    "udtf_table_chunks",  # NULL-text alignment with the oracle (ADVICE r4)
    "scalar_variant_shred",  # missing-key NULL alignment (ADVICE r4)
    "scalar_array_map_json",  # oracle derives n_keys from the JSON
    "similarity_ann_lsh",  # index cache keyed on applicationId
    "similarity_ann_ivf",  # index cache keyed on applicationId
)

# Last green row before r4 (round noted per name), code unchanged
# since; absent from CORRECTNESS_r04 — the driver's window re-verifies
# these after tier 0/1, oldest evidence first.
_STALE_EVIDENCE = {
    "similarity_topk_cosine": 1,
    "agg_collect_sorted": 2,
    "agg_cube": 2,
    "agg_histogram": 2,
    "agg_percentile": 2,
    "agg_pivot": 2,
    "agg_string_concat": 2,
    "join_cross_dims": 2,
    "window_ntile_ranks": 2,
    "window_rank_cume": 2,
    "window_rank_topk": 2,
    "window_running_frame": 2,
    "agg_bool_bitwise": 3,
    "agg_filtered_conditional": 3,
    "agg_regression": 3,
    "agg_stats_corr": 3,
    "dedup_embedding_cosine": 3,
    "dedup_exact": 3,
    "dedup_fuzzy_editdist": 3,
    "dedup_simhash": 3,
    "explode_token_freq": 3,
    "funnel_conversion": 3,
    "join_asof": 3,
    "join_asof_tolerance": 3,
    "join_range_theta": 3,
    "join_salted_skew": 3,
    "merge_upsert": 3,
    "sample_stratified_hash": 3,
    "scalar_conditional_regex": 3,
    "scalar_string_date_math": 3,
    "set_union_except_intersect": 3,
    "sink_kinesis_batched": 3,
    "sort_limit": 3,
    "source_kinesis_datasource": 3,
    "source_kinesis_read": 3,
    "source_orc_roundtrip": 3,
    "sql_tpch_q10": 3,
    "sql_tpch_q5": 3,
    "sql_tpch_q6": 3,
    "stream_custom_sessionize": 3,
    "stream_dedup_stateful": 3,
    "stream_session_window": 3,
    "stream_sliding_agg": 3,
    "stream_stream_join": 3,
    "stream_tumbling_agg": 3,
    "stream_watermark_late": 3,
    "text_ngram_profile": 3,
    "time_ohlc_bars": 3,
    "time_rollup_hypertable": 3,
    "udf_python": 3,
    "window_first_last": 3,
    "window_lag_lead": 3,
    "window_time_range": 3,
}

# Every green row in CORRECTNESS_r04.json (50 queries). Members that
# also appear in _CHANGED_SINCE_VERDICT are outranked by tier 0 — the
# r4 evidence predates this round's code change.
_VERIFIED_LAST = frozenset(
    {
        "agg_approx_distinct",
        "agg_distinct",
        "agg_group_sum",
        "agg_grouping_sets",
        "agg_rollup",
        "analytics_retention_cohort",
        "dedup_cluster_cc",
        "dedup_incremental_jaccard",
        "dedup_near_minhash",
        "dedup_ngram_jaccard",
        "embedding_quantize_int8",
        "filter_in_between_like",
        "join_anti",
        "join_broadcast",
        "join_bucketed_colocated",
        "join_inner_equi",
        "join_left_outer",
        "join_multiway_star",
        "join_semi",
        "merge_scd2",
        "multimodal_decode",
        "multimodal_frame_sample",
        "multimodal_join",
        "multimodal_resize",
        "pipeline_llm_prep",
        "project_filter",
        "scalar_variant_shred",
        "scan_parquet",
        "sink_compacted_parquet",
        "sink_partitioned_parquet",
        "source_csv_roundtrip",
        "source_json_roundtrip",
        "source_text_lines_roundtrip",
        "sql_tpch_q1",
        "sql_tpch_q14",
        "sql_tpch_q17",
        "sql_tpch_q21",
        "sql_tpch_q22",
        "sql_tpch_q3",
        "sql_tpch_q4",
        "stream_foreach_batch_upsert",
        "stream_user_profile",
        "text_analysis_stats",
        "text_fingerprint",
        "text_language_id",
        "text_quality_score",
        "text_token_count",
        "time_gapfill_locf",
        "udtf_table_chunks",
        "window_session_islands",
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
