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
# order is a verification budget. Four tiers (maintained per round
# against the latest VERDICT/CORRECTNESS artifacts):
#   0. changed since the last verdict — rewritten operators and
#      everything the r2 events-ts bug ERR'd (fresh rows needed most);
#   1. never driver-verified at all (new this round);
#   2. last verified in r1, code unchanged (stale-but-valid evidence);
#   3. green in CORRECTNESS_r02 (freshest evidence, cheapest to skip).
_CHANGED_SINCE_VERDICT = (
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
)
_VERIFIED_R2 = frozenset(
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
    }
)


# Queries with an r1 row (hash/rows evidence) whose code is unchanged
# since — from CORRECTNESS_r01.json. Anything in neither r1 nor r2
# lists has never had a driver row and outranks these.
_VERIFIED_R1 = frozenset(
    {
        "agg_bool_bitwise",
        "agg_stats_corr",
        "dedup_cluster_cc",
        "dedup_exact",
        "dedup_near_minhash",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "join_salted_skew",
        "merge_upsert",
        "scalar_conditional_regex",
        "scalar_string_date_math",
        "set_union_except_intersect",
        "similarity_topk_cosine",
        "sort_limit",
        "udf_python",
        "window_first_last",
    }
)


def _reorder(names: list[str]) -> list[str]:
    pos = {n: i for i, n in enumerate(_CHANGED_SINCE_VERDICT)}

    def key(item: tuple[int, str]) -> tuple[int, int]:
        i, n = item
        if n in pos:
            return (0, pos[n])
        if n not in _VERIFIED_R2 and n not in _VERIFIED_R1:
            return (1, i)  # never verified
        if n not in _VERIFIED_R2:
            return (2, i)  # r1 evidence only
        return (3, i)

    return [n for _, n in sorted(enumerate(names), key=key)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _load_modules():
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod.__name__}")
        out.update(mod.QUERIES)
    return {n: out[n] for n in _reorder(list(out))}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _load_modules():
        out.update(getattr(mod, "ORACLE", {}))
    unknown = out.keys() - queries().keys()
    if unknown:
        raise ValueError(f"oracle entries without a query: {unknown}")
    return {n: out[n] for n in _reorder(list(out))}
