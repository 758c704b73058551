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
# order is a verification budget. Four tiers (refreshed at r14 start from
# CORRECTNESS_r13.json via tools/refresh_tiers.py):
#   0. changed since the r13 verdict — operators whose behavior this
#      round touched, so their green rows no longer cover them;
#   1. never driver-verified (implicit: in no list);
#   2. stale evidence, ordered OLDEST ROUND FIRST within the tier:
#      the 46 r11-green rows lead (the guarantee boundary — they must
#      verify THIS round, r13 verdict item 2), then the 45 r12-green;
#   3. green in CORRECTNESS_r13 (freshest evidence, cheapest to skip).
#
# VERIFICATION-WINDOW POLICY (decided r10, per r9 verdict item 2).
# The standing guarantee is "every registered query's latest driver
# evidence is at most TWO rounds old" — i.e. each query is re-verified
# at least once per three consecutive driver windows.  With a ~50-slot
# window that caps total capacity at 3 x 50 = 150 slot-uses per cycle,
# shared between the |registry| one-per-cycle visits and tier-0
# re-verifications of changed queries.  Policy:
#   * net registrations are FROZEN at REGISTRY_CAP = 141 queries
#     (exactly the current size — adding one means retiring one);
#   * per-round tier-0 churn budget is the window slack after the
#     oldest-stale backlog is scheduled (r14: 50 - 46 = 4 slots, but
#     a tier-0 promotion of a row already AT the boundary is free —
#     it occupies the slot it was owed anyway);
#   * tools/refresh_tiers.py ASSERTS the arithmetic at refresh time
#     (window_capacity_ok) and tests/test_registry.py pins it, so a
#     growth-busts-guarantee state fails at registration time, not at
#     verdict time.
# r14 window fill: tier-0 leads (changes land here), then the 46
# r11-stale rows (guarantee boundary; two of them — similarity_ann_lsh /
# similarity_ann_ivf — are expected tier-0 promotions, shrinking the
# tier-2 head), then the oldest r12-stale rows absorb any remainder.
_CHANGED_SINCE_VERDICT = (
    # r14 (verdict item 1): both hash-family grades now measure recall
    # over the size-absolute md5 audit slice of the exact-Jaccard pair
    # set (output column renamed n_sampled_exact_pairs; the audit
    # predicate is pushed into the exact side's candidate generation) —
    # the grading contract changed, so prior green rows no longer
    # cover them.
    "dedup_near_minhash",
    "dedup_simhash",
    # r14 (verdict item 4): IVF list count now scales ~sqrt(corpus)
    # (floored at the old fixed 64, so every sf<=0.1 fixture trains the
    # identical index — but the serving contract changed at scale).
    # similarity_ann_ivf was already at the r11 guarantee boundary, so
    # this promotion costs no extra window slot.
    "similarity_ann_ivf",
    # r14: the embedding pair pass holds its corpus coverage as lists
    # grows (probe = lists/8, floor 8) — driver-fixture outputs are
    # bit-identical (64 lists -> probe 8) but the serving contract at
    # scale changed, same promotion standard r13 applied to its own
    # fixture-inert changes.
    "dedup_embedding_ann",
    "dedup_embedding_ann_audit",
)

# tier 2: stale evidence — last green before r13 (91 queries); name -> last-green round, the
# _reorder sort key (oldest evidence claims window slots first)
_STALE_EVIDENCE = {
    "agg_approx_distinct": 11,
    "agg_bool_bitwise": 11,
    "agg_histogram": 11,
    "agg_mode_frequent": 11,
    "agg_percentile": 11,
    "agg_pivot": 11,
    "analytics_ab_test": 11,
    "dedup_cluster_cc": 11,
    "dedup_incremental_jaccard": 11,
    "dedup_ngram_jaccard": 11,
    "join_asof": 11,
    "join_bloom_prefilter": 11,
    "join_cross_dims": 11,
    "join_interval_buckets": 11,
    "join_range_theta": 11,
    "join_salted_skew": 11,
    "merge_upsert": 11,
    "scalar_conditional_regex": 11,
    "set_union_except_intersect": 11,
    "similarity_ann_lsh": 11,
    "sink_kinesis_batched": 11,
    "sort_limit": 11,
    "source_compressed_roundtrip": 11,
    "source_kinesis_datasource": 11,
    "source_kinesis_read": 11,
    "source_orc_roundtrip": 11,
    "sql_tpch_q10": 11,
    "sql_tpch_q5": 11,
    "sql_tpch_q6": 11,
    "stream_custom_sessionize": 11,
    "stream_dedup_stateful": 11,
    "stream_incremental_batches": 11,
    "stream_sliding_agg": 11,
    "stream_stream_join": 11,
    "stream_tumbling_agg": 11,
    "stream_user_profile": 11,
    "stream_watermark_late": 11,
    "text_language_id": 11,
    "text_quality_score": 11,
    "time_resample_interp": 11,
    "time_rollup_hypertable": 11,
    "udtf_table_chunks": 11,
    "window_ewma_smooth": 11,
    "window_rank_topk": 11,
    "window_time_range": 11,
    "agg_approx_quantile": 12,
    "agg_filtered_conditional": 12,
    "agg_regression": 12,
    "agg_rollup_cube": 12,
    "dedup_containment_ngram": 12,
    "dedup_embedding_cosine": 12,
    "dedup_exact": 12,
    "join_asof_tolerance": 12,
    "merge_scd2": 12,
    "multimodal_frame_sample": 12,
    "multimodal_join": 12,
    "pipeline_llm_prep": 12,
    "pipeline_shuffle_shard": 12,
    "pipeline_source_mixture": 12,
    "sample_stratified_hash": 12,
    "scalar_array_map_json": 12,
    "scalar_string_date_math": 12,
    "similarity_topk_cosine": 12,
    "source_csv_roundtrip": 12,
    "source_json_roundtrip": 12,
    "source_schema_evolution": 12,
    "source_text_lines_roundtrip": 12,
    "sql_tpch_q11": 12,
    "sql_tpch_q12": 12,
    "sql_tpch_q13": 12,
    "sql_tpch_q15": 12,
    "sql_tpch_q16": 12,
    "sql_tpch_q18": 12,
    "sql_tpch_q19": 12,
    "sql_tpch_q2": 12,
    "sql_tpch_q20": 12,
    "sql_tpch_q7": 12,
    "sql_tpch_q8": 12,
    "sql_tpch_q9": 12,
    "stream_foreach_batch_upsert": 12,
    "stream_session_window": 12,
    "text_fingerprint": 12,
    "text_ngram_profile": 12,
    "text_repetition_filter": 12,
    "text_url_canonicalize": 12,
    "time_ohlc_bars": 12,
    "udf_python": 12,
    "window_anomaly_zscore": 12,
}

# tier 3: green in CORRECTNESS_r13 (50 queries)
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
        "dedup_fuzzy_editdist",
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
        "multimodal_decode",
        "multimodal_resize",
        "project_filter",
        "scalar_variant_shred",
        "scan_parquet",
        "sink_compacted_parquet",
        "sink_partitioned_parquet",
        "sink_sorted_clustered",
        "sql_tpch_q1",
        "sql_tpch_q14",
        "sql_tpch_q17",
        "sql_tpch_q21",
        "sql_tpch_q22",
        "sql_tpch_q3",
        "sql_tpch_q4",
        "stream_dedup_bounded",
        "text_analysis_stats",
        "text_pii_scrub",
        "time_downsample_m4",
        "time_gapfill_locf",
        "tokenize_pack_sequences",
        "window_first_last",
        "window_ranking_suite",
        "window_rolling_quantile",
        "window_running_frame",
        "window_session_islands",
    }
)

# Mirror of tools/refresh_tiers.py's REGISTRY_CAP (3-round guarantee x
# (50-slot window - 3 tier-0 churn)); tests/test_registry.py asserts the
# two constants stay equal.  Enforced at registration time so a new
# QUERIES entry above the cap fails the suite immediately (r9 verdict
# item 2), not two rounds later when its evidence silently ages out.
REGISTRY_CAP = 141


def _check_tiers(registered: set[str]) -> None:
    """Fail loudly on tier-list typos (ADVICE r3): every hand-maintained
    tier name must be a registered query, mirroring oracle_sql()'s
    unknown-entry check — otherwise a rename silently demotes a query
    to the wrong verification tier."""
    if len(registered) > REGISTRY_CAP:
        raise ValueError(
            f"{len(registered)} registered queries exceed REGISTRY_CAP="
            f"{REGISTRY_CAP} — the 2-round evidence guarantee no longer "
            "fits the driver's 50-slot window (see the tier header); "
            "retire a query or renegotiate the guarantee"
        )
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
