#!/usr/bin/env python
"""Dump formatted physical plans for the headline queries → PLANS.md.

Plan-quality evidence for the scale posture: per query, the formatted
``explain`` output plus a quick automated audit — does the parquet scan
carry PushedFilters / a pruned ReadSchema, which joins broadcast, where
the exchanges (shuffles) are, and how much runs inside
WholeStageCodegen. Run after operator changes; commit the refreshed
PLANS.md.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

AUDITED = [
    "agg_group_sum",
    "project_filter",
    "join_broadcast",
    "join_multiway_star",
    "join_range_theta",
    "window_rank_topk",
    "sort_limit",
    "dedup_exact",
    "dedup_near_minhash",
    "multimodal_decode",
    "multimodal_resize",
    "similarity_topk_cosine",
    "text_analysis_stats",
    "join_asof",
    "join_salted_skew",
    "join_bucketed_colocated",
    "time_rollup_hypertable",
    "window_time_range",
    "sql_tpch_q3",
    "sink_partitioned_parquet",
    "agg_histogram",
    "merge_upsert",
    "dedup_cluster_cc",
    "pipeline_llm_prep",
    "dedup_embedding_cosine",
    "dedup_embedding_ann",
    "dedup_embedding_ann_audit",
    "dedup_containment_ngram",
    "window_anomaly_zscore",
    "agg_approx_quantile",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "join_asof_tolerance",
    "agg_filtered_conditional",
    "explode_token_freq",
    "source_orc_roundtrip",
    "time_ohlc_bars",
    "funnel_conversion",
    "agg_regression",
    "dedup_fuzzy_editdist",
    "embedding_quantize_int8",
    "text_ngram_profile",
    "sample_stratified_hash",
    "sql_tpch_q5",
    "sql_tpch_q6",
    "sql_tpch_q4",
    "sql_tpch_q17",
    "sql_tpch_q21",
    "sql_tpch_q22",
    "time_gapfill_locf",
    "window_session_islands",
    "analytics_retention_cohort",
    "udtf_table_chunks",
    "scalar_variant_shred",
    "agg_grouping_sets",
    "merge_scd2",
    "sql_tpch_q1",
    "sql_tpch_q14",
    "dedup_ngram_jaccard",
    "dedup_incremental_jaccard",
    # r7 additions — every new operator debuts with plan evidence
    "dedup_substring_chunks",
    "pipeline_source_mixture",
    "pipeline_shuffle_shard",
    "time_downsample_m4",
    "sink_sorted_clustered",
    "window_rolling_quantile",
    "source_schema_evolution",
    "analytics_cumulative_distinct",
    # r8 additions
    "join_bloom_prefilter",
    "text_url_canonicalize",
    "time_resample_interp",
    "analytics_ab_test",
    "agg_mode_frequent",
    "source_compressed_roundtrip",
    "window_ewma_smooth",
    "join_interval_buckets",
    # the r5 rotation dozen (oldest driver evidence) — plan evidence
    # rides along with their fresh correctness rows
    "agg_percentile",
    "agg_pivot",
    "agg_collect_sorted",
    "agg_string_concat",
    "window_running_frame",
    "join_cross_dims",
    "dedup_simhash",
    # r6 folds (r5 verdict #7): the combined queries' plans must show
    # the same Expand+HashAggregate / WindowExec shapes as the four
    # rows they replaced
    "agg_rollup_cube",
    "window_ranking_suite",
    # r6 TPC-H additions: the decorrelation/pushdown shapes that were
    # not yet plan-guarded (q18 semi-join over grouped HAVING, q19
    # disjunctive pushdown, q20 stacked semi-joins, q13 predicate-in-
    # join-condition outer join, q9 LIKE-dim broadcast 5-join)
    "sql_tpch_q9",
    "sql_tpch_q10",  # r7: completes plan evidence for all 22
    "sql_tpch_q13",
    "sql_tpch_q18",
    "sql_tpch_q19",
    "sql_tpch_q20",
    # r6 LLM-pipeline additions: pii scrub must be a zero-shuffle scan
    # projection; decontaminate a broadcast join + one count shuffle
    "text_pii_scrub",
    "dedup_decontaminate",
    # r6 TPC-H completion (22/22): q2 correlated-min pre-agg join, q7
    # symmetric two-nation disjunction, q8 double-nation 8-table chain,
    # q11 scalar-in-HAVING, q12 pivoted conditional counts, q15 CTE +
    # scalar MAX broadcast, q16 NOT IN anti join under COUNT DISTINCT
    "sql_tpch_q2",
    "sql_tpch_q7",
    "sql_tpch_q8",
    "sql_tpch_q11",
    "sql_tpch_q12",
    "sql_tpch_q15",
    "sql_tpch_q16",
    # r6 LLM-pipeline additions (2nd batch): repetition filter is two
    # doc_id-keyed partial-agg shuffles + a co-partitioned join-back;
    # sequence packing is ONE bucket shuffle + a running-sum window
    "text_repetition_filter",
    "tokenize_pack_sequences",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> list[str]:
    # Count from the numbered details section only — the tree header
    # repeats every node name.
    def nodes(op: str) -> int:
        return len(re.findall(rf"^\({{1}}\d+\) {op}", plan, re.M))

    notes = []
    scans = nodes("Scan parquet")
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    notes.append(f"- parquet scans: {scans}, with pushed filters: {pushed}")
    pruned = len(re.findall(r"PartitionFilters: \[[^\]]", plan))
    if pruned:
        notes.append(f"- scans with partition pruning: {pruned}")
    bj, smj, shj = (
        nodes("BroadcastHashJoin"),
        nodes("SortMergeJoin"),
        nodes("ShuffledHashJoin"),
    )
    if bj or smj or shj:
        notes.append(
            f"- joins: {bj} broadcast, {smj} sort-merge, {shj} shuffled-hash"
        )
    notes.append(f"- exchanges (shuffles): {nodes('Exchange')}")
    codegen_ids = set(re.findall(r"codegen id : (\d+)", plan))
    notes.append(f"- whole-stage codegen spans: {len(codegen_ids)}")
    if nodes("BroadcastNestedLoopJoin") or nodes("CartesianProduct"):
        notes.append("- NOTE: cross join present (intentional only for topk scoring)")
    return notes


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    from frinesis_spark import registry
    from frinesis_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain_plans")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE re-plans at runtime and hides codegen annotations in the
    # static plan; disable it here (only here) so the inspected plan is
    # the complete compile-time one.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    queries = registry.queries()

    out = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `tools/explain_plans.py` at `{sf_dir}`. For each query:",
        "an automated audit (scans/pushdown/joins/shuffles/codegen) and the",
        "formatted plan. Regenerate after operator changes.",
        "",
    ]
    for name in AUDITED:
        fn = queries.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        out.append(f"## {name}")
        out.append("")
        out.extend(audit(plan))
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")

    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'} ({len(out)} lines)")


if __name__ == "__main__":
    main()
