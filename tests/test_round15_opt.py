"""Round-15 OPTIMIZATION pins (see OPTIMIZATION_r15.md).

The audit-slice exact-Jaccard grader (shared by dedup_near_minhash and
dedup_simhash) must broadcast its size-absolute AUDIT side, never the
corpus-sized index side: Catalyst cannot estimate the md5-bucket
filter's selectivity, so without the explicit hint both join inputs
carry the parent's stats and the planner was broadcasting the full
260k-posting index (32 MiB at sf0.1 — and corpus-sized, i.e. an OOM,
at real scale). The hint pins the build side to the one input that is
bounded by construction.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestAuditGraderBuildSide:
    def test_audit_side_is_build_side(self, spark, sf_dir):
        """Both orientation joins of audit_exact_jaccard_pairs build
        (broadcast) their LEFT input — the audit postings — not the
        full-index right side."""
        from frinesis_spark.operators import dedup as D

        plan = _plan_text(D.audit_exact_jaccard_pairs(spark, sf_dir))
        # The two orientation joins carry the doc_id inequality in
        # their join condition; both must be BuildLeft now.
        assert plan.count("BroadcastHashJoin Inner BuildLeft") >= 2, plan

    def test_restricted_equals_filtered_full_still_holds(
        self, spark, sf_dir
    ):
        """The build-side flip is plan-only: audit_mod=1 (everything
        is audit) must still reproduce the full ngram pair set
        exactly (the r14 differential pin, re-run on the new plan)."""
        from frinesis_spark.operators import dedup as D

        everything = {
            tuple(r)
            for r in D.audit_exact_jaccard_pairs(
                spark, sf_dir, audit_mod=1
            ).collect()
        }
        full = {
            tuple(r)
            for r in D.q_dedup_ngram_jaccard(spark, sf_dir).collect()
        }
        assert everything == full
