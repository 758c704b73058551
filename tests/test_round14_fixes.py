"""Round-14 fixes: the r13 ADVICE lows and verdict items.

- uniform tRNS loud-failure contract across PNG color types 0/2/3
  (ADVICE: greyscale/truecolor color-key transparency was silently
  ignored while palette tRNS raised);
- deterministic pair-key collapse in ``audit_exact_cosine_pairs``
  (``groupBy.max`` instead of ``dropDuplicates``) and the shared
  audit-mod count (one count-star per registered-query build).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from frinesis_spark.functions.png import png_decode, png_encode


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


class TestTrnsUniformContract:
    """tRNS defines transparency on every non-alpha color type; the
    decoder must raise for all of them, not just palette."""

    def _with_trns(self, ctype: int, px: bytes, trns: bytes) -> bytes:
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, ctype, 0, 0, 0)
        raw = zlib.compress(bytes([0]) + px)  # filter 0 + one pixel
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"tRNS", trns)
            + _chunk(b"IDAT", raw)
            + _chunk(b"IEND", b"")
        )

    def test_greyscale_color_key_rejected(self):
        data = self._with_trns(0, bytes(1), struct.pack(">H", 7))
        with pytest.raises(ValueError, match="tRNS.*transparent-color key"):
            png_decode(data)

    def test_truecolor_color_key_rejected(self):
        data = self._with_trns(2, bytes(3), struct.pack(">HHH", 1, 2, 3))
        with pytest.raises(ValueError, match="tRNS.*transparent-color key"):
            png_decode(data)

    def test_alpha_types_still_decode(self):
        # tRNS is meaningless on types 4/6 (they carry real alpha);
        # the encoder never emits it and plain images stay decodable.
        for ctype, bpp in ((4, 2), (6, 4)):
            data = png_encode(2, 2, bytes(range(4 * bpp)), color_type=ctype)
            assert png_decode(data)[2] is not None


class TestAuditPairDeterminism:
    """r13 ADVICE: the retained cos_sim for a both-audit pair must be a
    deterministic aggregate, and the helper must accept a caller-supplied
    audit modulus so the registered query runs ONE count-star."""

    def test_cos_sim_is_max_aggregated(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from frinesis_spark.operators import dedup as D
        from frinesis_spark.catalog import table

        n = table(spark, sf_dir, "embeddings").count()
        mod = D._ann_audit_mod(n)
        pairs = D.audit_exact_cosine_pairs(spark, sf_dir, audit_mod=mod)
        # one row per pair key, and re-running yields identical cosines
        # (max over orientations is order-free; dropDuplicates was not)
        rows = {(r.a_id, r.b_id): r.cos_sim for r in pairs.collect()}
        again = {
            (r.a_id, r.b_id): r.cos_sim
            for r in D.audit_exact_cosine_pairs(
                spark, sf_dir, audit_mod=mod
            ).collect()
        }
        assert rows == again
        assert len(rows) == pairs.count()

    def test_explicit_mod_matches_derived(self, spark, sf_dir):
        from frinesis_spark.operators import dedup as D
        from frinesis_spark.catalog import table

        n = table(spark, sf_dir, "embeddings").count()
        derived = D.audit_exact_cosine_pairs(spark, sf_dir)
        explicit = D.audit_exact_cosine_pairs(
            spark, sf_dir, audit_mod=D._ann_audit_mod(n)
        )
        assert sorted(map(tuple, derived.collect())) == sorted(
            map(tuple, explicit.collect())
        )


class TestSampledJaccardGraders:
    """r13 verdict item 1: the hash-family grades sample the exact
    side to the size-absolute md5 audit slice, with the predicate
    pushed INTO the inverted-index join's candidate generation — never
    filtering a full Σdf² pair materialization.

    Pinned to sf0.01 — the scale the driver grades at — because the
    sf0.001 fixture's audit slice is vacuous (0 sampled pairs, grades
    TRUE by contract) and these differentials need non-vacuous rows."""

    @pytest.fixture()
    def sf_dir(self):
        return "/root/testdata/sf0.01"

    def test_restricted_equals_filtered_full(self, spark, sf_dir):
        """The load-bearing differential: the restricted two-orientation
        join must produce EXACTLY the full exact-Jaccard pair set
        filtered by the audit predicate — rows, jaccard, n_common."""
        from pyspark.sql import functions as F

        from frinesis_spark.catalog import table
        from frinesis_spark.operators import dedup as D
        from frinesis_spark.operators.text import _md5_bucket

        mod = D._ann_audit_mod(table(spark, sf_dir, "documents").count())
        restricted = {
            tuple(r)
            for r in D.audit_exact_jaccard_pairs(
                spark, sf_dir, audit_mod=mod
            ).collect()
        }
        full_filtered = {
            tuple(r)
            for r in D.q_dedup_ngram_jaccard(spark, sf_dir)
            .where(
                (_md5_bucket(F.col("doc_a"), mod) == 0)
                | (_md5_bucket(F.col("doc_b"), mod) == 0)
            )
            .collect()
        }
        assert restricted == full_filtered
        assert restricted, "fixture audit slice must be non-vacuous"
        # canonical ordering + no self pairs held through the two
        # orientations, and no pair appears twice
        assert all(a < b for a, b, _, _ in restricted)

    def test_orientations_disjoint_small_mod(self, spark, sf_dir):
        """With mod=1 every doc is audit, so orientation 2's
        non-audit side is EMPTY and orientation 1 alone must cover the
        full pair set exactly once — the disjointness construction at
        its degenerate extreme."""
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

    def test_grader_catches_broken_candidates(self, spark, sf_dir):
        """The sampled grade is still a real grade: an empty candidate
        set on a non-vacuous slice must land recall_floor_met=False."""
        from frinesis_spark.operators import dedup as D

        empty = spark.createDataFrame([], "doc_a long, doc_b long")
        row = D._sampled_pair_recall(spark, sf_dir, empty, 80).collect()[0]
        assert row["n_sampled_exact_pairs"] > 0
        assert row["recall_floor_met"] is False
