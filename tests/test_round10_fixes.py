"""Round-10 fix pins.

Currently: the fuzzy-dedup hot-block cap (r9 verdict item 3) — a
planted shared-prefix corpus exercises both cap regimes (refine by the
next 4 chars; drop refined blocks still over the cap) while the normal
fixture stays bit-identical (covered by test_oracle_parity, since the
fixtures' largest block is 7 rows vs the 512 cap).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.parity import assert_frames_match

# Blocking geometry mirrored from dedup.py — the test breaks loudly if
# the constants drift apart from the corpus construction below.
_CAP = 512
_PFX_LEN = 8
_SALT = 4


def _hot_corpus():
    """Three families in one corpus:

    * normal: a 2-doc block far under the cap (pairs unchanged);
    * refined: 520 docs sharing the 8-char prefix + length bucket
      (over the cap) but split by chars 9-12 into 40 subgroups of 13 —
      the refinement regime keeps within-subgroup near-dup pairs and
      (by contract) blocks cross-subgroup ones apart;
    * dropped: 520 docs sharing prefix AND chars 9-12 AND length
      bucket — the refined block is still over the cap and is dropped
      from pairing entirely (the boilerplate-prefix pathological case).
    """
    docs = [
        (1, "NORMBLK " + "a" * 50),
        (2, "NORMBLK " + "a" * 25 + "b" * 25),  # distance 25 → IN
    ]
    # refined family: "BOILERPL" + 4-char subgroup salt + fixed filler
    # + 4-char per-doc tail (same length → same ÷10 bucket)
    for i in range(520):
        sub = i % 40
        docs.append((1000 + i, f"BOILERPL{sub:04d}" + "x" * 40 + f"{i:04d}"))
    # dropped family: identical first 12 chars, same length
    for i in range(520):
        docs.append((2000 + i, "HTMLBOILDOCT" + "y" * 40 + f"{i:04d}"))
    return docs


@pytest.fixture()
def hot_docs(spark, monkeypatch):
    import frinesis_spark.operators.dedup as dedup_mod
    from frinesis_spark import catalog

    docs = spark.createDataFrame(_hot_corpus(), "doc_id long, text string")
    real_table = catalog.table
    monkeypatch.setattr(
        dedup_mod,
        "table",
        lambda s, d, n: docs if n == "documents" else real_table(s, d, n),
    )
    return docs


def test_fuzzy_hot_block_cap_differential(spark, hot_docs):
    from frinesis_spark.operators import dedup

    assert dedup._BLOCK_CAP == _CAP and dedup._PREFIX == _PFX_LEN
    assert dedup._SALT_CHARS == _SALT

    spark_pdf = dedup.QUERIES["dedup_fuzzy_editdist"](
        spark, "crafted://hotblock"
    ).toPandas()
    duck = duckdb.connect()
    duck.register("documents", hot_docs.toPandas())
    duck_pdf = duck.sql(dedup.ORACLE["dedup_fuzzy_editdist"]).df()
    assert_frames_match(spark_pdf, duck_pdf, "dedup_fuzzy_editdist")

    pairs = {
        tuple(r) for r in spark_pdf[["doc_a", "doc_b"]].itertuples(index=False)
    }
    # normal regime untouched by the cap
    assert (1, 2) in pairs
    # refinement regime: within-subgroup near-dups survive (docs 1000
    # and 1040 share subgroup 0, differ only in the 4-char tail)...
    assert (1000, 1040) in pairs
    # ...and every surviving hot-family pair respects the refined
    # blocking (same chars 9-12), i.e. same subgroup mod 40
    hot = [(a, b) for a, b in pairs if a >= 1000 and b < 2000]
    assert hot and all((a - 1000) % 40 == (b - 1000) % 40 for a, b in hot)
    # dropped regime: the still-over-cap refined block contributes
    # ZERO pairs — bounded work, by contract, however skewed the corpus
    assert not [p for p in pairs if p[0] >= 2000 or p[1] >= 2000]


def test_fuzzy_hot_block_bound_is_quadratic_proof(spark, hot_docs):
    """The cap's work bound: no surviving block exceeds _BLOCK_CAP
    rows, so per-block pair work is ≤ cap² regardless of corpus skew.
    Asserted on the planted corpus by recomputing the surviving block
    sizes the query's own contract defines."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from frinesis_spark.operators import dedup

    d = hot_docs.select(
        "doc_id",
        F.substring("text", 1, dedup._PREFIX).alias("pfx"),
        F.expr(f"CAST(length(text) DIV {dedup._LEN_BUCKET} AS INT)").alias(
            "lb"
        ),
        "text",
    )
    d = d.withColumn(
        "n1", F.count(F.lit(1)).over(Window.partitionBy("pfx", "lb"))
    )
    d = d.withColumn(
        "pfx2",
        F.when(
            F.col("n1") > dedup._BLOCK_CAP,
            F.substring("text", dedup._PREFIX + 1, dedup._SALT_CHARS),
        ).otherwise(F.lit("")),
    )
    surviving = (
        d.groupBy("pfx", "lb", "pfx2")
        .count()
        .where(F.col("count") <= dedup._BLOCK_CAP)
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert surviving <= dedup._BLOCK_CAP
