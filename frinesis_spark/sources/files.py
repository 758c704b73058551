"""File-format source connectors: CSV and JSON-lines read paths.

The engine's tables are parquet, but a complete source surface also
reads delimited text and JSON lines — the two interchange formats a
pipeline actually receives. Each query here proves the full connector
contract (writer → files on disk → schema-explicit reader → query) by
round-tripping a table and aggregating the re-read copy; the oracle
runs the same aggregate on the original parquet, so any parse/type
drift in the connector fails the hash compare.

Scale notes: both readers are splittable scans (CSV by line, JSON by
line), so they parallelize like parquet minus columnar pruning —
`ReadSchema` still prunes columns for JSON, and the explicit schema
avoids the full inference pass (at 100 TB, schema inference is a
whole extra read of the data). Writers shard one file per task.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frinesis_spark.catalog import table
from frinesis_spark.functions.numeric import dsum, oracle_dsum


def _roundtrip_dir(fmt: str) -> str:
    from frinesis_spark.sinks.files import scratch_dir

    return scratch_dir("frinesis_spark_roundtrip", fmt)


# Lossless CSV round-trip contract (r7 differential finds — the bare
# writer/reader pair silently corrupted three value classes):
#   - Spark's CSV WRITER trims cell whitespace by default
#     (ignoreLeading/TrailingWhiteSpace default TRUE on write) —
#     ' pad ' came back 'pad';
#   - empty string and NULL both serialized to an empty cell — ''
#     came back NULL; the '\\N' null sentinel (the Hive/Postgres COPY
#     convention) disambiguates;
#   - embedded newlines need multiLine on the reader or the row SPLITS
#     ('line\\nbreak' came back as two rows). multiLine makes each
#     file single-task (unsplittable) — the documented trade: for
#     newline-free big-data CSV drop it and the scan is splittable.
# Reserved literal: a real '\\N' string reads back as NULL (the same
# limitation Postgres/DuckDB COPY have for their NULLSTR; quoteAll
# cannot fix it — the writer backslash-escapes the sentinel itself).
_CSV_WRITE_OPTS = {
    "header": "true",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "nullValue": "\\N",
}
_CSV_READ_OPTS = {
    "header": "true",
    "multiLine": "true",
    "nullValue": "\\N",
}


def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV connector: write `nation` as headered CSV, read it back with
    an explicit schema, aggregate nations per region.

    Quoting/escaping is exercised by the writer→reader pair with the
    LOSSLESS option set (see ``_CSV_WRITE_OPTS`` — whitespace
    preserved, NULL vs '' disambiguated by the ``\\N`` sentinel,
    embedded newlines survive); the explicit schema (taken from the
    parquet copy) makes the reader a typed single pass — no inference
    scan.
    """
    n = table(spark, sf_dir, "nation")
    path = _roundtrip_dir("csv")
    n.write.mode("overwrite").options(**_CSV_WRITE_OPTS).csv(path)
    back = spark.read.schema(n.schema).options(**_CSV_READ_OPTS).csv(path)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_nation"),
    )


def q_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines connector: write `supplier` as JSONL, read it back
    with an explicit schema, aggregate balances per nation.

    Doubles survive JSONL round-trips bit-exactly in Spark (writer
    emits shortest-repr, reader parses to the same IEEE value); the
    decimal-exact sum then makes the aggregate order-independent.
    """
    s = table(spark, sf_dir, "supplier")
    path = _roundtrip_dir("json")
    s.write.mode("overwrite").json(path)
    back = spark.read.schema(s.schema).json(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dsum("s_acctbal").alias("acctbal_sum"),
    )


def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC connector: write `part` as ORC, read it back, aggregate
    retail price per brand.

    ORC is the second columnar format a complete engine must speak
    (Hive-ecosystem interchange). The reader is a vectorized columnar
    scan with predicate pushdown and column pruning exactly like
    parquet — `.explain` on the read-back shows `PushedFilters` /
    `ReadSchema` against the ORC relation. Types survive bit-exactly
    (columnar doubles, no text parse), so the oracle aggregate on the
    original parquet must hash-match.
    """
    p = table(spark, sf_dir, "part")
    path = _roundtrip_dir("orc")
    p.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum("p_retailprice").alias("retail_sum"),
        F.countDistinct("p_type").alias("n_types"),
    )


def q_source_text_lines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-lines connector: write the document corpus as gzipped
    one-document-per-line text files, read it back with the line
    source, and recompute corpus statistics — the canonical LLM-corpus
    ingest format (web-crawl dumps arrive exactly like this).

    The aggregate (line count, exact char volume, distinct lines,
    length extremes) is computed from the RE-READ copy, so any
    encoding/line-splitting drift in the connector fails the hash
    compare against the original column. Scale note: gzip is not
    splittable — parallelism comes from file count, not file splits
    (the writer shards one file per task, preserving it); at 100 TB
    prefer zstd/bzip2 or sized shards, same connector. The fixture's
    documents contain no newlines (asserted by the n_lines check —
    an embedded newline would change the count).
    """
    # NULL text dropped on BOTH sides (r9 review wave 7): Spark's
    # text writer emits a bare newline for NULL (probed), so a NULL
    # row would silently round-trip as '' — corrupting min_len /
    # n_distinct vs the NULL-skipping oracle aggregates and violating
    # the lossless claim. The line format simply cannot represent
    # NULL; declaring it out of the contract beats corrupting it.
    d = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    path = _roundtrip_dir("text_gz")
    d.select("text").write.mode("overwrite").option(
        "compression", "gzip"
    ).text(path)
    back = spark.read.text(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("n_chars_total"),
        F.countDistinct("value").alias("n_distinct"),
        F.min(F.length("value")).cast("long").alias("min_len"),
        F.max(F.length("value")).cast("long").alias("max_len"),
    )


def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: a dataset whose early files were
    written BEFORE a column existed, read as one table with
    ``mergeSchema`` — the additive-column migration every long-lived
    data lake accumulates (files are immutable; the schema grows, the
    old files stay).

    v1 files carry (orderkey, totalprice, status) for pre-1997 orders; v2
    files add ``o_orderpriority`` for the rest. The merged read fills
    the missing column with NULL for v1 rows; the aggregate splits
    counts by priority-known vs priority-missing per order status, so
    a reader that dropped v1 rows, invented non-NULL priorities, or
    failed the union would hash-mismatch the oracle (which rebuilds
    the same two-generation view from the original table).

    Scale: schema merge is a FOOTER-only planning step (one footer
    per file at job start — with _common_metadata or a catalog it is
    O(1)); the data path remains an ordinary vectorized scan where
    v1 files materialize the missing column as a constant-NULL
    vector. No shuffle beyond the final aggregate.
    """
    o = table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    path = _roundtrip_dir("schema_evolution")
    (
        o.where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "gen=1"))
    )
    (
        o.where(F.col("o_orderdate") >= cutoff)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "gen=2"))
    )
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        dsum("o_totalprice").alias("total"),
    )


def q_source_compressed_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compressed-codec round-trips: `customer` written as gzip JSONL
    AND zstd parquet, both read back, aggregated, and cross-checked —
    100 TB corpora ship compressed, so codec handling is part of the
    connector surface (gzip: whole-file, NOT splittable — one task
    per file, keep files shard-sized; zstd parquet: block-compressed,
    fully splittable, the storage default at scale).

    Output is one row per nation with the gzip-path aggregates plus a
    ``codecs_agree`` boolean pinning that the zstd path produced the
    IDENTICAL aggregates (doubles survive both round-trips bit-exactly
    — JSONL via shortest-repr parse, parquet natively); the oracle
    recomputes the aggregates from the original table and asserts
    TRUE.
    """
    c = table(spark, sf_dir, "customer")
    gz_path = _roundtrip_dir("json_gz")
    zstd_path = _roundtrip_dir("parquet_zstd")
    c.write.mode("overwrite").option("compression", "gzip").json(gz_path)
    c.write.mode("overwrite").option("compression", "zstd").parquet(
        zstd_path
    )

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("acctbal_sum"),
        )

    gz = agg(spark.read.schema(c.schema).json(gz_path))
    zs = agg(spark.read.parquet(zstd_path)).select(
        F.col("c_nationkey").alias("z_nationkey"),
        F.col("n_customers").alias("z_n"),
        F.col("acctbal_sum").alias("z_sum"),
    )
    return (
        # eqNullSafe JOIN KEY (r9 wave 7 — the r8 fix covered the
        # aggregate comparison but not the key): a NULL-nation group
        # aggregates on both paths and must match ITSELF, not emit two
        # unmatched codecs_agree=false rows.
        gz.join(zs, gz["c_nationkey"].eqNullSafe(zs["z_nationkey"]), "full_outer")
        .select(
            "c_nationkey",
            "n_customers",
            "acctbal_sum",
            (
                # eqNullSafe: a nation group whose acctbal values are
                # all NULL sums to NULL on both paths, and null-unsafe
                # `==` would turn TRUE-agreement into NULL while the
                # oracle pins TRUE (ADVICE r8 — same class this round
                # fixed elsewhere). Presence = the COUNT column, never
                # the key: a NULL nation key is a legitimate matched
                # group under the null-safe join (r9 review wave 7).
                F.col("z_n").isNotNull()
                & F.col("n_customers").eqNullSafe(F.col("z_n"))
                & F.col("acctbal_sum").eqNullSafe(F.col("z_sum"))
            ).alias("codecs_agree"),
        )
    )


QUERIES = {
    "source_compressed_roundtrip": q_source_compressed_roundtrip,
    "source_csv_roundtrip": q_source_csv_roundtrip,
    "source_json_roundtrip": q_source_json_roundtrip,
    "source_orc_roundtrip": q_source_orc_roundtrip,
    "source_text_lines_roundtrip": q_source_text_lines_roundtrip,
    "source_schema_evolution": q_source_schema_evolution,
}

ORACLE = {
    "source_compressed_roundtrip": f"""
        SELECT c_nationkey,
               COUNT(*) AS n_customers,
               {oracle_dsum('c_acctbal')} AS acctbal_sum,
               TRUE AS codecs_agree
        FROM customer
        GROUP BY c_nationkey
    """,
    # Rebuild the two-generation view: v1 rows (pre-1997) existed
    # before o_orderpriority did, so the merged reader must surface
    # them with a NULL priority.
    "source_schema_evolution": f"""
        WITH merged AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus,
                   CAST(NULL AS VARCHAR) AS o_orderpriority
            FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
            UNION ALL
            SELECT o_orderkey, o_totalprice, o_orderstatus,
                   o_orderpriority
            FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        )
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               COUNT(o_orderpriority) AS n_with_priority,
               COUNT(DISTINCT o_orderpriority) AS n_priorities,
               {oracle_dsum('o_totalprice')} AS total
        FROM merged
        GROUP BY o_orderstatus
    """,
    "source_text_lines_roundtrip": """
        SELECT COUNT(*) AS n_lines,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_total,
               COUNT(DISTINCT text) AS n_distinct,
               CAST(MIN(LENGTH(text)) AS BIGINT) AS min_len,
               CAST(MAX(LENGTH(text)) AS BIGINT) AS max_len
        FROM documents
        WHERE text IS NOT NULL  -- the line format cannot represent NULL (r9)
    """,
    "source_csv_roundtrip": """
        SELECT n_regionkey,
               COUNT(*) AS n_nations,
               MIN(n_name) AS first_nation
        FROM nation
        GROUP BY n_regionkey
    """,
    "source_json_roundtrip": f"""
        SELECT s_nationkey,
               COUNT(*) AS n_suppliers,
               {oracle_dsum('s_acctbal')} AS acctbal_sum
        FROM supplier
        GROUP BY s_nationkey
    """,
    "source_orc_roundtrip": f"""
        SELECT p_brand,
               COUNT(*) AS n_parts,
               {oracle_dsum('p_retailprice')} AS retail_sum,
               COUNT(DISTINCT p_type) AS n_types
        FROM part
        GROUP BY p_brand
    """,
}
