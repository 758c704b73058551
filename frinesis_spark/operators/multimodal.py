"""Multimodal-column operators (SURVEY.md §2B ``multimodal_join`` +
the BASELINE.json mandate for image/audio/video handling).

The data model: media is an opaque ``binary`` payload column plus
typed metadata columns traveling in the same row. Decode / feature
extraction runs as an Arrow-batched ``mapInPandas`` stage — the one
place Python belongs, because codec libraries are Python/C. The
Spark-side plumbing (schema, batching, partition parallelism) is real
and tested; the codec itself is stubbed (image/audio libs are not in
this container) behind a ``codec`` dispatch that raises
``NotImplementedError`` for real formats and computes deterministic
features for the ``"fake"`` codec, so the whole pipeline is
oracle-checkable end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frinesis_spark.catalog import table

_DECODE_SCHEMA = (
    "doc_id long, codec string, n_bytes long, content_hash string, "
    "width int, height int"
)


def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality row assembly: text metadata ⋈ vector column.

    documents ⋈ embeddings on doc_id=vec_id; projects scalar, string
    and array-derived columns in one row. Scale: plain equi join —
    co-partition both modalities on the id key at write time (bucketing)
    and this becomes a zero-shuffle zip of the modalities.
    """
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "label",
        F.size("embedding").cast("long").alias("emb_dim"),
        F.element_at("embedding", 1).cast("double").alias("emb_first"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The media 'decoder': one Arrow batch in, one feature frame out.

    Real deployment: replace the ``fake`` branch with PIL/ffmpeg calls;
    the batch shape, schema and partition parallelism stay identical.
    """
    for pdf in batches:
        codecs = pdf["codec"].unique()
        unsupported = [c for c in codecs if c != "fake"]
        if unsupported:
            raise NotImplementedError(
                f"codec(s) {unsupported} need image/audio libraries not "
                "present in this environment; only the deterministic "
                "'fake' codec is implemented"
            )
        payload = pdf["payload"]
        n_bytes = payload.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "codec": pdf["codec"],
                "n_bytes": n_bytes,
                "content_hash": payload.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                # Deterministic fake "decoded dimensions" derived from
                # the payload — stands in for real width/height.
                "width": (n_bytes % 640 + 1).astype("int32"),
                "height": (n_bytes % 480 + 1).astype("int32"),
            }
        )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode pipeline: pack text into a binary column
    (standing in for image bytes), then feature-extract via
    ``mapInPandas``.

    Scale: decode is map-only — no shuffle, Arrow-batched, one Python
    worker per core; 100 TB of media decodes at aggregate-core
    throughput. The oracle reproduces the fake codec in SQL
    (octet_length / md5), proving the plumbing end to end.
    """
    d = table(spark, sf_dir, "documents")
    packed = d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("fake").alias("codec"),
    )
    return packed.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


QUERIES = {
    "multimodal_join": q_multimodal_join,
    "multimodal_decode": q_multimodal_decode,
}

ORACLE = {
    "multimodal_join": """
        SELECT doc_id, lang, label,
               CAST(LEN(embedding) AS BIGINT) AS emb_dim,
               CAST(embedding[1] AS DOUBLE) AS emb_first,
               CAST(n_chars AS BIGINT) AS n_chars
        FROM documents JOIN embeddings ON doc_id = vec_id
    """,
    "multimodal_decode": """
        SELECT doc_id,
               'fake' AS codec,
               CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
               MD5(text) AS content_hash,
               CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INT) AS width,
               CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS INT) AS height
        FROM documents
    """,
}
