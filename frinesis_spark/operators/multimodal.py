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
        # try_element_at: an empty embedding array under default-ANSI
        # Spark throws INVALID_ARRAY_INDEX and kills the whole job,
        # while the oracle's embedding[1] yields NULL (r9 review wave
        # 7 — the one-bad-value job-kill class).
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("emb_first"),
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
        # NULL payloads (a NULL text upstream) yield NULL features —
        # SQL semantics, matching the oracle's MD5(NULL)/LEN(NULL)
        # row; len(None)/bytes(None) previously killed the whole job
        # (review wave 4 find).
        n_bytes = payload.map(lambda b: None if b is None else len(b))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "codec": pdf["codec"],
                "n_bytes": pd.array(n_bytes, dtype="Int64"),
                "content_hash": payload.map(
                    lambda b: None
                    if b is None
                    else hashlib.md5(bytes(b)).hexdigest()
                ),
                # Deterministic fake "decoded dimensions" derived from
                # the payload — stands in for real width/height.
                "width": pd.array(
                    n_bytes.map(
                        lambda n: None if n is None else n % 640 + 1
                    ),
                    dtype="Int32",
                ),
                "height": pd.array(
                    n_bytes.map(
                        lambda n: None if n is None else n % 480 + 1
                    ),
                    dtype="Int32",
                ),
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


_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "thumb_bytes long"
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fake 'thumbnail resize': aspect-preserving fit into 128×128.

    Real deployment: PIL ``Image.thumbnail`` on the decoded payload;
    the integer fit math and the 1-in/1-out batch shape are exactly
    what the real kernel uses.
    """
    import numpy as np

    for pdf in batches:
        w = pdf["width"].to_numpy(np.int64)
        h = pdf["height"].to_numpy(np.int64)
        scale_num = np.int64(128)
        longest = np.maximum(w, h)
        out_w = np.maximum((w * scale_num) // longest, 1)
        out_h = np.maximum((h * scale_num) // longest, 1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "out_width": out_w.astype("int32"),
                "out_height": out_h.astype("int32"),
                # fake thumbnail byte count: 3 bytes/pixel
                "thumb_bytes": out_w * out_h * 3,
            }
        )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension extraction → resize chain: the payload's fake
    dimensions feed an aspect-preserving 128×128 thumbnail fit in a
    map-only ``mapInPandas`` stage (zero shuffle at any corpus size).

    The dims come from a Catalyst projection of the payload length —
    NOT from the full decode stage: routing through
    ``q_multimodal_decode`` md5-hashed every payload just to throw
    the hash away (review wave 4 find; at media scale that is a full
    wasted hash pass). NULL payloads are filtered up front on both
    engines (a thumbnail of nothing is no row, matching the oracle).
    """
    d = table(spark, sf_dir, "documents")
    n_bytes = F.length(F.encode(F.col("text"), "utf-8"))
    dims = d.where(F.col("text").isNotNull()).select(
        "doc_id",
        (n_bytes % 640 + 1).cast("int").alias("width"),
        (n_bytes % 480 + 1).cast("int").alias("height"),
    )
    return dims.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string"
_FRAME_STRIDE = 3
_FRAME_BYTES = 64  # sized so test docs (~300 B) span multiple frames


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Fake 'video frame sampler': one input row fans out to one row
    per sampled frame (every ``_FRAME_STRIDE``-th of
    n_bytes/``_FRAME_BYTES``+1 frames — the constants, not the old
    10/1000 the docstring used to claim) — the row-expanding batch
    shape a real ffmpeg keyframe sampler produces. NULL payloads fan
    out to zero rows (the oracle's UNNEST over a NULL range).
    """
    for pdf in batches:
        ids, idxs, hashes = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                continue
            raw = bytes(payload)
            n_frames = len(raw) // _FRAME_BYTES + 1
            for idx in range(0, n_frames, _FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(idx)
                hashes.append(
                    hashlib.md5(raw + b"#" + str(idx).encode()).hexdigest()
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_hash": pd.Series(hashes, dtype="object"),
            }
        )


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary 'video' → sampled frame rows via row-expanding
    ``mapInPandas``. Scale: map-only fan-out; downstream per-frame
    feature stages parallelize over the expanded rows."""
    d = table(spark, sf_dir, "documents")
    packed = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return packed.mapInPandas(_frame_sample_batches, schema=_FRAME_SCHEMA)


QUERIES = {
    "multimodal_join": q_multimodal_join,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frame_sample": q_multimodal_frame_sample,
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
    "multimodal_resize": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS BIGINT) AS w,
                   CAST(OCTET_LENGTH(ENCODE(text)) % 480 + 1 AS BIGINT) AS h
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(GREATEST((w * 128) // GREATEST(w, h), 1) AS INT)
                   AS out_width,
               CAST(GREATEST((h * 128) // GREATEST(w, h), 1) AS INT)
                   AS out_height,
               CAST(GREATEST((w * 128) // GREATEST(w, h), 1)
                    * GREATEST((h * 128) // GREATEST(w, h), 1) * 3
                    AS BIGINT) AS thumb_bytes
        FROM dims
    """,
    "multimodal_frame_sample": f"""
        SELECT doc_id,
               CAST(f.idx AS INT) AS frame_idx,
               MD5(text || '#' || CAST(f.idx AS VARCHAR)) AS frame_hash
        FROM documents,
             UNNEST(GENERATE_SERIES(
                 0, OCTET_LENGTH(ENCODE(text)) // {_FRAME_BYTES},
                 {_FRAME_STRIDE}))
                 AS f(idx)
    """,
}
