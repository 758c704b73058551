"""Similarity search over embedding columns (SURVEY.md §2B
``similarity_topk_cosine`` + the ANN scale path).

Two operators:

- ``similarity_topk_cosine`` — exact brute-force top-k: broadcast the
  (small) query set against the full corpus, cosine via Catalyst
  ``zip_with``/``aggregate`` (JVM, codegen), ranking window per query.
  Linear in corpus size — the right plan when queries ≪ corpus, which
  is the common retrieval-evaluation shape. Oracle-checked.

- ``similarity_ann_lsh`` — random-hyperplane LSH: bucket the corpus by
  sign-bit bands, join queries to bucket-colliding candidates only,
  re-rank exactly. Sub-linear candidate volume; recall < 1 by design
  → rows-only check.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from frinesis_spark.catalog import table
from frinesis_spark.functions.vectors import cosine_similarity

_N_QUERIES = 10  # vec_id < 10 form the query set
_TOP_K = 5
_DIM = 64
# Band geometry sets the recall/candidate-volume trade. For
# random-hyperplane LSH, P(bit match) = 1 - θ/π ≈ 0.67 at θ=60°
# (typical near-neighbor angle here), so per-band collision is
# 0.67^bits and recall is 1-(1-0.67^bits)^bands: 8-bit bands gave
# ~0.08 recall (measured 0.04 — near-useless); 4-bit × 8 bands gives
# ~0.83 predicted (recall floor enforced in tests/test_ann.py).
# Candidate volume rises to ~corpus/2 per query — that is the LSH
# trade; tighten bits only with dimensionality/corpus growth.
_PLANES_PER_BAND = 4
_N_BANDS = 8  # 8 bands × 4 hyperplanes = 32 sign bits total


def _hyperplane(plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1]^dim.

    md5-derived so the LSH buckets are identical on every run and
    every engine — no RNG state anywhere.
    """
    out = []
    for d in range(_DIM):
        h = int(hashlib.md5(f"plane{plane}:dim{d}".encode()).hexdigest()[:8], 16)
        out.append(h / float(0xFFFFFFFF) * 2.0 - 1.0)
    return out


def _queries_and_candidates(spark: SparkSession, sf_dir: str):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    # The test corpus is one parquet file → one input split; spread the
    # per-pair cosine work across all cores (no-op at real scale where
    # the scan has many splits).
    c = (
        e.repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    )
    return q, c


def q_similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each of the 10 query vectors.

    Plan shape at 100 TB: broadcast(queries) ⋈ corpus scan → per-query
    top-k via ranking window partitioned on query_id. One pass over
    the corpus, no shuffle of the big side beyond the k-row-per-query
    window input (Spark pushes rank-filter into the window sort).
    """
    q, c = _queries_and_candidates(spark, sf_dir)
    cos = cosine_similarity(F.col("qe"), F.col("ce"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def _plane_matrix():
    """All hyperplanes as a (dim, n_planes) float64 matrix."""
    import numpy as np

    planes = _N_BANDS * _PLANES_PER_BAND
    return np.array(
        [_hyperplane(p) for p in range(planes)], dtype=np.float64
    ).T


def _bucketize(df: DataFrame, id_col: str, emb_col: str) -> DataFrame:
    """(id, emb, band_idx, bucket) rows: sign bits of md5-fixed
    hyperplanes.

    One numpy matmul per Arrow batch computes every plane projection at
    once (rows × dim @ dim × planes); the 16 interpreted per-row
    ``aggregate`` dot products this replaces were the dominant cost.
    Map-only — bucketing adds no shuffle at any scale.
    """
    planes = _plane_matrix()

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            emb = np.vstack(pdf[emb_col].to_numpy()).astype(np.float64)
            bits = (emb @ planes) > 0  # rows × planes
            out = []
            weights = 1 << np.arange(_PLANES_PER_BAND)
            for band in range(_N_BANDS):
                cols = bits[:, band * _PLANES_PER_BAND : (band + 1) * _PLANES_PER_BAND]
                buckets = (cols * weights).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col].to_numpy(),
                            emb_col: pdf[emb_col],
                            "band_idx": band,
                            "bucket": buckets.astype(np.int32),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    schema = (
        f"{id_col} long, {emb_col} array<float>, band_idx int, bucket int"
    )
    return df.mapInPandas(gen, schema)


def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH + exact re-rank.

    Candidates = corpus rows sharing ≥1 of 2 sign-bit bands with the
    query. At 100 TB the corpus-side bucketing is a map-only pass and
    the join shuffles on (band_idx, bucket) — candidate volume is
    ~corpus/2^8 per band per query instead of the full corpus.
    Recall < 1 (that's the trade) → rows-only check.
    """
    q, c = _queries_and_candidates(spark, sf_dir)
    qb = _bucketize(q, "query_id", "qe")
    cb = _bucketize(c, "neighbor_id", "ce")
    cand = (
        qb.join(cb, ["band_idx", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qe", "neighbor_id", "ce")
        .distinct()
    )
    cos = cosine_similarity(F.col("qe"), F.col("ce"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


_IVF_LISTS = 16  # inverted lists (cells)
_IVF_PROBE = 4  # cells probed per query
_IVF_ITERS = 3  # Lloyd refinement rounds


def _ivf_centroids(corpus: DataFrame, emb_col: str):
    """Train IVF cell centroids: deterministic seeding + a fixed
    number of distributed Lloyd rounds.

    Seeds are the ``_IVF_LISTS`` lowest vec_ids (deterministic, no
    RNG). Each round is one map-only pass: every partition assigns its
    rows to the nearest centroid with a single numpy matmul and emits
    per-cell partial (sum, count); the driver reduces the
    ``partitions × cells`` partials — KB-sized regardless of corpus
    size, the classic mergeable-state k-means. Centroid count and
    round count are fixed, so cost is bounded and the result is
    reproducible.
    """
    import numpy as np

    seeds = (
        corpus.orderBy("vec_id")
        .limit(_IVF_LISTS)
        .select(emb_col)
        .toPandas()[emb_col]
    )
    cents = np.vstack(seeds.to_numpy()).astype(np.float64)

    for _ in range(_IVF_ITERS):
        c = cents  # capture current round's centroids

        def partials(batches, c=c):
            import numpy as np
            import pandas as pd

            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            for pdf in batches:
                emb = np.vstack(pdf[emb_col].to_numpy()).astype(np.float64)
                cell = np.argmax(emb @ c.T, axis=1)  # cosine ≙ dot on unit cells
                np.add.at(sums, cell, emb)
                np.add.at(counts, cell, 1)
            yield pd.DataFrame(
                {
                    "cell": np.arange(len(c)),
                    "vsum": list(sums),
                    "n": counts,
                }
            )

        agg = corpus.mapInPandas(
            partials, f"cell int, vsum array<double>, n long"
        ).toPandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for _, row in agg.iterrows():
            sums[row["cell"]] += np.asarray(row["vsum"])
            counts[row["cell"]] += row["n"]
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        # L2-normalize so dot == cosine ranking for assignment
        cents /= np.maximum(np.linalg.norm(cents, axis=1)[:, None], 1e-12)
    return cents


def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via an IVF (inverted-file) index: k-means
    cells + probe-N search, exact re-rank inside probed cells.

    The scale path complementary to LSH: train ``_IVF_LISTS`` cell
    centroids (distributed Lloyd, mergeable partials), assign each
    corpus vector to its nearest cell (map-only), then for each query
    probe the ``_IVF_PROBE`` nearest cells and compute exact cosine
    only against those cells' members — candidate volume ≈
    probe/lists of the corpus. The cell assignment shuffles nothing;
    the probe join shuffles on cell id. Recall < 1 by design →
    rows-only check (re-rank exactness is covered by
    ``similarity_topk_cosine``).
    """
    q, c = _queries_and_candidates(spark, sf_dir)
    # The corpus feeds every Lloyd round plus the final assignment —
    # materialize once instead of re-scanning per pass (at real scale:
    # a persisted staging table).
    c = c.localCheckpoint(eager=True)
    cents = _ivf_centroids(
        c.select(F.col("neighbor_id").alias("vec_id"), F.col("ce")), "ce"
    )

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            emb = np.vstack(pdf["ce"].to_numpy()).astype(np.float64)
            emb_n = emb / np.maximum(
                np.linalg.norm(emb, axis=1)[:, None], 1e-12
            )
            cell = np.argmax(emb_n @ cents.T, axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "ce": pdf["ce"],
                    "cell": cell.astype(np.int32),
                }
            )

    cells = c.mapInPandas(assign, "neighbor_id long, ce array<float>, cell int")

    def probe(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            emb = np.vstack(pdf["qe"].to_numpy()).astype(np.float64)
            emb_n = emb / np.maximum(
                np.linalg.norm(emb, axis=1)[:, None], 1e-12
            )
            order = np.argsort(-(emb_n @ cents.T), axis=1)[:, :_IVF_PROBE]
            out = pdf.loc[pdf.index.repeat(_IVF_PROBE)].reset_index(drop=True)
            out["cell"] = order.ravel().astype(np.int32)
            yield out[["query_id", "qe", "cell"]]

    probed = q.mapInPandas(probe, "query_id long, qe array<float>, cell int")

    cos = cosine_similarity(F.col("qe"), F.col("ce"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        probed.join(cells, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


QUERIES = {
    "similarity_topk_cosine": q_similarity_topk_cosine,
    "similarity_ann_lsh": q_similarity_ann_lsh,
    "similarity_ann_ivf": q_similarity_ann_ivf,
}

_COS_SQL = """
    LIST_DOT_PRODUCT(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
    / (SQRT(LIST_DOT_PRODUCT(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
       * SQRT(LIST_DOT_PRODUCT(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
"""

ORACLE = {
    "similarity_topk_cosine": f"""
        SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
               ROUND(cos, 6) AS cos_sim
        FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS_SQL} AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_COS_SQL} DESC, c.vec_id
                   ) AS rank
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        )
        WHERE rank <= {_TOP_K}
    """,
    # similarity_ann_lsh: intentionally no oracle — approximate recall
    # by design; exactness of the re-rank formula is covered by
    # similarity_topk_cosine.
}
