"""Similarity search over embedding columns (array<float>).

* :func:`knn_bruteforce` — exact top-k cosine: broadcast the (small)
  query set against the corpus; scoring is a vectorized Arrow-batched
  pandas UDF (NumPy row-wise dot products — per north rule, all per-row
  math crosses into Python only as Arrow batches, never per-row).
  At 100 TB this is the *per-query-batch* baseline: the corpus scan is
  embarrassingly parallel and never shuffles — only the tiny
  (query × k) result does.
* :func:`lsh_buckets` / :func:`knn_lsh` — random-hyperplane LSH scale
  path: deterministic pseudo-hyperplanes (signs derived from
  md5(plane,dim) — the SAME formula the DuckDB oracle evaluates, but
  computed ONCE driver-side with hashlib instead of per row × dim ×
  plane in interpreted JVM expressions, which measured ~50× slower)
  bucket the corpus once; candidate generation is a bucket equijoin
  instead of a full cross product.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Pure-Catalyst cosine (higher-order folds). Correct but evaluates
    interpreted — use :func:`cosine_udf` on hot paths."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _make_cosine_udf():
    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.stack(a.to_numpy()).astype(np.float64)
        bv = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", av, bv)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, num / den, 0.0)
        return pd.Series(out)

    return cos


def cosine_udf(a: Column, b: Column) -> Column:
    """Arrow-batched row-wise cosine: one NumPy pass per batch.
    (pandas_udf is built lazily — decorating at import time would
    require an active SparkSession.)"""
    return _make_cosine_udf()(a, b)


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("nbr_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "nbr_id", "rank",
                    F.floor(F.col("score") * 10000).cast("long")
                    .alias("score_e4")))


def knn_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                   ) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    embeddings: (vec_id, embedding); queries: (vec_id, embedding) —
    small, gets broadcast. Self-matches excluded."""
    corpus = _as_double(embeddings).select(
        F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("nbr_emb"))
    q = _as_double(queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    scored = (corpus.join(F.broadcast(q),
                          F.col("nbr_id") != F.col("query_id"))
              .select("query_id", "nbr_id",
                      cosine_udf(F.col("q_emb"), F.col("nbr_emb"))
                      .alias("score")))
    return _topk(scored, k)


N_PLANES = 8


def plane_sign_matrix(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-hyperplane signs in {-1,+1}: component (p,d)
    is +1 iff int(md5(f"{p},{d}")[:4], 16) >= 32768 — the exact formula
    the SQL oracle replays. Tiny (n_planes × dim), built once."""
    signs = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.md5(f"{p},{d}".encode("ascii")).hexdigest()[:4]
            signs[p, d] = 1.0 if int(h, 16) >= 32768 else -1.0
    return signs


def _bucket_batches(n_planes: int):
    """mapInPandas-style bucket assignment: bucket = Σ 2^p over planes
    whose signed projection is ≥ 0. One matmul per Arrow batch."""
    sign_cache: dict = {}

    @pandas_udf("long")
    def bucket_udf(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        ev = np.stack(emb.to_numpy()).astype(np.float64)
        dim = ev.shape[1]
        if dim not in sign_cache:
            sign_cache[dim] = plane_sign_matrix(n_planes, dim)
        proj = ev @ sign_cache[dim].T  # (rows, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(((proj >= 0) @ weights).astype(np.int64))

    return bucket_udf


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, embedding) → (vec_id, bucket, embedding): sign pattern
    of the dot product with each pseudo-hyperplane, packed into a long."""
    e = _as_double(embeddings)
    bucket_udf = _bucket_batches(n_planes)
    return e.select("vec_id", bucket_udf(F.col("embedding")).alias("bucket"),
                    "embedding")


N_CELLS = 16
N_PROBE = 4


def ivf_assign(embeddings: DataFrame, n_cells: int = N_CELLS) -> DataFrame:
    """IVF coarse quantization: (vec_id, cell, embedding).

    The coarse quantizer is the first ``n_cells`` corpus vectors
    (vec_id < n_cells) — a deterministic sampled quantizer (the
    zero-training-budget initialization FAISS also accepts) so the SQL
    oracle can replay it. Every vector joins the cell of its
    max-cosine centroid. At 10^12 rows this is one broadcast join +
    a per-row argmax; the index build never shuffles the corpus."""
    e = _as_double(embeddings)
    centroids = (e.filter(F.col("vec_id") < n_cells)
                 .select(F.col("vec_id").alias("cell"),
                         F.col("embedding").alias("c_emb")))
    scored = (e.join(F.broadcast(centroids))
              .select("vec_id", "cell", "embedding",
                      cosine_udf(F.col("embedding"), F.col("c_emb"))
                      .alias("c_score")))
    w = (Window.partitionBy("vec_id")
         .orderBy(F.col("c_score").desc(), F.col("cell").asc()))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cell", "embedding"))


def knn_ivf(embeddings: DataFrame, queries: DataFrame, k: int = 5,
            n_cells: int = N_CELLS, n_probe: int = N_PROBE) -> DataFrame:
    """Approximate top-k via inverted-file probing: each query scores
    only the corpus vectors whose cell is among its ``n_probe``
    nearest centroids. Candidate generation is a cell equijoin —
    the scale path when bucket collisions (LSH) are too coarse."""
    e = _as_double(embeddings)
    index = ivf_assign(embeddings, n_cells)
    centroids = (e.filter(F.col("vec_id") < n_cells)
                 .select(F.col("vec_id").alias("cell"),
                         F.col("embedding").alias("c_emb")))
    q = _as_double(queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    probe_w = (Window.partitionBy("query_id")
               .orderBy(F.col("c_score").desc(), F.col("cell").asc()))
    probes = (q.join(F.broadcast(centroids))
              .select("query_id", "q_emb", "cell",
                      cosine_udf(F.col("q_emb"), F.col("c_emb"))
                      .alias("c_score"))
              .withColumn("rn", F.row_number().over(probe_w))
              .filter(F.col("rn") <= n_probe)
              .select("query_id", "q_emb", "cell"))
    scored = (index.join(F.broadcast(probes), "cell")
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("nbr_id"),
                      cosine_udf(F.col("q_emb"), F.col("embedding"))
                      .alias("score"))
              .dropDuplicates(["query_id", "nbr_id"]))
    return _topk(scored, k)


def knn_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 5,
            n_planes: int = N_PLANES) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket
    are scored (the IVF-style scale path: bucket equijoin, no full
    cross product)."""
    corpus = lsh_buckets(embeddings, n_planes).select(
        F.col("vec_id").alias("nbr_id"), "bucket",
        F.col("embedding").alias("nbr_emb"))
    q = lsh_buckets(queries, n_planes).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("q_bucket"),
        F.col("embedding").alias("q_emb"))
    scored = (corpus.join(F.broadcast(q),
                          (F.col("bucket") == F.col("q_bucket"))
                          & (F.col("nbr_id") != F.col("query_id")))
              .select("query_id", "nbr_id",
                      cosine_udf(F.col("q_emb"), F.col("nbr_emb"))
                      .alias("score")))
    return _topk(scored, k)
