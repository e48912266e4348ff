"""Similarity search over embedding columns (array<float>).

* :func:`knn_bruteforce` — exact top-k cosine: broadcast the (small)
  query set against the corpus; the dot product is a JVM-side
  ``aggregate``/``zip_with`` fold (no UDF), ranking via a window.
  At 100 TB this is the *per-query-batch* baseline: the corpus scan is
  embarrassingly parallel and never shuffles — only the tiny
  (query × k) result does.
* :func:`lsh_buckets` / :func:`knn_lsh` — random-hyperplane LSH scale
  path: 8 deterministic pseudo-hyperplanes (signs derived from
  md5(plane,dim), portable to the SQL oracle) bucket the corpus once;
  candidate generation is a bucket equijoin instead of a full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def knn_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                   ) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    embeddings: (vec_id, embedding); queries: (vec_id, embedding) —
    small, gets broadcast. Self-matches excluded.
    """
    corpus = _as_double(embeddings).select(
        F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("nbr_emb"))
    q = _as_double(queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    scored = (corpus.join(F.broadcast(q),
                          F.col("nbr_id") != F.col("query_id"))
              .select("query_id", "nbr_id",
                      cosine(F.col("q_emb"), F.col("nbr_emb"))
                      .alias("score")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("nbr_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "nbr_id", "rank",
                    F.floor(F.col("score") * 10000).cast("long")
                    .alias("score_e4")))


N_PLANES = 8


def _plane_sign(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-hyperplane component sign in {-1, +1}:
    derived from md5(plane,dim) — portable to the SQL oracle."""
    hexv = F.substring(
        F.md5(F.concat(plane.cast("string"), F.lit(","),
                       dim.cast("string"))), 1, 4)
    return F.when(F.conv(hexv, 16, 10).cast("long") >= 32768,
                  F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, embedding) → (vec_id, bucket): sign pattern of the dot
    product with each pseudo-hyperplane, packed into an int."""
    e = _as_double(embeddings)
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    # 2^p via pow (exact in double for p<53); shiftleft can't take a
    # lambda-variable in PySpark's API
    bits = F.transform(
        planes,
        lambda p: F.when(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(0), F.size("embedding") - 1),
                    lambda d: F.element_at(F.col("embedding"), d + 1)
                    * _plane_sign(p, d)),
                F.lit(0.0), lambda acc, v: acc + v) >= 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0).cast("long")))
    return e.select(
        "vec_id",
        F.aggregate(bits, F.lit(0).cast("long"),
                    lambda acc, v: acc + v).alias("bucket"),
        "embedding")


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
                      cosine(F.col("q_emb"), F.col("nbr_emb"))
                      .alias("score")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("nbr_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "nbr_id", "rank",
                    F.floor(F.col("score") * 10000).cast("long")
                    .alias("score_e4")))
