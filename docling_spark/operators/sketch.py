"""Distinct-count sketching: KMV (k-minimum values, Bar-Yossef et al.
2002) — the order-statistics sketch behind theta sketches.

Why KMV here instead of HyperLogLog: Spark's HLL
(``approx_count_distinct``) is available as a knob elsewhere
(source_reputation), but its register layout is engine-internal — no
cross-engine oracle can replay it. KMV with a fixed md5 hash is fully
deterministic: the estimate is a pure function of the k smallest
hashes, so DuckDB reproduces it bit-for-bit, and sketches from
disjoint partitions merge by "union then keep k smallest" (the same
property HLL merges rely on).

Estimator: with values hashed uniformly into [0, 1), the k-th smallest
hash u_k estimates distinct ≈ (k-1)/u_k; groups with fewer than k
distinct values report the exact count (the standard small-set
fallback).

Plan shape: one distinct shuffle on (group, value-hash), then the
salted two-phase bottom-k (retrieval.distributed_topk ascending) and a
per-group fold — no window ever sees one group's whole hash stream in
a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import distributed_topk

KMV_K = 32
_HASH_DENOM = float(1 << 48)


def _unit_hash(col) -> F.Column:
    """md5-prefix hash mapped into [0, 1): the first 12 hex digits as
    a 48-bit integer over 2^48 — exact in doubles, replayed by the
    oracle as ('0x' || substr(md5(v), 1, 12))::BIGINT / 2^48."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 12),
                   16, 10).cast("double") / F.lit(_HASH_DENOM))


def kmv_distinct(df: DataFrame, *, group_col: str, value_col: str,
                 k: int = KMV_K) -> DataFrame:
    """(group, est_distinct_e4, n_exact_small): KMV distinct-count
    estimate of ``value_col`` per ``group_col``.

    ``est_distinct_e4`` = floor(estimate × 1e4); for groups holding
    fewer than ``k`` distinct values the estimate IS the exact count.
    ``n_exact_small`` flags that fallback (1 = exact path)."""
    hashed = (df.select(F.col(group_col).alias("grp"),
                        _unit_hash(F.col(value_col)).alias("u"))
              .distinct())
    kmin = distributed_topk(hashed, key="grp", order="u", tie="u",
                            k=k, ascending=True)
    agg = kmin.groupBy("grp").agg(
        F.count("*").alias("n_min"),
        F.max("u").alias("u_k"))
    small = F.col("n_min") < k
    est = F.when(small, F.col("n_min").cast("double")) \
           .otherwise((k - 1) / F.col("u_k"))
    return agg.select(
        F.col("grp").alias(group_col),
        F.floor(est * 10000).cast("long").alias("est_distinct_e4"),
        small.cast("int").alias("n_exact_small"))
