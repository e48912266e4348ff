"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the part that matters at 100 TB):

* exact dedup — one shuffle on a 32-byte fingerprint; the window picks
  the canonical doc per group (min doc_id). At skew (one viral page
  duplicated 10^6×) AQE skew-join handles the fat group because the
  window partitions by fingerprint, not doc.
* MinHash+LSH — shingle → k minhashes → b bands; candidate pairs come
  ONLY from band-bucket equijoins (never an all-pairs product), then
  the exact Jaccard verify runs on candidates alone. Band buckets are
  md5 strings → uniform shuffle keys.
* All hashing is md5 (lexicographic min over hex strings), which is
  portable to ANSI SQL — the DuckDB oracle runs the identical formula.

No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import norm_text, tokens_col


def dedup_exact(docs: DataFrame) -> DataFrame:
    """(doc_id, text, …) → (doc_id, canonical_id, is_dup)."""
    fp = docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return (fp
            .withColumn("canonical_id", F.min("doc_id").over(w))
            .withColumn("is_dup",
                        (F.col("doc_id") != F.col("canonical_id"))
                        .cast("int"))
            .select("doc_id", "fingerprint", "canonical_id", "is_dup"))


def shingles_col(n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text. Documents shorter
    than n tokens contribute their whole normalized text as the single
    shingle (so tiny docs still dedup)."""
    toks = tokens_col()
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(F.sequence(F.lit(1), k),
                    lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array(norm_text()))


def minhash_signature(n: int = 3, num_hashes: int = 16) -> Column:
    """k portable minhashes: for salt s, min over shingles of
    md5(shingle || ':' || s) (lexicographic on hex)."""
    sh = F.array_distinct(shingles_col(n))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(sh, lambda x: F.md5(F.concat(x, F.lit(":"),
                                                     s.cast("string"))))))


def minhash_bands(sig_col: str, bands: int, rows_per_band: int) -> Column:
    """Band digests: md5 of '|'-joined signature slice per band."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(F.array_join(
            F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band),
            "|")))


def lsh_candidate_pairs(docs: DataFrame, *, n: int = 3, num_hashes: int = 16,
                        bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) from LSH band buckets."""
    rows_per_band = num_hashes // bands
    sigs = docs.select(
        "doc_id", minhash_signature(n, num_hashes).alias("sig"))
    banded = sigs.select(
        "doc_id",
        F.posexplode(minhash_bands("sig", bands, rows_per_band))
         .alias("band_id", "band_hash"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band_id") == F.col("r.band_id"))
                      & (F.col("l.band_hash") == F.col("r.band_hash"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, *, n: int = 3) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets, computed only for
    the given candidate pairs: explode shingles → equijoin on shingle
    within pairs → |A∩B| / (|A| + |B| − |A∩B|)."""
    sh = docs.select("doc_id",
                     F.explode(F.array_distinct(shingles_col(n)))
                      .alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (pairs.alias("p")
             .join(a, F.col("p.doc_a") == F.col("a.doc_id"))
             .join(b, (F.col("p.doc_b") == F.col("b.doc_id"))
                   & (F.col("a.shingle") == F.col("b.shingle")))
             .groupBy("p.doc_a", "p.doc_b")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                "doc_a", "doc_b",
                (F.col("n_inter")
                 / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")))
                .alias("jaccard")))


def minhash_dedup(docs: DataFrame, *, n: int = 3, num_hashes: int = 16,
                  bands: int = 4, threshold: float = 0.7) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify →
    pairs over threshold."""
    pairs = lsh_candidate_pairs(docs, n=n, num_hashes=num_hashes,
                                bands=bands)
    scored = ngram_jaccard(docs, pairs, n=n)
    return (scored.filter(F.col("jaccard") >= threshold)
            .orderBy("doc_a", "doc_b"))


def simhash16(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """16-bit SimHash over word n-gram shingles with portable md5 bits:
    bit i of md5's first 4 hex digits votes +1/−1; the sign of the
    vote-sum forms the document hash."""
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_col(n))).alias("shingle"))
    val = F.conv(F.substring(F.md5("shingle"), 1, 4), 16, 10).cast("long")
    bits = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit"),
        val.alias("val"))
    votes = bits.select(
        "doc_id", "bit",
        (F.when(F.expr("shiftright(val, bit)").bitwiseAND(1) == 1,
                1).otherwise(-1)).alias("vote"))
    agg = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return (agg.groupBy("doc_id")
            .agg(F.sum(
                F.expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit)"
                       " ELSE CAST(0 AS BIGINT) END")).alias("simhash"))
            .select("doc_id", "simhash"))
