"""Benchmark decontamination: flag corpus documents that overlap an
evaluation set by word n-grams (the standard pretraining hygiene step
— GPT-3 appendix C / PaLM-style n-gram collision test).

Shape at 100 TB: the benchmark side is tiny (eval suites are
thousands of documents), so its distinct gram set broadcasts; the
corpus side is one linear Arrow-free pass — normalized-text grams via
Catalyst HOFs, a broadcast LEFT SEMI-style hit count, and one
partial-aggregated groupBy(doc_id). No corpus-side self-join, no
shuffle of text payloads (grams travel as 8-byte md5 prefixes).

Engine-side curation operator (no docling analogue — extraction feeds
a pipeline that must not train on its eval set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def _gram_hashes(text: Column, n: int) -> Column:
    """Distinct word n-gram hashes (leading 8 md5 hex digits as long)
    of normalized text; docs shorter than n words contribute their
    whole-text gram so every doc has ≥1 gram."""
    toks = F.split(_norm(text), " ")
    k = F.size(toks)
    grams = F.when(k >= n, F.array_distinct(F.transform(
        F.slice(toks, 1, k - (n - 1)),
        lambda x, i: F.array_join(F.slice(toks, i + 1, n), " ")))
    ).otherwise(F.array(_norm(text)))
    return F.array_distinct(F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
                          .cast("long")))


def decontaminate(docs: DataFrame, benchmark: DataFrame, *, n: int = 5,
                  threshold: float = 0.5) -> DataFrame:
    """(doc_id, text) × benchmark(text) → per-doc contamination report.

    ``contam_e4`` = floor(1e4 × |doc grams ∩ benchmark grams| /
    |doc grams|); ``contaminated`` = 1 when the ratio ≥ threshold.
    Gram identity is the md5-prefix hash (collision odds at 8 hex
    digits are ~2^-32 per pair — fine for a keep/drop gate and exactly
    replayable in the SQL oracle).
    """
    bench_grams = (benchmark
                   .select(F.explode(_gram_hashes(F.col("text"), n))
                           .alias("gram"))
                   .distinct())
    doc_grams = docs.select(
        "doc_id", F.explode(_gram_hashes(F.col("text"), n)).alias("gram"))
    # broadcast left join keeps every doc gram; a matched row carries
    # the benchmark side's hit marker
    hit_marked = doc_grams.join(
        F.broadcast(bench_grams.withColumn("hit", F.lit(1))),
        "gram", "left")
    agg = (hit_marked.groupBy("doc_id")
           .agg(F.count("*").alias("n_grams"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit")))
    contam = F.floor(F.col("n_hit") / F.col("n_grams") * 10000)\
        .cast("long")
    return agg.select(
        "doc_id",
        F.col("n_grams").cast("int").alias("n_grams"),
        F.col("n_hit").cast("int").alias("n_hit"),
        contam.alias("contam_e4"),
        (contam >= int(threshold * 10000)).cast("int")
         .alias("contaminated"))
