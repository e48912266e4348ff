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


def decontaminate_semantic(embeddings: DataFrame, eval_vecs: DataFrame,
                           *, threshold_e4: int = 4000) -> DataFrame:
    """Embedding-level decontamination: flag corpus vectors whose max
    cosine similarity against an evaluation set reaches the threshold
    — the semantic complement of the n-gram collision test above
    (paraphrased eval leakage that shares no 5-gram still lands near
    the eval point in embedding space; cf. SemDeDup, Abbas et al.
    2023, applied cross-split).

    embeddings: (vec_id, embedding) corpus side; eval_vecs: small by
    contract (eval suites are thousands of rows) — collected into the
    scan closure like ``similarity.knn_bruteforce``'s query side.

    Scale shape: ONE ``mapInPandas`` pass over the corpus — each Arrow
    batch is one (batch × n_eval) matmul and a row-max; no join, no
    shuffle. Scores quantized floor(×1e4) like the kNN family so the
    keep/drop decision is engine-exact against the SQL oracle.

    Output: (vec_id, max_eval_sim_e4, contaminated).
    """
    import numpy as np
    import pandas as pd

    from .similarity import _as_double, _collect_matrix, _normalize

    eval_ids, eval_mat = _collect_matrix(eval_vecs)
    en = _normalize(eval_mat)
    eval_id_set = set(eval_ids)
    id_type = embeddings.schema["vec_id"].dataType.simpleString()
    out_ddl = f"vec_id {id_type}, max_eval_sim_e4 long, contaminated int"

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best = (_normalize(emb) @ en.T).max(axis=1)
            q = np.floor(best * 10000).astype(np.int64)
            yield pd.DataFrame({
                "vec_id": ids,
                "max_eval_sim_e4": q,
                "contaminated": (q >= threshold_e4).astype(np.int32)})

    corpus = _as_double(embeddings).select("vec_id", "embedding")
    # the eval rows themselves are not "contaminated corpus" — drop
    # them Catalyst-side so the filter rides the parquet scan
    if eval_id_set:
        corpus = corpus.filter(~F.col("vec_id").isin(list(eval_id_set)))
    return corpus.mapInPandas(score_batches, schema=out_ddl)
