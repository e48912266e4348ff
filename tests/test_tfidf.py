"""Hashed tf-idf vectors (operators/vectorize.py:tfidf_hash_vectors)."""

import hashlib
import math


def _bucket_sign(token, dim=64):
    h = hashlib.md5(token.encode()).hexdigest()
    return int(h[:8], 16) % dim, 1 if int(h[8], 16) >= 8 else -1


def test_matches_closed_form(spark):
    from docling_spark.operators.vectorize import tfidf_hash_vectors
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["dim"]): r["w_e6"]
           for r in tfidf_hash_vectors(docs, dim=64).collect()}
    n = 2
    dfs = {"apple": 2, "banana": 1, "cherry": 1}
    tfs = {1: {"apple": 2, "banana": 1}, 2: {"apple": 1, "cherry": 1}}
    exp = {}
    for d, toks in tfs.items():
        for t, tf in toks.items():
            idf = math.floor(
                (math.log((1 + n) / (1 + dfs[t])) + 1.0) * 1e6)
            b, s = _bucket_sign(t)
            exp[(d, b)] = exp.get((d, b), 0) + tf * s * idf
    exp = {k: v for k, v in exp.items() if v != 0}
    assert out == exp


def test_partitioning_invariant(spark):
    from docling_spark.operators.vectorize import tfidf_hash_vectors
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    key = lambda r: (r["doc_id"], r["dim"])  # noqa: E731
    a = sorted(tfidf_hash_vectors(docs.repartition(1)).collect(),
               key=key)
    b = sorted(tfidf_hash_vectors(docs.repartition(16)).collect(),
               key=key)
    assert a == b
