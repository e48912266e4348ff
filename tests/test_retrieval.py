"""BM25 retrieval: hand-computed scores on a tiny corpus, ranking
semantics, and the salted two-phase top-k plan shape."""

import math

from pyspark.sql import functions as F

from docling_spark.operators.retrieval import bm25_topk, distributed_topk


def _bm25(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"),     # tf(apple)=2, dl=3
         (2, "apple cherry"),           # tf(apple)=1, dl=2
         (3, "cherry cherry durian")],  # no apple,     dl=3
        "doc_id long, text string")
    queries = spark.createDataFrame([(0, "apple")],
                                    "query_id long, qtext string")
    got = {r["doc_id"]: r for r in bm25_topk(docs, queries, k=5).collect()}
    assert set(got) == {1, 2}  # doc 3 has no query term
    avgdl = (3 + 2 + 3) / 3
    want1 = _bm25(2, 2, 3, 3, avgdl)
    want2 = _bm25(1, 2, 3, 2, avgdl)
    assert got[1]["score_e4"] == math.floor(want1 * 10000)
    assert got[2]["score_e4"] == math.floor(want2 * 10000)
    assert got[1]["rank"] == 1 and got[2]["rank"] == 2  # tf wins


def test_bm25_multi_term_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "z z")],
        "doc_id long, text string")
    queries = spark.createDataFrame([(7, "x y")],
                                    "query_id long, qtext string")
    rows = bm25_topk(docs, queries, k=2).collect()
    # identical scores: tie breaks toward the smaller doc_id
    assert [(r["doc_id"], r["rank"]) for r in
            sorted(rows, key=lambda r: r["rank"])] == [(1, 1), (2, 2)]


def test_distributed_topk_matches_global(spark):
    rows = [(qid, i, float((i * 37) % 101))
            for qid in (0, 1) for i in range(200)]
    df = spark.createDataFrame(rows, "query_id long, doc_id long, "
                                     "score double")
    got = distributed_topk(df, key="query_id", order="score",
                           tie="doc_id", k=7).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    want = sorted(((i * 37) % 101, i) for i in range(200))
    want = [(rk + 1, doc, float(sc)) for rk, (sc, doc) in
            enumerate(sorted(((sc, doc) for sc, doc in
                              [((i * 37) % 101, i) for i in range(200)]),
                             key=lambda t: (-t[0], t[1]))[:7])]
    for qid in (0, 1):
        assert sorted(by_q[qid]) == want


def test_bm25_plan_is_salted_two_phase(spark):
    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"))
    queries = spark.createDataFrame([(0, "fast table")],
                                    "query_id long, qtext string")
    out = bm25_topk(docs, queries, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two window phases: (query, _salt) partial then (query) final —
    # never one window over the full scored set per query. Spark 4
    # additionally rewrites each row_number filter into
    # Partial/Final WindowGroupLimit (map-side top-k before the
    # exchange), which we pin here too.
    assert "_salt" in plan
    assert plan.count("WindowGroupLimit") >= 2
    assert "Partial" in plan
