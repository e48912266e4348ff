"""n-gram count table (operators/lmscore.py:ngram_counts)."""


def test_trigram_counts_and_pruning(spark):
    from docling_spark.operators.lmscore import ngram_counts
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c"), (3, "x y")],
        "doc_id long, text string")
    out = {r["ngram"]: r["c"] for r in
           ngram_counts(docs, n=3, min_count=2).collect()}
    # "a b c": doc1 twice (pos 1, pos 4? no — windows: abc, bca, cab,
    # abc) + doc2 once = 3; "b c a"/"c a b" once each (pruned);
    # doc3 shorter than n contributes nothing
    assert out == {"a b c": 3}
    full = {r["ngram"]: r["c"] for r in
            ngram_counts(docs, n=3, min_count=1).collect()}
    assert full == {"a b c": 3, "b c a": 1, "c a b": 1}


def test_short_doc_guard(spark):
    from docling_spark.operators.lmscore import ngram_counts
    docs = spark.createDataFrame(
        [(1, "only two")], "doc_id long, text string")
    assert ngram_counts(docs, n=3, min_count=1).collect() == []
