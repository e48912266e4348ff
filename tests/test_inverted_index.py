"""Posting-list build (operators/retrieval.py:inverted_index)."""


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_tf_df_cf(spark):
    from docling_spark.operators.retrieval import inverted_index
    docs = _frame(spark, [
        (1, "apple apple banana"),
        (2, "apple cherry"),
        (3, "durian"),
    ])
    out = {(r["term"], r["doc_id"]): (r["tf"], r["df"], r["cf"])
           for r in inverted_index(docs).collect()}
    assert out[("apple", 1)] == (2, 2, 3)
    assert out[("apple", 2)] == (1, 2, 3)
    assert out[("banana", 1)] == (1, 1, 1)
    assert out[("durian", 3)] == (1, 1, 1)
    assert len(out) == 5


def test_df_gates(spark):
    from docling_spark.operators.retrieval import inverted_index
    docs = _frame(spark, [
        (1, "the apple"), (2, "the banana"), (3, "the apple"),
    ])
    # min_df=2 drops hapax 'banana'; max_df_ratio drops 'the' (df=3/3)
    out = {r["term"] for r in
           inverted_index(docs, min_df=2,
                          max_df_ratio=0.9).collect()}
    assert out == {"apple"}
