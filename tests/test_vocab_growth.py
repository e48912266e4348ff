"""Heaps-law vocabulary growth (operators/textstats.py:vocab_growth)."""


def test_matches_closed_form(spark):
    from docling_spark.operators.textstats import vocab_growth
    docs = spark.createDataFrame(
        [(0, "a b c"),       # bucket 0: types a b c
         (1, "a b d"),       # +d
         (2, "A  c\te"),     # normalization: +e
         (10, "f a"),        # bucket 5 (size 2): +f
         (11, "g g g")],     # +g
        "doc_id long, text string")
    out = {r["bucket_id"]: (r["first_doc"], r["new_types"],
                            r["cum_types"])
           for r in vocab_growth(docs, bucket_size=2).collect()}
    assert out == {0: (0, 4, 4),   # a b c d
                   1: (2, 1, 5),   # e
                   5: (10, 2, 7)}  # f g


def test_monotone_and_total(spark):
    from docling_spark.operators.textstats import vocab_growth
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    rows = sorted(vocab_growth(docs, bucket_size=100).collect(),
                  key=lambda r: r["bucket_id"])
    assert rows[-1]["cum_types"] == sum(r["new_types"] for r in rows)
    cums = [r["cum_types"] for r in rows]
    assert cums == sorted(cums)
    assert all(r["new_types"] > 0 for r in rows)
