"""Sentence segmentation (operators/textstats.py:doc_sentences)."""


def test_segmentation_closed_form(spark):
    from docling_spark.operators.textstats import doc_sentences
    docs = spark.createDataFrame(
        [(1, "Hello world. How are you?  Fine!"),
         (2, "no terminal punctuation here"),
         (3, "One... two?! three.")],
        "doc_id long, text string")
    rows = sorted(doc_sentences(docs).collect(),
                  key=lambda r: (r["doc_id"], r["sent_idx"]))
    got = [(r["doc_id"], r["sent_idx"], r["sentence"], r["n_tokens"])
           for r in rows]
    assert got == [
        (1, 0, "hello world.", 2),
        (1, 1, "how are you?", 3),
        (1, 2, "fine!", 1),
        # doc 2: trailing fragment without a terminal → no rows
        (3, 0, "one...", 1),
        (3, 1, "two?!", 1),
        (3, 2, "three.", 1),
    ]


def test_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from docling_spark.operators.textstats import doc_sentences
    # the synthetic corpus has no terminal punctuation — frame it the
    # way the registry query does so segmentation is exercised
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id",
                F.concat(F.lit("Start here. "), F.col("text"),
                         F.lit("! The end.")).alias("text"))
    key = lambda r: (r["doc_id"], r["sent_idx"])  # noqa: E731
    a = sorted(doc_sentences(docs.repartition(1)).collect(), key=key)
    b = sorted(doc_sentences(docs.repartition(5)).collect(), key=key)
    assert a == b and len(a) > 0
    by_doc = {}
    for r in a:
        by_doc.setdefault(r["doc_id"], []).append(r["sent_idx"])
    # framing guarantees exactly 3 sentences per doc, contiguous idx
    assert all(v == [0, 1, 2] for v in by_doc.values())
