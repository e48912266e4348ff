"""Segment-level exact dedup (operators/segdedup.py) — Dolma/
RefinedWeb paragraph dedup over fixed token windows."""

from pyspark.sql import functions as F


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_wins(spark):
    from docling_spark.operators.segdedup import dedup_segments
    w4 = "a b c d"
    docs = _frame(spark, [
        (1, f"{w4} e f g h"),       # segments: "a b c d", "e f g h"
        (2, f"{w4} x y z w"),       # first segment duplicates doc 1
        (3, w4),                    # whole doc duplicates
    ])
    out = {r["doc_id"]: r for r in
           dedup_segments(docs, window_tokens=4).collect()}
    assert out[1]["text"] == "a b c d e f g h"
    assert (out[1]["n_segs"], out[1]["n_kept"]) == (2, 2)
    assert out[2]["text"] == "x y z w"
    assert (out[2]["n_segs"], out[2]["n_kept"]) == (2, 1)
    # fully-duplicate doc survives as a row with empty text
    assert out[3]["text"] == ""
    assert (out[3]["n_segs"], out[3]["n_kept"]) == (1, 0)


def test_trailing_remainder_and_order(spark):
    """The last partial window is a segment of its own, and surviving
    segments reassemble in original order."""
    from docling_spark.operators.segdedup import dedup_segments
    docs = _frame(spark, [(7, "p q r s t u")])
    out = dedup_segments(docs, window_tokens=4).collect()[0]
    assert out["text"] == "p q r s t u"
    assert (out["n_segs"], out["n_kept"]) == (2, 2)


def test_partitioning_invariant(spark):
    """Keeper choice is min (doc_id, seg_idx) — a total order — so
    results are identical across partitionings."""
    from docling_spark.operators.segdedup import dedup_segments
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text"))
    key = lambda r: r["doc_id"]  # noqa: E731
    a = sorted(dedup_segments(corpus.repartition(1)).collect(), key=key)
    b = sorted(dedup_segments(corpus.repartition(16)).collect(), key=key)
    assert a == b
    # every duplicated doc lost all its segments to the original
    for r in b:
        if r["doc_id"] >= 1000:
            assert r["n_kept"] == 0 and r["text"] == ""
