"""Character-entropy gate (operators/textstats.py:with_char_entropy)."""

import math
from collections import Counter


def _expected(text):
    n = len(text)
    num = sum(math.floor(1_000_000 * c * math.log(c / n))
              for c in Counter(text).values())
    return math.floor(-num / n)


def test_matches_closed_form_and_separates(spark):
    from docling_spark.operators.textstats import with_char_entropy
    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaa"),            # degenerate → 0 entropy
         (2, "abcdefghij"),            # uniform → ln(10)
         (3, "The quick brown fox")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_char_entropy(docs).collect()}
    assert out[1]["entropy_e6"] == 0
    assert out[2]["entropy_e6"] == _expected("abcdefghij")
    # uniform 10-char alphabet ≈ ln(10) = 2.302585…
    assert abs(out[2]["entropy_e6"] - 2_302_585) <= 1
    assert out[3]["entropy_e6"] == _expected("the quick brown fox")
    assert out[1]["entropy_e6"] < out[3]["entropy_e6"]


def test_zero_shuffle_plan(spark):
    from docling_spark.operators.textstats import with_char_entropy
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    plan = with_char_entropy(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
