"""Naive-Bayes token-LLR quality classifier
(operators/classify.py:quality_classify) — the fastText-style
curated-vs-raw gate of GPT-3 Appendix A / CCNet / RedPajama."""

import math

from pyspark.sql import functions as F


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_separates_curated_from_raw(spark):
    """Docs made of curated-slice vocabulary must score higher than
    docs made of raw-slice vocabulary, and the NB gate at 0 must
    split them."""
    from docling_spark.operators.classify import quality_classify
    pos = _frame(spark, [(i, "science method evidence theory data")
                         for i in range(10, 15)])
    neg = _frame(spark, [(i, "click buy cheap deal offer")
                         for i in range(20, 25)])
    docs = _frame(spark, [
        (1, "science evidence theory"),
        (2, "cheap deal offer click"),
        (3, "science data buy"),          # mixed, majority curated
    ])
    out = {r["doc_id"]: r for r in
           quality_classify(docs, pos, neg,
                            min_mean_llr_e6=0).collect()}
    assert out[1]["mean_llr_e6"] > 0 and out[1]["keep"] == 1
    assert out[2]["mean_llr_e6"] < 0 and out[2]["keep"] == 0
    assert out[3]["mean_llr_e6"] > out[2]["mean_llr_e6"]
    assert out[1]["n_tokens"] == 3


def test_llr_matches_closed_form(spark):
    """The quantized model table must equal the add-alpha NB LLR
    computed by hand over the shared vocabulary."""
    from docling_spark.operators.classify import nb_model_table
    pos = _frame(spark, [(1, "a a b")])
    neg = _frame(spark, [(2, "b c")])
    model, unseen = nb_model_table(pos, neg)
    got = {r["token"]: r["llr_e6"] for r in model.collect()}
    # shared vocab {a, b, c}: V=3, Np=3, Nn=2, alpha=0.5
    dp, dn = 3 + 0.5 * 4, 2 + 0.5 * 4
    exp = {
        "a": math.floor((math.log(2.5 / dp) - math.log(0.5 / dn)) * 1e6),
        "b": math.floor((math.log(1.5 / dp) - math.log(1.5 / dn)) * 1e6),
        "c": math.floor((math.log(0.5 / dp) - math.log(1.5 / dn)) * 1e6),
    }
    assert got == exp
    u = unseen.collect()[0]["llr_e6"]
    assert u == math.floor(
        (math.log(0.5 / dp) - math.log(0.5 / dn)) * 1e6)


def test_order_independent_across_partitionings(spark):
    """Integer-quantized per-token LLRs make document sums exact:
    the same corpus scored at 1 partition and 8 partitions must agree
    bit-for-bit (the property float log-prob sums do not have)."""
    from docling_spark.operators.classify import quality_classify
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    pos = docs.filter(F.col("doc_id") % 10 == 0)
    neg = docs.filter(F.col("doc_id") % 10 == 5)
    a = quality_classify(docs.repartition(1), pos, neg).collect()
    b = quality_classify(docs.repartition(8), pos, neg).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
