"""Flesch readability signals
(operators/textstats.py:with_readability)."""

import math


def test_hand_computed_scores(spark):
    from docling_spark.operators.textstats import with_readability
    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog barked!"),
         (2, "xzzq grr")],  # no vowels (y counts) → 1 syllable/token
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_readability(docs).collect()}
    r1 = out[1]
    # normalized: "the cat sat. the dog barked!" → 6 tokens, 2 sents
    assert r1["n_tokens"] == 6 and r1["n_sentences"] == 2
    # syllables: the=1 cat=1 sat=1 the=1 dog=1 barked=2 ("a","e")
    assert r1["n_syllables"] == 7
    wps, spw = 6 / 2, 7 / 6
    assert r1["fre_e3"] == math.floor(
        (206.835 - 1.015 * wps - 84.6 * spw) * 1000)
    assert r1["fkg_e3"] == math.floor(
        (0.39 * wps + 11.8 * spw - 15.59) * 1000)
    r2 = out[2]
    assert (r2["n_tokens"], r2["n_syllables"], r2["n_sentences"]) \
        == (2, 2, 1)


def test_zero_shuffle_plan(spark):
    """Readability fuses into the scan: no Exchange in the plan."""
    from docling_spark.operators.textstats import with_readability
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    plan = with_readability(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
