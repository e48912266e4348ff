"""Temperature-based mixing weights
(operators/packing.py:mixture_weights)."""

import math


def test_alpha_upsamples_tail(spark):
    from docling_spark.operators.packing import mixture_weights
    docs = spark.createDataFrame(
        [(i, "en", "w " * 99 + "w") for i in range(9)]
        + [(100, "fi", "w " * 99 + "w")],
        "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in
           mixture_weights(docs, alpha=0.3).collect()}
    # shares: en 90%, fi 10%
    assert out["en"]["share_e6"] == 900_000
    assert out["fi"]["share_e6"] == 100_000
    # α=0.3 compresses: fi's weight far above its share, en's below
    assert out["fi"]["weight_e6"] > out["fi"]["share_e6"]
    assert out["en"]["weight_e6"] < out["en"]["share_e6"]
    # closed form: q ∝ floor(n^0.3·1e6) over exact token counts
    pw_en = math.floor((900 ** 0.3) * 1e6)
    pw_fi = math.floor((100 ** 0.3) * 1e6)
    assert out["en"]["weight_e6"] == math.floor(
        1e6 * pw_en / (pw_en + pw_fi))
    # rate = q/p: the tail group gets a >1 epoch multiplier
    assert out["fi"]["rate_e6"] > 1_000_000 > out["en"]["rate_e6"]


def test_alpha_one_is_proportional(spark):
    from docling_spark.operators.packing import mixture_weights
    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "x y z q w e")],
        "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in
           mixture_weights(docs, alpha=1.0).collect()}
    for lang in ("a", "b"):
        assert abs(out[lang]["weight_e6"] - out[lang]["share_e6"]) <= 1
        assert abs(out[lang]["rate_e6"] - 1_000_000) <= 10
