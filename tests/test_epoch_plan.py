"""Data-constrained epoch planning (operators/packing.py:epoch_plan)."""

import math


def test_matches_closed_form(spark):
    from docling_spark.operators.packing import epoch_plan
    # two groups: big (9 tokens) and small (3 tokens)
    docs = spark.createDataFrame(
        [(0, "a b c d e", "en"), (1, "f g h i", "en"),
         (2, "x y z", "de")],
        "doc_id long, text string, lang string")
    out = {r["lang"]: r.asDict()
           for r in epoch_plan(docs, target_tokens=100, alpha=0.3,
                               max_epochs_e3=4000).collect()}
    pw = {g: math.floor(n ** 0.3 * 1e6) for g, n in
          {"en": 9, "de": 3}.items()}
    spw = sum(pw.values())
    for g, n in {"en": 9, "de": 3}.items():
        w = math.floor(1e6 * pw[g] / spw)
        req = math.floor(w * 100 / 1e6)
        ep = math.floor(req * 1000 / n)
        r = out[g]
        assert r["available_tokens"] == n
        assert r["weight_e6"] == w
        assert r["requested_tokens"] == req
        assert r["epochs_e3"] == ep
        assert r["over_budget"] == int(ep > 4000)
    # a 100-token budget over 12 available tokens forces >4 epochs
    assert out["en"]["over_budget"] == 1
    assert out["de"]["over_budget"] == 1


def test_proportional_budget_not_over(spark):
    from docling_spark.operators.packing import epoch_plan
    docs = spark.createDataFrame(
        [(0, "a b c d", "en"), (1, "x y z w", "de")],
        "doc_id long, text string, lang string")
    # alpha=1 (proportional) and a budget equal to the corpus → ~1
    # epoch each, nobody over budget
    rows = epoch_plan(docs, target_tokens=8, alpha=1.0,
                      max_epochs_e3=4000).collect()
    assert all(r["over_budget"] == 0 for r in rows)
    assert all(900 <= r["epochs_e3"] <= 1100 for r in rows)
