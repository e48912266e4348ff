"""Co-occurrence + PMI precompute (operators/cooc.py)."""

import math


def test_window_pairs_and_pmi(spark):
    from docling_spark.operators.cooc import cooccurrence_pmi
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b")],
        "doc_id long, text string")
    out = {(r["x"], r["y"]): r for r in
           cooccurrence_pmi(docs, window=2,
                            min_count=1).collect()}
    # doc1 (window 2, forward): ab ac | bc ba | ca cb | ab  → canon:
    # (a,b)×3, (a,c)×2, (b,c)×2;  doc2 adds (a,b)×1
    assert out[("a", "b")]["c_xy"] == 4
    assert out[("a", "c")]["c_xy"] == 2
    assert out[("b", "c")]["c_xy"] == 2
    # unigrams over both docs: a=3, b=3, c=1; N=7
    assert out[("a", "b")]["c_x"] == 3
    assert out[("b", "c")]["c_y"] == 1
    # total pairs P: doc1 n=5 w=2 → 2*5-3=7; doc2 n=2 → 1; P=8
    n, p = 7, 8
    exp = math.floor(math.log(4 * n * n / (p * 3 * 3)) * 1e6)
    assert out[("a", "b")]["pmi_e6"] == exp


def test_min_count_gate_and_symmetry(spark):
    from docling_spark.operators.cooc import cooccurrence_pmi
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], "doc_id long, text string")
    out = cooccurrence_pmi(docs, window=4, min_count=2).collect()
    # both directions canonicalize to ("x","y") and merge to count 2
    assert len(out) == 1
    assert (out[0]["x"], out[0]["y"], out[0]["c_xy"]) == ("x", "y", 2)
