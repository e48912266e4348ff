"""Hard-negative mining
(operators/similarity.py:hard_negatives)."""

import math


def test_band_excludes_near_dups_and_easy(spark):
    from docling_spark.operators.similarity import hard_negatives
    # query q=(1,0); corpus: exact dup (cos 1.0, above band),
    # hard (cos≈0.92), medium (cos≈0.71), easy (cos 0.0, below band)
    rows = [
        (0, [1.0, 0.0]),          # the query itself (self-excluded)
        (1, [1.0, 0.001]),        # ~1.0 → excluded as near-dup
        (2, [1.0, 0.42]),         # ~0.922 → hard negative
        (3, [1.0, 1.0]),          # ~0.707 → hard negative
        (4, [0.0, 1.0]),          # 0.0 → too easy, below band
    ]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0")
    out = hard_negatives(emb, q, k=5, sim_lo=0.5,
                         sim_hi=0.95).collect()
    got = [(r["nbr_id"], r["rnk"] if "rnk" in r.asDict() else r["rank"])
           for r in sorted(out, key=lambda r: r["rank"])]
    assert [n for n, _ in got] == [2, 3]
    s2 = 1.0 / math.sqrt(1 + 0.42 ** 2)
    assert out[0]["score_e4"] == math.floor(
        max(s2, 1 / math.sqrt(2)) * 10000)


def test_empty_band_yields_no_rows(spark):
    from docling_spark.operators.similarity import hard_negatives
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = hard_negatives(emb, emb.filter("vec_id = 0"),
                         k=3, sim_lo=0.5, sim_hi=0.95).collect()
    assert out == []
