"""Embedding-level eval-set decontamination
(operators/decontam.py:decontaminate_semantic)."""

import math


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_matches_closed_form(spark):
    from docling_spark.operators.decontam import decontaminate_semantic
    rows = [
        (0, [1.0, 0.0, 0.0]),        # eval
        (1, [0.0, 1.0, 0.0]),        # eval
        (10, [1.0, 0.1, 0.0]),       # near eval 0 → contaminated
        (11, [0.0, 0.0, 1.0]),       # orthogonal → clean
        (12, [0.5, 0.5, 0.0]),       # cos 0.7071 vs both → contaminated
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    ev = emb.filter("vec_id < 10")
    out = {r["vec_id"]: (r["max_eval_sim_e4"], r["contaminated"])
           for r in decontaminate_semantic(
               emb.filter("vec_id >= 10"), ev,
               threshold_e4=9000).collect()}
    evecs = [r[1] for r in rows[:2]]
    for vid, v in rows[2:]:
        best = max(_cos(v, e) for e in evecs)
        q = math.floor(best * 10000)
        assert out[vid] == (q, int(q >= 9000)), vid
    assert out[10][1] == 1 and out[11][1] == 0 and out[12][1] == 0


def test_eval_rows_excluded_and_partition_invariant(spark):
    from docling_spark.operators.decontam import decontaminate_semantic
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    ev = emb.filter("vec_id < 20")
    a = sorted(decontaminate_semantic(emb.repartition(1), ev)
               .collect())
    b = sorted(decontaminate_semantic(emb.repartition(7), ev)
               .collect())
    assert a == b
    ids = {r["vec_id"] for r in a}
    assert ids.isdisjoint(range(20))
    assert len(ids) == emb.count() - 20
