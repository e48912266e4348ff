"""DSIR importance resampling semantics (operators/dsir.py)."""


def _corpus(spark):
    sci = "quantum field theory lattice gauge simulation results"
    spam = "buy cheap pills now discount offer click here fast"
    rows = [(i, sci if i % 2 == 0 else spam) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weights_separate_target_from_pool(spark):
    from docling_spark.operators.dsir import dsir_weights
    from pyspark.sql import functions as F

    docs = _corpus(spark)
    # target = a few science docs; pool = everything
    target = docs.filter((F.col("doc_id") % 2 == 0)
                         & (F.col("doc_id") < 10))
    out = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
    sci_w = [out[i]["weight_e6"] for i in range(0, 40, 2)]
    spam_w = [out[i]["weight_e6"] for i in range(1, 40, 2)]
    # DSIR weights are meaningful RELATIVELY (resampling ranks by
    # them); with a tiny target the add-1 smoothing shifts all
    # weights negative, but the target/pool separation must hold.
    assert min(sci_w) > max(spam_w)
    for r in out.values():
        assert r["keep"] == int(r["weight_e6"] > 0)


def test_resample_is_deterministic_and_target_biased(spark):
    from docling_spark.operators.dsir import dsir_resample
    from pyspark.sql import functions as F

    docs = _corpus(spark)
    target = docs.filter((F.col("doc_id") % 2 == 0)
                         & (F.col("doc_id") < 10))
    a = [(r["doc_id"], r["score_e6"], r["rank"])
         for r in dsir_resample(docs, target, k=10).collect()]
    b = [(r["doc_id"], r["score_e6"], r["rank"])
         for r in dsir_resample(docs, target, k=10).collect()]
    assert sorted(a) == sorted(b)  # pure function of the input
    assert len(a) == 10
    picked = {d for d, _, _ in a}
    # Gumbel noise spans a few units; the sci/spam log-ratio gap is
    # far larger, so the top-10 must be science docs
    assert all(d % 2 == 0 for d in picked), picked
