"""oov_rate (operators/textstats.py): vocabulary-coverage report —
selection determinism at the top-k tie boundary, group accounting,
and the broadcast plan shape."""

from pyspark.sql import functions as F

from docling_spark.operators.textstats import oov_rate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_oov_rate_counts_and_rate(spark):
    # vocab_k=2 over counts: the=3, cat=2, dog=1 → vocab {the, cat}
    docs = _docs(spark, [
        ("a", "the cat the"),
        ("b", "the cat dog"),
    ])
    got = {r["source"]: r for r in
           oov_rate(docs, vocab_k=2).collect()}
    assert got["a"]["n_tokens"] == 3 and got["a"]["n_oov"] == 0
    assert got["b"]["n_tokens"] == 3 and got["b"]["n_oov"] == 1
    assert got["b"]["oov_e6"] == 333_333  # floor(1e6/3)


def test_oov_rate_tie_boundary_is_lexicographic(spark):
    # apple=1, banana=1, cherry=1: k=2 keeps {apple, banana} by
    # count-desc then token-asc — cherry is OOV deterministically
    docs = _docs(spark, [("s", "apple banana cherry")])
    row = oov_rate(docs, vocab_k=2).head()
    assert row["n_oov"] == 1


def test_oov_rate_plan_broadcasts_vocab(spark):
    docs = _docs(spark, [("s", "a b c")])
    plan = (oov_rate(docs, vocab_k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
