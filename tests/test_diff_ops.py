"""Unit tests for operators/diff.py — span regression diff and
incremental (CDC) selection."""

import pyspark.sql.functions as F
import pytest

SPAN_DDL = ("doc_id long, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>")


def _spans(*items):
    return [{"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(items)]


@pytest.fixture()
def diff_tables(spark):
    left = spark.createDataFrame([
        (1, _spans(("title", "a", ""), ("text", "b", ""))),
        (2, _spans(("title", "a", ""), ("text", "b", ""))),
        (3, _spans(("title", "a", ""), ("text", "b", ""),
                   ("picture", "", "m://3"))),
        (4, _spans(("title", "a", ""),)),
    ], SPAN_DDL)
    right = spark.createDataFrame([
        (1, _spans(("title", "a", ""), ("text", "b", ""))),     # equal
        (2, _spans(("title", "a", ""), ("text", "B", ""))),     # text edit
        (3, _spans(("title", "a", ""), ("text", "b", ""))),     # tail drop
        (5, _spans(("title", "x", ""),)),                       # only_right
    ], SPAN_DDL)
    return left, right


def test_span_diff_statuses(spark, diff_tables):
    from docling_spark.operators.diff import span_diff

    left, right = diff_tables
    rows = {r["doc_id"]: r for r in span_diff(left, right).collect()}
    assert rows[1]["status"] == "equal"
    assert rows[1]["first_diff_offset"] is None
    assert rows[2]["status"] == "changed"
    assert rows[2]["first_diff_offset"] == 1
    # a dropped tail span diverges at the shorter length's index
    assert rows[3]["status"] == "changed"
    assert rows[3]["first_diff_offset"] == 2
    assert (rows[3]["n_left"], rows[3]["n_right"]) == (3, 2)
    assert rows[4]["status"] == "only_left"
    assert rows[4]["n_right"] == 0
    assert rows[5]["status"] == "only_right"
    assert rows[5]["n_left"] == 0
    assert rows[5]["first_diff_offset"] is None


def test_span_diff_media_ref_counts(spark, diff_tables):
    """media_ref participates in span equality (the reference's
    span-sequence invariant includes it)."""
    from docling_spark.operators.diff import span_diff

    left, _ = diff_tables
    right = left.withColumn(
        "spans",
        F.transform("spans", lambda x: F.struct(
            x["kind"].alias("kind"), x["text"].alias("text"),
            F.lit("m://other").alias("media_ref"),
            x["offset"].alias("offset"))))
    out = span_diff(left, right).collect()
    assert all(r["status"] == "changed" and r["first_diff_offset"] == 0
               for r in out)


def test_span_diff_no_explode_no_window(spark, diff_tables):
    """The diff is one join + array math: no Generate (explode) and no
    Window in the optimized plan."""
    from docling_spark.operators.diff import span_diff

    left, right = diff_tables
    plan = span_diff(left, right)._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan
    assert "Window" not in plan


def test_changed_docs_reasons(spark):
    from docling_spark.operators.diff import changed_docs

    cur = spark.createDataFrame(
        [(1, "h1"), (2, "h2-new"), (3, "h3")],
        "doc_id long, content_sha256 string")
    prev = spark.createDataFrame(
        [(1, "h1"), (2, "h2-old"), (9, "h9")],
        "doc_id long, content_sha256 string")
    out = {r["doc_id"]: r["reason"]
           for r in changed_docs(cur, prev, include_deleted=True).collect()}
    assert out == {2: "changed", 3: "new", 9: "deleted"}
    # unchanged doc 1 never appears; deletions hidden by default
    out2 = {r["doc_id"]: r["reason"]
            for r in changed_docs(cur, prev).collect()}
    assert out2 == {2: "changed", 3: "new"}
