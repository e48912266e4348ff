"""Property tests for the table-maintenance and substring-dedup
operators: span_diff against a pure-Python reference diff on random
span tables, and the Lee-et-al. postcondition for dedup_substrings
(no k-token window shared across ≥min_df docs survives)."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

SPAN_DDL = ("doc_id long, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>")

span = st.tuples(st.sampled_from(["text", "heading", "picture"]),
                 st.sampled_from(["a", "b", "c"]),
                 st.sampled_from(["", "m://1"]))
doc = st.lists(span, min_size=0, max_size=5)
table = st.dictionaries(st.integers(0, 6), doc, min_size=0, max_size=6)


def _rows(t):
    return [(i, [{"kind": k, "text": x, "media_ref": m, "offset": j}
                 for j, (k, x, m) in enumerate(sp)])
            for i, sp in sorted(t.items())]


def _ref_diff(lt, rt):
    out = {}
    for i in set(lt) | set(rt):
        if i not in rt:
            out[i] = ("only_left", len(lt[i]), 0, None)
        elif i not in lt:
            out[i] = ("only_right", 0, len(rt[i]), None)
        else:
            a, b = lt[i], rt[i]
            fd = next((j for j in range(max(len(a), len(b)))
                       if j >= len(a) or j >= len(b) or a[j] != b[j]),
                      None)
            status = "equal" if fd is None else "changed"
            out[i] = (status, len(a), len(b), fd)
    return out


@settings(max_examples=15, deadline=None)
@given(lt=table, rt=table)
def test_span_diff_matches_python_reference(spark, lt, rt):
    from docling_spark.operators.diff import span_diff

    left = spark.createDataFrame(_rows(lt), SPAN_DDL)
    right = spark.createDataFrame(_rows(rt), SPAN_DDL)
    got = {r["doc_id"]: (r["status"], r["n_left"], r["n_right"],
                         r["first_diff_offset"])
           for r in span_diff(left, right).collect()}
    assert got == _ref_diff(lt, rt)


def test_dedup_substrings_postcondition(spark):
    """After removal, re-fingerprinting the OUTPUT finds no k-window
    shared by ≥2 distinct docs (removal can in principle create new
    junction windows; this pins that it does not happen on a corpus
    with realistic vocabulary)."""
    from docling_spark.operators.substring import dedup_substrings
    from docling_spark.operators.textstats import tokens_col

    k = 8
    blurb = ("all rights reserved redistribution permitted under the "
             "open license agreement version two")
    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(60))
    corpus = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit(" " + blurb)))
        .otherwise(F.col("text")).alias("text"))
    out = dedup_substrings(corpus, k=k, min_df=2)

    toks = out.select("doc_id", tokens_col().alias("toks"))
    n = F.size("toks")
    wins = (toks.filter(n >= k)
            .select("doc_id",
                    F.explode(F.sequence(F.lit(0), n - k)).alias("s"),
                    "toks")
            .select("doc_id",
                    F.md5(F.concat_ws(
                        " ", F.slice("toks", F.col("s") + 1, k)))
                    .alias("fp")))
    shared = (wins.groupBy("fp")
              .agg(F.count_distinct("doc_id").alias("df"))
              .filter(F.col("df") >= 2).count())
    assert shared == 0
    # and the blurb was actually removed from the docs that had it
    removed = out.filter(F.col("n_removed") > 0).count()
    assert removed == 30
