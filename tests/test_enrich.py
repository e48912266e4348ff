"""Enrichment framework (SURVEY §2.4): batched second pass over
processable spans, pluggable enrichers, side-table join-back."""

import pandas as pd

from docling_spark.operators.enrich import (
    apply_enrichment,
    classify_code_language,
    enrich_spans,
)

SPAN_DDL = ("doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>")


def test_code_language_rule_precedence():
    s = pd.Series([
        "#include <v> def f(x): x",   # c wins over python (rule order)
        "def f(x): return 1",
        "function go() { }",
        "public static void main",
        "SELECT a FROM b",
        "package main",
        "fn add(a: i32) -> i32",
        "plain words only",
    ])
    assert list(classify_code_language(s)) == [
        "c", "python", "javascript", "java", "sql", "go", "rust",
        "unknown"]


def test_enrich_and_apply(spark):
    rows = [
        ("d1", [("title", "T", "", 0),
                ("code", "def f(): pass", "", 1),
                ("picture", "", "m://1", 2),
                ("formula", "\\sum x", "", 3)]),
        ("d2", [("text", "plain", "", 0),
                ("picture", "", "", 1)]),
    ]
    df = spark.createDataFrame(rows, SPAN_DDL)
    enriched = enrich_spans(df)
    got = {(r["doc_id"], r["offset"]): (r["kind"], r["enrichment"])
           for r in enriched.collect()}
    # only processable kinds appear (title/text filtered at the scan)
    assert got == {
        ("d1", 1): ("code", "python"),
        ("d1", 2): ("picture", "media"),
        ("d1", 3): ("formula", "latex"),
        ("d2", 1): ("picture", "inline"),
    }
    joined = apply_enrichment(df, enriched)
    by_key = {(r["doc_id"], r["offset"]): r["enrichment"]
              for r in joined.collect()}
    assert by_key[("d1", 0)] is None  # unenriched spans keep null
    assert by_key[("d1", 1)] == "python"
    assert len(by_key) == 6  # every span survives the left join


def test_custom_enricher_slot(spark):
    rows = [("d1", [("picture", "", "m://x", 0)])]
    df = spark.createDataFrame(rows, SPAN_DDL)
    custom = {"picture": lambda pdf: pd.Series(
        ["classified"] * len(pdf), index=pdf.index)}
    out = enrich_spans(df, custom).collect()
    assert [r["enrichment"] for r in out] == ["classified"]
