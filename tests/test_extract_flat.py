"""extract_spans_flat must be byte-identical to extract_spans — the
Catalyst pre-assembly (_preassembled) replays _extract_one's python
assembly rules exactly, on adversarial inputs:

  * media spans interleaved with payload spans (picture media_ref
    assignment order)
  * mixed payload kinds (first non-media kind wins, later kinds skip)
  * pdf_page override (a pdf_page span anywhere forces the paged path
    even when another kind came first — the elif-chain semantics)
  * media-only / empty / unknown-kind docs → SKIPPED
  * parser exception → FAILURE with the same module/message
  * null and duplicate offsets (stable-sort tie-break on input order)
  * null kind/text/media_ref fields
"""

import json

from docling_spark.operators.extract import extract_spans, extract_spans_flat
from docling_spark.schema import INPUT_SCHEMA


def _page_json(*lines):
    """Minimal structured-page payload (one body cell per line)."""
    return json.dumps({
        "width": 612.0, "height": 792.0,
        "cells": [{"index": i, "text": t,
                   "l": 72.0, "t": 300.0 + 20.0 * i,
                   "r": 400.0, "b": 314.0 + 20.0 * i}
                  for i, t in enumerate(lines)],
    })


def _docs(spark):
    rows = [
        # interleaved media + html, duplicate offsets (stability)
        ("d1", [("html", "<h1>T</h1><p>a</p>", "", 2),
                ("media", "", "media://x", 1),
                ("html", "<figure></figure>", "", 2),
                ("media", "", "media://y", 0)]),
        # mixed kinds: md first by offset, html later is skipped
        ("d2", [("html", "<p>skipped</p>", "", 5),
                ("md", "# first\n\nbody", "", 1)]),
        # pdf_page override: html comes first but pdf_page wins
        ("d3", [("html", "<p>ignored</p>", "", 0),
                ("pdf_page", _page_json("line one", "line two"), "", 1),
                ("pdf_page", _page_json("page two text"), "", 2)]),
        # media-only → SKIPPED
        ("d4", [("media", "", "media://only", 0)]),
        # empty spans → SKIPPED
        ("d5", []),
        # unknown kind → SKIPPED
        ("d6", [("zzz", "payload", "", 0)]),
        # parser exception → FAILURE (invalid docling JSON)
        ("d7", [("docling_json", "{not json", "", 0)]),
        # null offset / null text / null media_ref / null kind
        ("d8", [("md", None, None, None),
                (None, "x", "", 1),
                ("md", "tail", "", 2)]),
        # NULL spans array (not just empty) → SKIPPED
        ("d9", None),
    ]
    return spark.createDataFrame(rows, INPUT_SCHEMA)


def _canon(df):
    rows = df.drop("wall_us").collect()
    return sorted((r.doc_id, r.status, r.n_spans,
                   tuple(tuple(s) for s in r.spans),
                   tuple(tuple(e) for e in r.errors)) for r in rows)


def test_flat_parity_adversarial(spark):
    docs = _docs(spark)
    a = _canon(extract_spans(docs, assembly="python"))
    b = _canon(extract_spans_flat(docs))
    assert a == b
    by_id = {t[0]: t for t in a}
    assert by_id["d3"][1] == "success"          # paged path taken
    assert by_id["d4"][1] == "skipped"
    assert by_id["d5"][1] == "skipped"
    assert by_id["d6"][1] == "skipped"
    assert by_id["d7"][1] == "failure"
    assert by_id["d7"][4][0][1] == "docling_json"   # error module
    # d1: the picture span got the first media ref in offset order
    pics = [s for s in by_id["d1"][3] if s[0] == "picture"]
    assert pics and pics[0][2] == "media://y"


def test_flat_parity_exports(spark):
    docs = _docs(spark).filter("doc_id in ('d1','d2','d3','d7')")
    a = extract_spans(docs, with_markdown=True, with_itxt=True,
                      with_html=True, assembly="python")
    b = extract_spans_flat(docs, with_markdown=True, with_itxt=True,
                           with_html=True)
    ka = sorted((r.doc_id, r.markdown, r.itxt, r.html) for r in a.collect())
    kb = sorted((r.doc_id, r.markdown, r.itxt, r.html) for r in b.collect())
    assert ka == kb
