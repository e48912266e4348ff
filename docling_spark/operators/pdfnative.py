"""Native PDF parsing as a Spark stage: raw PDF bytes → text cells via
the from-scratch reader (parsers/pdfio.py), Arrow-batched.

Fills SURVEY §2.3 "native PDF parse" (the reference routes PDFs to the
docling-parse native library via backend/docling_parse_v4_backend.py;
this engine parses the file format itself — see pdfio.py — so raw
bytes → runs → line cells → the existing paged pipeline is a complete
in-repo path with no native dependency).

Scale shape: both stages are zero-shuffle mapInPandas over whatever
partitioning the corpus already has; at 100 TB the only knobs that
matter are input split size and maxRecordsPerBatch (PDF blobs are
KB..MB — keep batches small enough that a batch of blobs fits the
Arrow buffer).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PDF_TEXT_DDL = ("doc_id string, n_pages int, n_cells int, text string")


def synth_pdf_docs(df: DataFrame, split_at: int = 250) -> DataFrame:
    """(doc_id, text) → (doc_id, pdf:binary): deterministic two-page
    PDF per doc (text split at ``split_at`` chars), real xref +
    FlateDecode streams. Pure Arrow stage, no shuffle."""
    from docling_spark.sources.pdfsynth import synth_pdf

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = [
                synth_pdf([t[:split_at], t[split_at:]])
                for t in pdf["text"].astype(str)
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "pdf": pd.Series(blobs, dtype=object)})

    return df.mapInPandas(batches, schema="doc_id string, pdf binary")


def synth_pdf_word_docs(df: DataFrame, max_words: int = 40) -> DataFrame:
    """(doc_id, words:array<string>) → (doc_id, pdf:binary): two-page
    PDF, one word per 14pt-spaced line, first ceil(n/2) words on page
    0 — the same corpus shape corpus_pdf_pages synthesizes as
    structured payloads, but as genuine PDF bytes."""
    import math

    from docling_spark.sources.pdfsynth import synth_pdf_pages

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for ws in pdf["words"]:
                ws = list(ws)[:max_words]
                half = math.ceil(len(ws) / 2.0)
                blobs.append(synth_pdf_pages([ws[:half], ws[half:]]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "pdf": pd.Series(blobs, dtype=object)})

    return df.mapInPandas(batches, schema="doc_id string, pdf binary")


def pdf_to_page_spans(df: DataFrame) -> DataFrame:
    """(doc_id, pdf:binary) → (doc_id, spans[kind=pdf_page]): the
    bridge from raw PDF bytes to the engine's page-parallel pipeline.
    pdfio parses each document's bytes into per-page line cells and
    each page becomes one span whose text is the structured-page JSON
    payload parse_pdf_pages consumes (parsers/pdf_page.py:333) — so
    raw bytes → native parse → merge/layout/assembly/reading-order is
    a complete in-repo path with no native library. Zero-shuffle Arrow
    stage; downstream extract_spans_paged explodes pages itself.

    Corrupt or page-less documents emit ONE sentinel pdf_page span
    whose payload carries a ``pdfio_error`` field; parse_page raises
    on it, so the paged path's existing per-page error containment
    converts the document to a FAILURE row with the real message —
    same Arrow stage, no second parse pass, nothing silently dropped
    (mirrors the reference's ConversionStatus.FAILURE on backend
    parse errors, datamodel/document.py:130-165)."""
    import json

    from docling_spark.parsers.pdfio import extract_pdf_cells

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "spans": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf"]):
                spans = []
                err = None
                try:
                    pages = extract_pdf_cells(bytes(blob))
                    if not pages:
                        err = "no pages parsed"
                except Exception as exc:
                    pages = []
                    err = f"{type(exc).__name__}: {exc}"[:300]
                if err is not None:
                    out["doc_id"].append(doc_id)
                    out["spans"].append([(
                        "pdf_page",
                        json.dumps({"page_no": 0, "pdfio_error": err}),
                        "", 0)])
                    continue
                for off, page in enumerate(pages):
                    payload = json.dumps({
                        "page_no": off,
                        "width": page["width"],
                        "height": page["height"],
                        "cells": [
                            {"index": i, "text": c["text"],
                             "l": c["x0"], "t": c["y0"],
                             "r": c["x1"], "b": c["y1"]}
                            for i, c in enumerate(page["cells"])],
                    })
                    spans.append(("pdf_page", payload, "", off))
                out["doc_id"].append(doc_id)
                out["spans"].append(spans)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        schema=("doc_id string, spans array<struct<kind:string,"
                "text:string,media_ref:string,offset:int>>"))


def parse_pdf_native(df: DataFrame) -> DataFrame:
    """(doc_id, pdf:binary) → (doc_id, n_pages, n_cells, text): parse
    the raw bytes with pdfio, assemble line cells per page, join all
    cell texts with single spaces (reading order: page, then y, x).
    Pure Arrow stage, no shuffle; per-doc errors yield n_pages = -1
    rather than failing the batch."""
    from docling_spark.parsers.pdfio import extract_pdf_cells

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "n_pages": [], "n_cells": [],
                    "text": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf"]):
                try:
                    pages = extract_pdf_cells(bytes(blob))
                    texts = [c["text"].strip() for p in pages
                             for c in p["cells"] if c["text"].strip()]
                    rows["doc_id"].append(doc_id)
                    rows["n_pages"].append(len(pages))
                    rows["n_cells"].append(len(texts))
                    rows["text"].append(" ".join(texts))
                except Exception:
                    rows["doc_id"].append(doc_id)
                    rows["n_pages"].append(-1)
                    rows["n_cells"].append(0)
                    rows["text"].append("")
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=PDF_TEXT_DDL)


PDF_OUTLINE_DDL = ("doc_id string, idx int, level int, title string, "
                   "page_no int")


def synth_pdf_outline_docs(df: DataFrame) -> DataFrame:
    """(doc_id, pages:array<array<string>>, outline:array<struct<
    level:int,title:string,page_idx:int>>) → (doc_id, pdf:binary) —
    real two-page PDFs carrying a genuine §12.3.3 outline tree
    (linked /First//Next items, /Parent back-refs, explicit /Dest
    arrays). Pure Arrow stage, no shuffle."""
    from docling_spark.sources.pdfsynth import synth_pdf_pages

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for pages, ol in zip(pdf["pages"], pdf["outline"]):
                entries = [(int(e["level"]), str(e["title"]),
                            int(e["page_idx"])) for e in ol]
                blobs.append(synth_pdf_pages(
                    [list(p) for p in pages], outline=entries))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "pdf": pd.Series(blobs, dtype=object)})

    return df.mapInPandas(batches, schema="doc_id string, pdf binary")


def pdf_outline(df: DataFrame) -> DataFrame:
    """(doc_id, pdf:binary) → one row per bookmark: (doc_id, idx,
    level, title, page_no) in pre-order (parsers/pdfio.py::
    extract_outline — /Outlines tree walk with cycle guard, /Dest and
    GoTo-action page resolution). The author-provided section
    hierarchy, free at parse time — the structural prior layout
    analysis otherwise has to re-infer. Zero-shuffle mapInPandas on
    the corpus partitioning; PDFs with no outline emit no rows."""
    from docling_spark.parsers.pdfio import extract_outline

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf"]):
                if blob is None:
                    continue
                try:
                    entries = extract_outline(bytes(blob))
                except Exception:
                    continue   # corrupt bytes must not kill the batch
                for e in entries:
                    rows.append((doc_id, e["idx"], e["level"],
                                 e["title"], e["page_no"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "idx", "level", "title",
                               "page_no"])

    return df.mapInPandas(batches, schema=PDF_OUTLINE_DDL)


PDF_LINKS_DDL = ("doc_id string, page_no int, link_idx int, "
                 "url string, l double, t double, r double, b double")


def synth_pdf_link_docs(df: DataFrame) -> DataFrame:
    """(doc_id, pages:array<array<string>>, links:array<struct<
    page_idx:int,url:string>>) → (doc_id, pdf:binary) — real per-page
    /Annots arrays of §12.5.6.5 /Link annotations with /A URI
    actions. Pure Arrow stage, no shuffle."""
    from docling_spark.sources.pdfsynth import synth_pdf_pages

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for pages, ls in zip(pdf["pages"], pdf["links"]):
                entries = [(int(e["page_idx"]), str(e["url"]))
                           for e in ls]
                blobs.append(synth_pdf_pages(
                    [list(p) for p in pages], links=entries))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "pdf": pd.Series(blobs, dtype=object)})

    return df.mapInPandas(batches, schema="doc_id string, pdf binary")


def pdf_links(df: DataFrame) -> DataFrame:
    """(doc_id, pdf:binary) → one row per URI link annotation:
    (doc_id, page_no, link_idx, url, l, t, r, b) in page-then-array
    order (parsers/pdfio.py::extract_pdf_links). URLs embedded in
    PDFs are a real outlink source the HTML-only link graph misses —
    this relation unions with html_links into the same host-graph /
    frontier rollups. Zero-shuffle mapInPandas; PDFs without
    annotations emit no rows, corrupt blobs are skipped."""
    from docling_spark.parsers.pdfio import extract_pdf_links

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf"]):
                if blob is None:
                    continue
                try:
                    entries = extract_pdf_links(bytes(blob))
                except Exception:
                    continue
                for e in entries:
                    rows.append((doc_id, e["page_no"], e["link_idx"],
                                 e["url"], e["l"], e["t"], e["r"],
                                 e["b"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page_no", "link_idx", "url",
                               "l", "t", "r", "b"])

    return df.mapInPandas(batches, schema=PDF_LINKS_DDL)
