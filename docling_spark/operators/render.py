"""Page render + OCR as Spark stages (SURVEY §2.4 OCR engine slot,
§2.5 page render slot — see parsers/raster.py for the engine and the
honesty note on the synthetic glyph atlas).

The reference renders pages once per document conversion and hands
bitmaps to OCR/enrichment models
(`/root/reference/docling/backend/pdf_backend.py` `get_page_image`,
`/root/reference/docling/models/easyocr_model.py` et al.). Here both
directions are zero-shuffle Arrow stages over the page-payload corpus
shape the whole paged pipeline shares: pages are independent rows, so
at 100 TB the stage scales with input splits and the only knob is
Arrow batch size (PNG blobs are tens of KB — keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest so a batch of
bitmaps fits the buffer, the same sizing note as operators/pdfnative).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RENDER_DDL = ("doc_id string, page_no int, width_px int, height_px int,"
              " n_cells int, n_glyphs int, png binary")
OCR_DDL = "doc_id string, page_no int, n_cells int, text string"


def render_pages(df: DataFrame, dpi: float = 72.0) -> DataFrame:
    """(doc_id, spans[kind=pdf_page]) → one row per page:
    (doc_id, page_no, width_px, height_px, n_cells, n_glyphs,
    png:binary). Real PNG bytes (verifiable with any reader, including
    operators/multimodal.parse_image_header). Zero-shuffle Arrow
    stage; ``dpi`` mirrors the reference's ``images_scale``."""
    from docling_spark.parsers.raster import png_encode, render_page

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "page_no": [], "width_px": [],
                   "height_px": [], "n_cells": [], "n_glyphs": [],
                   "png": []}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                for span in spans:
                    if span["kind"] != "pdf_page":
                        continue
                    page = json.loads(span["text"])
                    cells = page.get("cells") or []
                    img, drawn = render_page(
                        float(page.get("width", 612.0)),
                        float(page.get("height", 792.0)),
                        cells, dpi=dpi)
                    out["doc_id"].append(doc_id)
                    out["page_no"].append(int(page.get("page_no", 0)))
                    out["height_px"].append(img.shape[0])
                    out["width_px"].append(img.shape[1])
                    out["n_cells"].append(len(cells))
                    out["n_glyphs"].append(drawn)
                    out["png"].append(png_encode(img))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=RENDER_DDL)


def ocr_pages(df: DataFrame, dpi: float = 72.0) -> DataFrame:
    """(doc_id, page_no, png) → (doc_id, page_no, n_cells, text): run
    the deterministic template-matching engine over each bitmap;
    ``text`` joins recognized line cells in reading order with single
    spaces. Zero-shuffle Arrow stage. ``dpi`` must match the render
    DPI (it only rescales the returned bboxes; recognition is
    pixel-space)."""
    from docling_spark.parsers.raster import ocr_page, png_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "page_no": [], "n_cells": [],
                   "text": []}
            for doc_id, page_no, blob in zip(
                    pdf["doc_id"], pdf["page_no"], pdf["png"]):
                cells = ocr_page(png_decode(bytes(blob)), dpi=dpi)
                out["doc_id"].append(doc_id)
                out["page_no"].append(int(page_no))
                out["n_cells"].append(len(cells))
                out["text"].append(" ".join(c["text"] for c in cells))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=OCR_DDL)
