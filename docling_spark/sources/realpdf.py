"""Real-corpus PDF page source: the reference's own per-page cell
dumps (`tests/data/groundtruth/docling_v2/*.pages.json`) loaded into
the engine's (doc_id, spans) corpus shape.

Each fixture file is the list of `Page` models docling serialized
after a real conversion: per page the parsed text cells (quad rects +
text, datamodel/base_models.py via docling-core's SegmentedPdfPage),
the layout-model predictions (`predictions.layout.clusters`), and the
assembled groundtruth (`assembled.elements/body/headers`) this
engine's output is verified against.

The payload carries ONLY the inputs a conversion would have — cells
and model predictions. The `assembled` groundtruth is deliberately
NOT copied into the payload; it is read exclusively by the DuckDB
oracle / pytest side as the expected output.

Cell quads convert to bounding boxes exactly like the reference's
`rect.to_bounding_box()` (TOPLEFT origin: l/t = min, r/b = max over
the four corners) — the same rule `verify_cells`
(tests/verify_utils.py:59-88) applies before comparing.

Scale note: the 9 fixtures are driver-side reads by construction
(bounded, test corpus). The production-shape equivalent is a table
scan of the same payload column — `jobs/extract.py` consumes any
(doc_id, spans) frame, so swapping this loader for
``spark.read.table(...)`` changes nothing downstream.
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

REAL_PAGES_GLOB = (
    "/root/reference/tests/data/groundtruth/docling_v2/*.pages.json")


def quad_to_bbox(rect: dict) -> Tuple[float, float, float, float]:
    """Quad corners → (l, t, r, b), the reference's
    ``BoundingRectangle.to_bounding_box()`` for TOPLEFT pages."""
    xs = [rect["r_x0"], rect["r_x1"], rect["r_x2"], rect["r_x3"]]
    ys = [rect["r_y0"], rect["r_y1"], rect["r_y2"], rect["r_y3"]]
    return min(xs), min(ys), max(xs), max(ys)


def page_payload(page: dict) -> str:
    """One fixture Page → the engine's structured-page payload JSON:
    {page_no, width, height, cells[{index,text,l,t,r,b}],
    clusters[{id,label,confidence,l,t,r,b}]}. Cells keep the file
    (backend) order; clusters keep the stored prediction order."""
    cells = []
    for i, c in enumerate(page.get("cells", [])):
        l, t, r, b = quad_to_bbox(c["rect"])
        cells.append({"index": int(c.get("index", i)),
                      "text": c.get("text", ""),
                      "l": l, "t": t, "r": r, "b": b})
    clusters = []
    layout = (page.get("predictions") or {}).get("layout") or {}
    for i, cl in enumerate(layout.get("clusters") or []):
        bb = cl["bbox"]
        clusters.append({"id": int(cl.get("id", i)),
                         "label": str(cl.get("label", "text")),
                         "confidence": float(cl.get("confidence", 1.0)),
                         "l": bb["l"], "t": bb["t"],
                         "r": bb["r"], "b": bb["b"]})
    payload = {"page_no": int(page.get("page_no", 0)),
               "width": float(page["size"]["width"]),
               "height": float(page["size"]["height"]),
               "cells": cells}
    if clusters:
        payload["clusters"] = clusters
    return json.dumps(payload)


def fixture_docs(pattern: str = REAL_PAGES_GLOB) -> List[tuple]:
    """[(doc_id, [(kind, payload, media_ref, offset), ...]), ...]
    rows in the engine's INPUT_SCHEMA shape, one per fixture doc."""
    rows = []
    for path in sorted(glob.glob(pattern)):
        doc_id = os.path.basename(path)[: -len(".pages.json")]
        pages = json.loads(open(path, encoding="utf-8").read())
        spans = [("pdf_page", page_payload(p), "", int(p.get("page_no", i)))
                 for i, p in enumerate(pages)]
        rows.append((doc_id, spans))
    return rows


def corpus_real_pdf_pages(spark: SparkSession,
                          pattern: Optional[str] = None) -> DataFrame:
    """(doc_id, spans) corpus over the reference's real page dumps."""
    from ..schema import INPUT_SCHEMA

    return spark.createDataFrame(
        fixture_docs(pattern or REAL_PAGES_GLOB), schema=INPUT_SCHEMA)
