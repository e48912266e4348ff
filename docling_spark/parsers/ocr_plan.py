"""OCR region planning + cell reconciliation, pure NumPy.

Re-implements the algorithmic half of the reference's OCR stage
(/root/reference/docling/models/base_ocr_model.py) without PIL/scipy/
rtree — the parts the reference computes itself, as opposed to the OCR
*engines* (easyocr/tesseract/…), which remain pluggable UDF slots:

* ``plan_ocr_regions`` (base_ocr_model.py:36-106): rasterize the page's
  bitmap rects into a binary mask, dilate by a 20×20 box (merging
  nearby images), label connected components, return their bounding
  boxes. Coverage > max(0.75, area_threshold) → one full-page box;
  coverage > area_threshold (default 0.05) → the component boxes;
  below → no OCR at all.
* ``reconcile_cells`` (base_ocr_model.py:109-144): drop every OCR cell
  whose bbox intersects any programmatic cell (the reference builds an
  R-tree; page-local n is tiny so a vectorized interval test is faster
  than tree construction), then append survivors to the programmatic
  cells.

The box dilation runs as an integral-image window sum (O(w·h), no
scipy ``binary_dilation`` needed); labeling is a run-based union-find.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

BITMAP_COVERAGE_THRESHOLD = 0.75
DEFAULT_AREA_THRESHOLD = 0.05
# 20x20 box structure, centered like scipy's default origin: offsets
# -10..+9 in both axes
_DILATE_BEFORE, _DILATE_AFTER = 10, 9

Box = Tuple[float, float, float, float]  # (l, t, r, b), TOPLEFT origin


def _rasterize(width: float, height: float,
               rects: Sequence[Box]) -> np.ndarray:
    h, w = round(height), round(width)
    mask = np.zeros((h, w), dtype=bool)
    for l, t, r, b in rects:
        x0, y0, x1, y1 = round(l), round(t), round(r), round(b)
        x0, x1 = max(x0, 0), min(x1, w - 1)
        y0, y1 = max(y0, 0), min(y1, h - 1)
        if x1 >= x0 and y1 >= y0:
            mask[y0:y1 + 1, x0:x1 + 1] = True
    return mask


def _dilate_box(mask: np.ndarray) -> np.ndarray:
    """Binary dilation with a rectangular structuring element via an
    integral-image window sum: a pixel turns on iff any source pixel
    lies within its (asymmetric) box neighborhood."""
    h, w = mask.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(mask, axis=0), axis=1, out=ii[1:, 1:])
    rows = np.arange(h)
    cols = np.arange(w)
    # neighborhood of pixel i: source rows [i-after, i+before] — the
    # transpose of the structure's reach
    r0 = np.clip(rows - _DILATE_AFTER, 0, h)
    r1 = np.clip(rows + _DILATE_BEFORE + 1, 0, h)
    c0 = np.clip(cols - _DILATE_AFTER, 0, w)
    c1 = np.clip(cols + _DILATE_BEFORE + 1, 0, w)
    win = (ii[np.ix_(r1, c1)] - ii[np.ix_(r0, c1)]
           - ii[np.ix_(r1, c0)] + ii[np.ix_(r0, c0)])
    return win > 0


def _label_components(mask: np.ndarray) -> List[Box]:
    """Connected components (4-connectivity, matching scipy label's
    default) via run-based union-find; returns inclusive bboxes in
    label order (top-to-bottom first occurrence, like find_objects)."""
    h, w = mask.shape
    parent: List[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    runs: List[List[Tuple[int, int, int]]] = []  # per row: (c0, c1, id)
    for y in range(h):
        row = mask[y]
        row_runs: List[Tuple[int, int, int]] = []
        xs = np.flatnonzero(np.diff(np.concatenate(
            ([0], row.view(np.int8), [0]))))
        for i in range(0, len(xs), 2):
            c0, c1 = int(xs[i]), int(xs[i + 1]) - 1
            rid = len(parent)
            parent.append(rid)
            row_runs.append((c0, c1, rid))
        if y > 0:
            for c0, c1, rid in row_runs:
                for p0, p1, pid in runs[y - 1]:
                    if p0 <= c1 and c0 <= p1:  # touching vertically
                        union(rid, pid)
        runs.append(row_runs)

    boxes: Dict[int, List[int]] = {}
    order: List[int] = []
    for y, row_runs in enumerate(runs):
        for c0, c1, rid in row_runs:
            root = find(rid)
            if root not in boxes:
                boxes[root] = [c0, y, c1, y]
                order.append(root)
            else:
                bb = boxes[root]
                bb[0] = min(bb[0], c0)
                bb[2] = max(bb[2], c1)
                bb[3] = max(bb[3], y)
    return [tuple(map(float, boxes[r])) for r in order]


def plan_ocr_regions_cov(
    width: float,
    height: float,
    bitmap_rects: Sequence[Box],
    *,
    area_threshold: float = DEFAULT_AREA_THRESHOLD,
    force_full_page: bool = False,
) -> Tuple[List[Box], float]:
    """Bitmap rects → (OCR query rects, dilated-mask coverage)
    (base_ocr_model.py:36-106). The coverage ride-along lets callers
    that report it (operators/render.plan_ocr) avoid rasterizing and
    dilating the page a second time — the mask pass is the stage's
    dominant cost on large pages."""
    if force_full_page:
        return [(0.0, 0.0, width, height)], 1.0
    if not bitmap_rects:
        return [], 0.0
    mask = _dilate_box(_rasterize(width, height, bitmap_rects))
    coverage = float(mask.sum()) / (width * height)
    if coverage > max(BITMAP_COVERAGE_THRESHOLD, area_threshold):
        return [(0.0, 0.0, width, height)], coverage
    if coverage > area_threshold:
        return _label_components(mask), coverage
    return [], coverage


def plan_ocr_regions(
    width: float,
    height: float,
    bitmap_rects: Sequence[Box],
    *,
    area_threshold: float = DEFAULT_AREA_THRESHOLD,
    force_full_page: bool = False,
) -> List[Box]:
    """Bitmap rects → OCR query rects (base_ocr_model.py:36-106)."""
    return plan_ocr_regions_cov(
        width, height, bitmap_rects,
        area_threshold=area_threshold,
        force_full_page=force_full_page)[0]


def reconcile_cells(ocr_cells: Sequence, programmatic_cells: Sequence,
                    *, force_full_page: bool = False) -> list:
    """Merge OCR output with programmatic text cells
    (base_ocr_model.py:109-144): any OCR cell intersecting any
    programmatic cell is dropped; survivors append after the
    programmatic cells. Cells need l/t/r/b attributes."""
    if force_full_page:
        return list(ocr_cells)
    if not programmatic_cells or not ocr_cells:
        return list(programmatic_cells) + list(ocr_cells)
    pl = np.array([c.l for c in programmatic_cells])
    pt = np.array([c.t for c in programmatic_cells])
    pr = np.array([c.r for c in programmatic_cells])
    pb = np.array([c.b for c in programmatic_cells])
    out = list(programmatic_cells)
    for cell in ocr_cells:
        hits = ((pl <= cell.r) & (cell.l <= pr)
                & (pt <= cell.b) & (cell.t <= pb))
        if not bool(hits.any()):
            out.append(cell)
    return out
