"""OCR region planning + reconciliation (SURVEY §2.4,
base_ocr_model.py:36-144 semantics in pure NumPy)."""

from docling_spark.parsers.ocr_plan import (
    plan_ocr_regions,
    reconcile_cells,
)
from docling_spark.parsers.pdf_page import Cell, parse_page
import json


def test_low_coverage_drops_all():
    # a 2x2 bitmap on a 100x100 page: coverage << 5% threshold
    assert plan_ocr_regions(100, 100, [(10, 10, 11, 11)]) == []


def test_full_page_when_dominant():
    regions = plan_ocr_regions(100, 100, [(0, 0, 99, 99)])
    assert regions == [(0.0, 0.0, 100.0, 100.0)]


def test_component_boxes_with_dilation_growth():
    # one 30x30 bitmap: ~9% coverage pre-dilation → component mode.
    # The 20x20 box dilation grows the bbox by 10 left/up, 9 right/down.
    regions = plan_ocr_regions(200, 200, [(50, 50, 79, 79)])
    assert len(regions) == 1
    l, t, r, b = regions[0]
    assert (l, t, r, b) == (40.0, 40.0, 88.0, 88.0)


def test_nearby_rects_merge_far_rects_split():
    # gap 15px < dilation reach (19) → merged into one region
    merged = plan_ocr_regions(300, 300, [(20, 20, 49, 49),
                                         (65, 20, 94, 49)])
    assert len(merged) == 1
    # gap 40px > reach → two regions
    split = plan_ocr_regions(300, 300, [(20, 20, 49, 49),
                                        (90, 100, 139, 149)])
    assert len(split) == 2


def test_force_full_page():
    assert plan_ocr_regions(80, 60, [], force_full_page=True) == \
        [(0.0, 0.0, 80.0, 60.0)]


def _cell(i, l, t, r, b):
    return Cell(i, f"c{i}", l, t, r, b)


def test_reconcile_drops_overlapping_ocr_cells():
    prog = [_cell(0, 10, 10, 50, 20)]
    ocr = [_cell(1, 40, 12, 80, 22),   # intersects prog → dropped
           _cell(2, 100, 100, 120, 110)]  # clear → kept
    out = reconcile_cells(ocr, prog)
    assert [c.index for c in out] == [0, 2]


def test_reconcile_force_full_page_uses_only_ocr():
    prog = [_cell(0, 0, 0, 10, 10)]
    ocr = [_cell(1, 0, 0, 10, 10)]
    out = reconcile_cells(ocr, prog, force_full_page=True)
    assert [c.index for c in out] == [1]


def test_parse_page_carries_planned_regions():
    payload = json.dumps({
        "page_no": 0, "width": 100.0, "height": 100.0,
        "cells": [{"index": 0, "text": "hello",
                   "l": 10, "t": 30, "r": 90, "b": 40}],
        "bitmap_rects": [{"l": 0, "t": 0, "r": 99, "b": 99}],
    })
    page = parse_page(payload)
    assert page["blocks"] == ["hello"]
    assert page["ocr_regions"] == [(0.0, 0.0, 100.0, 100.0)]
