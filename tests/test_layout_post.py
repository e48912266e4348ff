"""Layout postprocessor (SURVEY §2.4, layout_postprocessor.py:159-670
semantics): confidence gates, cell assignment, orphan promotion,
overlap dedup preferences, special-cluster rules, ordering."""

import json

from docling_spark.parsers.layout_post import (
    LayoutCluster,
    postprocess_layout,
)
from docling_spark.parsers.pdf_page import Cell, parse_pdf_pages


def C(i, text, l, t, r, b):
    return Cell(i, text, l, t, r, b)


def LC(id, label, bbox, conf):
    return LayoutCluster(id=id, label=label, bbox=bbox, confidence=conf)


PAGE = (612.0, 792.0)


def test_confidence_gate_and_orphan_promotion():
    cells = [C(0, "kept", 10, 10, 100, 20)]
    clusters = [LC(1, "text", (5, 5, 105, 25), 0.3)]  # below 0.5 → dropped
    out = postprocess_layout(cells, clusters, PAGE)
    assert len(out) == 1
    assert out[0].label == "text"          # orphan cell became TEXT
    assert out[0].id == 2                  # max id + 1
    assert [c.index for c in out[0].cells] == [0]


def test_title_remap_and_cell_assignment():
    cells = [C(0, "Heading", 10, 10, 100, 20),
             C(1, "Body", 10, 30, 100, 40)]
    clusters = [LC(1, "title", (5, 5, 105, 25), 0.9),
                LC(2, "text", (5, 28, 105, 42), 0.9)]
    out = postprocess_layout(cells, clusters, PAGE)
    assert [c.label for c in out] == ["section_header", "text"]
    assert [c.cells[0].index for c in out] == [0, 1]


def test_overlap_dedup_merges_cells_into_best():
    cells = [C(0, "a", 10, 10, 50, 20), C(1, "b", 10, 22, 50, 32)]
    # two near-identical TEXT proposals; higher-confidence one wins
    clusters = [LC(1, "text", (8, 8, 52, 34), 0.95),
                LC(2, "text", (9, 9, 52, 34), 0.6)]
    out = postprocess_layout(cells, clusters, PAGE)
    assert len(out) == 1
    assert out[0].confidence == 0.95
    assert [c.index for c in out[0].cells] == [0, 1]


def test_list_item_survives_similar_text_despite_lower_confidence():
    # rule 1 (:409-418): a LOW-confidence LIST_ITEM with area within 20%
    # of a higher-confidence TEXT still passes the preference rules;
    # without the rule the area/conf fallback would eliminate it.
    from docling_spark.parsers.layout_post import _remove_overlapping

    li = LC(1, "list_item", (12, 10, 102, 20), 0.55)
    li.cells = [C(0, "bullet", 12, 10, 102, 20)]
    tx = LC(2, "text", (10, 10, 100, 20), 0.9)
    tx.cells = [C(1, "tail", 10, 10, 100, 20)]
    out = _remove_overlapping([li, tx], "regular")
    assert [c.label for c in out] == ["list_item"]
    assert [c.index for c in out[0].cells] == [0, 1]  # cells merged

    # control: same geometry/confidences WITHOUT the list_item label —
    # the area/conf fallback kills the low-confidence candidate
    lo = LC(1, "caption", (12, 10, 102, 20), 0.55)
    lo.cells = [C(0, "x", 12, 10, 102, 20)]
    hi = LC(2, "text", (10, 10, 100, 20), 0.9)
    hi.cells = [C(1, "y", 10, 10, 100, 20)]
    out2 = _remove_overlapping([lo, hi], "regular")
    assert [c.label for c in out2] == ["text"]


def test_full_page_picture_dropped():
    cells = [C(0, "txt", 10, 10, 100, 20)]
    clusters = [LC(1, "text", (5, 5, 105, 25), 0.9),
                LC(2, "picture", (0, 0, 612, 780), 0.9)]  # >90% page
    out = postprocess_layout(cells, clusters, PAGE)
    assert [c.label for c in out] == ["text"]


def test_wrapper_dropped_when_nearly_identical_to_table():
    cells = [C(0, "t", 10, 10, 200, 100)]
    clusters = [LC(1, "table", (10, 10, 200, 100), 0.9),
                LC(2, "key_value_region", (11, 11, 200, 100), 0.9)]
    out = postprocess_layout(cells, clusters, PAGE)
    assert [c.label for c in out] == ["table"]


def test_contained_regulars_become_children_of_wrapper():
    cells = [C(0, "k", 20, 20, 60, 30), C(1, "v", 20, 40, 60, 50)]
    clusters = [LC(1, "text", (20, 20, 60, 30), 0.9),
                LC(2, "text", (20, 40, 60, 50), 0.9),
                LC(3, "form", (10, 10, 80, 70), 0.9)]
    out = postprocess_layout(cells, clusters, PAGE)
    assert [c.label for c in out] == ["form"]
    assert [ch.id for ch in out[0].children] == [1, 2]
    # FORM bbox shrinks to the union of its children
    assert out[0].bbox == (20, 20, 60, 50)
    assert [c.index for c in out[0].cells] == [0, 1]


def test_reading_order_by_min_cell_index():
    cells = [C(0, "second visually", 10, 100, 100, 110),
             C(1, "first visually", 10, 10, 100, 20)]
    clusters = [LC(1, "text", (10, 100, 100, 110), 0.9),
                LC(2, "text", (10, 10, 100, 20), 0.9)]
    out = postprocess_layout(cells, clusters, PAGE)
    # native cell index wins over geometry (:644-670)
    assert [c.cells[0].index for c in out] == [0, 1]


def test_model_driven_page_path():
    payload = json.dumps({
        "page_no": 0, "width": 612.0, "height": 792.0,
        "cells": [
            {"index": 0, "text": "Section One",
             "l": 50, "t": 50, "r": 300, "b": 62},
            {"index": 1, "text": "Body text here.",
             "l": 50, "t": 80, "r": 300, "b": 92},
        ],
        "clusters": [
            {"id": 1, "label": "section_header", "confidence": 0.9,
             "l": 45, "t": 45, "r": 305, "b": 66},
            {"id": 2, "label": "text", "confidence": 0.9,
             "l": 45, "t": 76, "r": 305, "b": 96},
        ],
    })
    spans = [(s["kind"], s["text"]) for s in
             __import__("docling_spark.doctree", fromlist=["flatten"])
             .flatten(parse_pdf_pages([payload]))]
    assert spans == [("section_header", "Section One"),
                     ("text", "Body text here.")]


def test_caption_binds_to_nearest_picture():
    # caption cell appears FIRST in native index order, but binds to the
    # picture it sits under and follows it in the emitted sequence
    payload = json.dumps({
        "page_no": 0, "width": 612.0, "height": 792.0,
        "cells": [
            {"index": 0, "text": "Figure 1: a duck",
             "l": 50, "t": 210, "r": 300, "b": 222},
            {"index": 1, "text": "Body paragraph.",
             "l": 50, "t": 400, "r": 300, "b": 412},
        ],
        "clusters": [
            {"id": 1, "label": "picture", "confidence": 0.9,
             "l": 50, "t": 80, "r": 300, "b": 200},
            {"id": 2, "label": "caption", "confidence": 0.9,
             "l": 48, "t": 205, "r": 305, "b": 226},
            {"id": 3, "label": "text", "confidence": 0.9,
             "l": 45, "t": 396, "r": 305, "b": 416},
        ],
    })
    from docling_spark.doctree import flatten
    spans = [(s["kind"], s["text"]) for s in
             flatten(parse_pdf_pages([payload]))]
    assert spans == [("picture", ""),
                     ("caption", "Figure 1: a duck"),
                     ("text", "Body paragraph.")]
