"""DocTags dialect byte-parity with the reference's own
``*.doctags.txt`` goldens (whole-string, the reference's
verify_export gate, tests/verify_utils.py:477-488). These pin the
loc-token quantization (0-500 page grid, one quad per prov), the OTSL
table cell stream, nested captions vs standalone code captions,
furniture interleaving and page breaks."""

import json
from pathlib import Path

import pytest

from docling_spark.doctags_dialect import render_doctags_docling

GT = Path("/root/reference/tests/data/groundtruth/docling_v2")
FIXTURES = sorted(p.name[: -len(".doctags.txt")]
                  for p in GT.glob("*.doctags.txt"))


@pytest.mark.parametrize("name", FIXTURES)
def test_doctags_golden_parity(name):
    doc = json.loads((GT / f"{name}.json").read_text())
    want = (GT / f"{name}.doctags.txt").read_text()
    assert render_doctags_docling(doc) == want


def test_fixture_set_is_nonempty():
    assert len(FIXTURES) == 11


def test_otsl_spans_and_empty_cells():
    doc = {
        "pages": {"1": {"size": {"width": 100.0, "height": 100.0}}},
        "body": {"self_ref": "#/body",
                 "children": [{"$ref": "#/tables/0"}]},
        "tables": [{
            "self_ref": "#/tables/0", "label": "table",
            "prov": [{"page_no": 1,
                      "bbox": {"l": 0, "t": 0, "r": 100, "b": 100,
                               "coord_origin": "TOPLEFT"}}],
            "data": {"num_rows": 2, "num_cols": 3, "table_cells": [
                {"start_row_offset_idx": 0, "start_col_offset_idx": 0,
                 "end_row_offset_idx": 1, "end_col_offset_idx": 3,
                 "text": "wide header", "column_header": True},
                {"start_row_offset_idx": 1, "start_col_offset_idx": 0,
                 "end_row_offset_idx": 2, "end_col_offset_idx": 1,
                 "text": "a", "column_header": False},
            ]},
        }],
    }
    out = render_doctags_docling(doc)
    # colspan-3 header: ched + two lcel; row 2: filled, then two
    # absent cells render ecel
    assert ("<ched>wide header<lcel><lcel><nl>"
            "<fcel>a<ecel><ecel><nl>") in out


def test_bottomleft_flip_and_clip():
    doc = {
        "pages": {"1": {"size": {"width": 200.0, "height": 100.0}}},
        "body": {"self_ref": "#/body",
                 "children": [{"$ref": "#/texts/0"}]},
        "texts": [{"self_ref": "#/texts/0", "label": "text",
                   "text": "x",
                   "prov": [{"page_no": 1,
                             "bbox": {"l": -5, "t": 90, "r": 300,
                                      "b": 10,
                                      "coord_origin": "BOTTOMLEFT"}}]}],
    }
    out = render_doctags_docling(doc)
    # l=-5 clips to 0; t: 100-90=10 → 50/500 grid = 50; r=300 clips to
    # 500; b: 100-10=90 → 450
    assert "<loc_0><loc_50><loc_500><loc_450>" in out
