"""DocTags parser parity vs the reference's 11 ``*.doctags.txt``
goldens: parsing each golden must reproduce the span sequence of its
groundtruth JSON under the DocTags serializer's traversal
(golden.doctags_view_spans). Also pins the OTSL table reconstruction
(spans, headers) and the round-trip with the engine's own renderer
(doctags_dialect.render_doctags_docling)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from docling_spark.doctags_dialect import render_doctags_docling
from docling_spark.doctree import flatten, table_grid
from docling_spark.golden import GROUNDTRUTH_DIR, doctags_view_spans
from docling_spark.parsers.doctags_parser import parse_doctags

DOCTAGS_GOLDENS = sorted(GROUNDTRUTH_DIR.glob("*.doctags.txt"))


@pytest.mark.parametrize(
    "path", DOCTAGS_GOLDENS, ids=[p.name for p in DOCTAGS_GOLDENS])
def test_doctags_golden_parity(path: Path):
    name = path.name[: -len(".doctags.txt")]
    gt = json.loads((GROUNDTRUTH_DIR / f"{name}.json").read_text())
    want = [(s["kind"], s["text"]) for s in doctags_view_spans(gt)]
    got = [(s["kind"], s["text"])
           for s in flatten(parse_doctags(path.read_text()))]
    assert got == want


def test_otsl_spans_and_headers():
    markup = (
        "<doctag><otsl><loc_10><loc_20><loc_400><loc_300>"
        "<ched>h1<lcel><ched>h2<nl>"
        "<fcel>a<fcel>b<ecel><nl>"
        "<fcel>tall<fcel>c<fcel>d<nl>"
        "<ucel><fcel>e<fcel>f<nl>"
        "<caption><loc_1><loc_2><loc_3><loc_4>Table 1</caption>"
        "</otsl>\n</doctag>")
    tree = parse_doctags(markup)
    table_node = tree.root.children[0]
    data = table_node.table
    assert (data.num_rows, data.num_cols) == (4, 3)
    grid = table_grid(data)
    # ched + lcel: h1 spans two columns in the header row
    assert grid[0][0].text == "h1" and grid[0][1].text == "h1"
    assert grid[0][0].col_span == 2 and grid[0][0].column_header
    assert grid[0][2].text == "h2"
    # ucel: 'tall' spans rows 2-3 in column 0
    assert grid[2][0].text == "tall" and grid[3][0].text == "tall"
    assert grid[2][0].row_span == 2
    # ecel stays an empty placeholder
    assert grid[1][2].text == ""
    spans = flatten(tree)
    assert [s["kind"] for s in spans] == ["table", "caption"]
    assert spans[1]["text"] == "Table 1"


def test_text_items_and_furniture():
    markup = (
        "<doctag><page_header><loc_1><loc_2><loc_3><loc_4>p. 7"
        "</page_header>\n"
        "<title><loc_1><loc_2><loc_3><loc_4>The Title</title>\n"
        "<section_header_level_2><loc_1><loc_2><loc_3><loc_4>Sec"
        "</section_header_level_2>\n"
        "<text>body with literal <td> token kept</text>\n"
        "<unordered_list><list_item><loc_1><loc_2><loc_3><loc_4>item one"
        "</list_item><list_item>item two</list_item></unordered_list>\n"
        "<code><loc_1><loc_2><loc_3><loc_4><_python_>print(1)</code>\n"
        "<formula><loc_1><loc_2><loc_3><loc_4>a/b</formula>\n"
        "<page_break>\n"
        "<page_footer>7</page_footer>\n"
        "</doctag>")
    spans = flatten(parse_doctags(markup))
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("title", "The Title"),
        ("section_header", "Sec"),
        ("text", "body with literal <td> token kept"),
        ("list_item", "item one"),
        ("list_item", "item two"),
        ("code", "print(1)"),
        ("formula", "a/b"),
    ]
    # heading level and code language survive into the tree
    items = [n for n in _walk(parse_doctags(markup))]
    sec = next(n for n in items if n.kind == "section_header")
    assert sec.level == 2
    code = next(n for n in items if n.kind == "code")
    assert code.name == "python"


def _walk(tree):
    stack = list(tree.root.children)
    while stack:
        n = stack.pop(0)
        yield n
        stack = n.children + stack


def test_render_parse_roundtrip():
    """Renderer (doctags_dialect, over raw DoclingDocument JSON) →
    parser → spans equals the doctags-view derivation of the same
    JSON: the two dialect halves agree on their shared surface."""
    doc = {
        "schema_name": "DoclingDocument",
        "pages": {"1": {"size": {"width": 500.0, "height": 500.0}}},
        "body": {"self_ref": "#/body", "children": [
            {"$ref": "#/texts/0"}, {"$ref": "#/groups/0"},
            {"$ref": "#/tables/0"}, {"$ref": "#/pictures/0"}]},
        "groups": [{"self_ref": "#/groups/0", "label": "list",
                    "children": [{"$ref": "#/texts/1"},
                                 {"$ref": "#/texts/2"}]}],
        "texts": [
            {"self_ref": "#/texts/0", "label": "section_header",
             "level": 1, "text": "Hello",
             "prov": [{"page_no": 1,
                       "bbox": {"l": 10, "t": 20, "r": 100, "b": 30,
                                "coord_origin": "TOPLEFT"}}]},
            {"self_ref": "#/texts/1", "label": "list_item",
             "text": "alpha"},
            {"self_ref": "#/texts/2", "label": "list_item",
             "text": "beta"},
            {"self_ref": "#/texts/3", "label": "caption",
             "text": "Tab"},
        ],
        "tables": [{"self_ref": "#/tables/0", "label": "table",
                    "captions": [{"$ref": "#/texts/3"}],
                    "children": [{"$ref": "#/texts/3"}],
                    "data": {"num_rows": 1, "num_cols": 2,
                             "table_cells": [
                                 {"start_row_offset_idx": 0,
                                  "start_col_offset_idx": 0,
                                  "end_row_offset_idx": 1,
                                  "end_col_offset_idx": 1,
                                  "text": "k", "column_header": True},
                                 {"start_row_offset_idx": 0,
                                  "start_col_offset_idx": 1,
                                  "end_row_offset_idx": 1,
                                  "end_col_offset_idx": 2,
                                  "text": "v", "column_header": True}]}}],
        "pictures": [{"self_ref": "#/pictures/0", "label": "picture"}],
    }
    markup = render_doctags_docling(doc)
    got = [(s["kind"], s["text"])
           for s in flatten(parse_doctags(markup))]
    want = [(s["kind"], s["text"]) for s in doctags_view_spans(doc)]
    assert got == want
    assert ("table", "1x2\nk\tv\nH:1\t1") in got
