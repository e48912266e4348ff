"""Golden-span derivation: Docling groundtruth JSON → ordered span list.

Implements the deterministic rule from FIXTURES.md §3 over the
serialized ``DoclingDocument`` fixtures in
/root/reference/tests/data/groundtruth/docling_v2/*.json (reading order
= depth-first body-tree order,
/root/reference/docs/concepts/docling_document.md:43-44).

This is the TEST-SIDE half of the correctness contract; the engine side
(docling_spark.doctree.flatten) serializes through the same canonical
table form so the gate reduces to exact span-sequence equality on
``(kind, text, media_ref, order)`` per doc_id (BASELINE.json:16).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

from .doctree import serialize_grid

GROUNDTRUTH_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")
TESTDATA_DIR = Path("/root/reference/tests/data")


def _resolve(doc: dict, ref: str) -> Optional[dict]:
    """Resolve a JSON-pointer-ish '$ref' like '#/texts/0'."""
    parts = ref.lstrip("#/").split("/")
    node = doc
    for p in parts:
        if isinstance(node, list):
            node = node[int(p)]
        elif isinstance(node, dict):
            node = node.get(p)
        else:
            return None
        if node is None:
            return None
    return node


def _table_text(item: dict) -> str:
    data = item.get("data", {})
    num_rows = int(data.get("num_rows", 0))
    num_cols = int(data.get("num_cols", 0))
    grid = data.get("grid")
    if grid is None and data.get("table_cells"):
        # docling-core derives ``grid`` from ``table_cells`` on load
        # (TableData.grid is a computed field); documents serialized
        # without it (e.g. our own export_docling_json) reconstruct the
        # same way: each cell fills its [start,end) row/col rectangle.
        grid = [[None] * num_cols for _ in range(num_rows)]
        for c in data["table_cells"]:
            for r in range(int(c.get("start_row_offset_idx", 0)),
                           min(int(c.get("end_row_offset_idx", 0)), num_rows)):
                for j in range(int(c.get("start_col_offset_idx", 0)),
                               min(int(c.get("end_col_offset_idx", 0)),
                                   num_cols)):
                    grid[r][j] = c
    grid = grid or []
    grid_texts = [[(c or {}).get("text", "") for c in row] for row in grid]
    header_flags = [bool((c or {}).get("column_header", False))
                    for c in (grid[0] if grid else [])]
    header_flags += [False] * (num_cols - len(header_flags))
    return serialize_grid(grid_texts, header_flags[:num_cols],
                          num_rows, num_cols)


def golden_spans(gt: dict, media_refs: Optional[List[str]] = None) -> List[dict]:
    """Flatten a groundtruth DoclingDocument dict into golden spans.

    ``media_refs``: ordered media refs the synthetic input interleaved
    with the document; the j-th emitted picture span gets the j-th ref
    (FIXTURES.md §3.4); absent → "".
    """
    spans: List[dict] = []
    media_refs = media_refs or []
    n_pics = 0

    def visit(ref: str) -> None:
        nonlocal n_pics
        item = _resolve(gt, ref)
        if item is None:
            return
        is_group = ref.startswith("#/groups") or ref in ("#/body", "#/furniture")
        in_body = item.get("content_layer", "body") == "body"
        if not is_group and in_body:
            if ref.startswith("#/texts"):
                spans.append({"kind": item.get("label", "text"),
                              "text": item.get("text", ""),
                              "media_ref": "", "offset": len(spans)})
            elif ref.startswith("#/pictures"):
                mref = media_refs[n_pics] if n_pics < len(media_refs) else ""
                n_pics += 1
                spans.append({"kind": "picture", "text": "",
                              "media_ref": mref, "offset": len(spans)})
            elif ref.startswith("#/tables"):
                spans.append({"kind": "table", "text": _table_text(item),
                              "media_ref": "", "offset": len(spans)})
            # key_value_items / form_items: absent from declarative-format
            # goldens; ignored here.
        for child in item.get("children", []):
            # schema v1.0 serializes child pointers as "$ref",
            # v1.3+ (the PDF groundtruths) as "cref"
            child_ref = (child.get("$ref") or child.get("cref")) \
                if isinstance(child, dict) else None
            if child_ref:
                visit(child_ref)

    visit("#/body")
    return spans


def doctags_view_spans(gt: dict) -> List[dict]:
    """Golden spans as the DocTags serializer sees the document — the
    parity target for parsers/doctags_parser.py against the reference's
    ``*.doctags.txt`` goldens. Differs from :func:`golden_spans` exactly
    where the serializer's traversal differs from the plain body DFS
    (dialect observed across all 11 goldens, doctags_dialect.py):

    * descendants of tables/pictures are NOT serialized (docling-core's
      ``traverse_pictures=False`` default) — except captions, which
      render nested inside the owner, so they re-appear right after it;
    * furniture is carried by label (``page_header``/``page_footer``
      tags), not by ``content_layer`` — the markup has no layer field.
    """
    spans: List[dict] = []

    def _emit(kind: str, text: str) -> None:
        spans.append({"kind": kind, "text": text, "media_ref": "",
                      "offset": len(spans)})

    def _captions(owner: dict) -> None:
        for cref in owner.get("captions") or []:
            ref = (cref.get("$ref") or cref.get("cref")) \
                if isinstance(cref, dict) else None
            cap = _resolve(gt, ref) if ref else None
            if cap is not None:
                _emit("caption", cap.get("text", ""))

    def visit(ref: str) -> None:
        item = _resolve(gt, ref)
        if item is None:
            return
        if ref.startswith("#/tables"):
            _emit("table", _table_text(item))
            _captions(item)
            return
        if ref.startswith("#/pictures"):
            _emit("picture", "")
            _captions(item)
            return
        is_group = (ref.startswith("#/groups")
                    or ref in ("#/body", "#/furniture"))
        if not is_group:
            label = item.get("label", "text")
            if label not in ("page_header", "page_footer"):
                _emit(label, item.get("text", ""))
        for child in item.get("children", []):
            child_ref = (child.get("$ref") or child.get("cref")) \
                if isinstance(child, dict) else None
            if child_ref:
                visit(child_ref)

    visit("#/body")
    return spans


def golden_hints(gt: dict) -> List[int]:
    """Structure hints aligned with :func:`golden_spans` order, the
    sidecar the hierarchical chunker consumes
    (operators/hierchunk.py): heading level for title/section_header
    spans (``SectionHeaderItem.level``, title = 0), owner-table span
    offset for caption spans bound via ``TableItem.captions`` refs,
    −1 elsewhere."""
    ref_to_off: dict = {}
    order: List[tuple] = []

    def visit(ref: str) -> None:
        item = _resolve(gt, ref)
        if item is None:
            return
        is_group = ref.startswith("#/groups") or ref in ("#/body",
                                                          "#/furniture")
        in_body = item.get("content_layer", "body") == "body"
        if not is_group and in_body and (
                ref.startswith("#/texts") or ref.startswith("#/pictures")
                or ref.startswith("#/tables")):
            ref_to_off[ref] = len(order)
            order.append((ref, item))
        for child in item.get("children", []):
            child_ref = (child.get("$ref") or child.get("cref")) \
                if isinstance(child, dict) else None
            if child_ref:
                visit(child_ref)

    visit("#/body")
    cap_owner: dict = {}
    for ref, item in order:
        if ref.startswith("#/tables"):
            for cr in item.get("captions") or []:
                r = (cr.get("$ref") or cr.get("cref")) \
                    if isinstance(cr, dict) else None
                if r in ref_to_off:
                    cap_owner[r] = ref_to_off[ref]
    hints: List[int] = []
    for ref, item in order:
        if ref.startswith("#/texts"):
            lbl = item.get("label", "text")
            if lbl == "title":
                hints.append(0)
            elif lbl == "section_header":
                hints.append(int(item.get("level", 1)))
            elif lbl == "caption" and ref in cap_owner:
                hints.append(cap_owner[ref])
            else:
                hints.append(-1)
        else:
            hints.append(-1)
    return hints


def load_golden(name: str, media_refs: Optional[List[str]] = None) -> List[dict]:
    """Load golden spans for a fixture, e.g. name='example_01.html'."""
    path = GROUNDTRUTH_DIR / f"{name}.json"
    with open(path, "r", encoding="utf-8") as f:
        gt = json.load(f)
    return golden_spans(gt, media_refs)


def fixture_names(suffix: str) -> List[str]:
    """All groundtruth fixture names with the given input suffix
    (e.g. '.html' → ['example_01.html', ...])."""
    out = []
    for p in sorted(GROUNDTRUTH_DIR.glob(f"*{suffix}.json")):
        out.append(p.name[: -len(".json")])
    return out


BINARY_SUFFIXES = {"docx", "xlsx", "pptx"}


def fixture_payload(name: str) -> str:
    """Raw input payload for a fixture name like 'example_01.html'.
    Binary container formats (docx/xlsx/pptx) return base64 text —
    the corpus carries them that way (FIXTURES.md §1)."""
    suffix = name.rsplit(".", 1)[-1]
    subdir = {"html": "html", "md": "md", "csv": "csv",
              "asciidoc": "asciidoc"}.get(suffix, suffix)
    path = TESTDATA_DIR / subdir / name
    if suffix in BINARY_SUFFIXES:
        import base64
        return base64.b64encode(path.read_bytes()).decode("ascii")
    return path.read_text(encoding="utf-8")
