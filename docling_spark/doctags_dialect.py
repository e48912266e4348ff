"""DocTags renderer over raw DoclingDocument JSON — byte-parity with
the reference's ``*.doctags.txt`` goldens
(``/root/reference/tests/data/groundtruth/docling_v2``, whole-string
compared by the reference's own ``verify_export`` gate,
tests/verify_utils.py:477-488). docling-core (the serializer's home)
is an external dependency of the reference; this module is
reverse-built from the shipped goldens, like md_dialect.py and
itxt_dialect.py.

Observed dialect rules (validated against all 11 goldens):

* document = ``<doctag>`` + each element's serialization terminated by
  ``\\n`` + ``</doctag>`` (no trailing newline). Open tags concatenate
  with the first following element; close tags land on their own line.
* element order = DFS over the BODY tree including furniture-layer
  items (page headers/footers are body children with
  ``content_layer: furniture``); ``<page_break>`` emitted whenever an
  item's first-prov page number changes.
* loc tokens: bbox converted to TOPLEFT origin, scaled to a 0-500 grid
  of the item's page size, ``round()``-ed and clipped —
  ``<loc_l><loc_t><loc_r><loc_b>`` immediately after the open tag.
* text-ish items: ``<{label}>{locs}{text}</{label}>`` with
  ``section_header`` → ``section_header_level_{level}``.
* lists: ``<unordered_list>``/``<ordered_list>`` wrapper, children
  serialized inside; other group labels are transparent.
* picture: nested ``<caption>`` (rendered off the ``captions`` ref
  list); pictures never dump classification tokens in the goldens.
* code: ``<code>{locs}<_{language}_>{text}</code>``; its caption is a
  separate body-tree element, not nested.
* table: ``<otsl>{locs}`` + OTSL cell stream (``<ched>`` column
  header, ``<rhed>`` row header, ``<srow>`` section row, ``<fcel>``
  filled, ``<ecel>`` empty, ``<lcel>`` left-span continuation,
  ``<ucel>`` up-span continuation, ``<xcel>`` both, ``<nl>`` row
  terminator) + nested ``<caption>`` + ``</otsl>``.
"""

from __future__ import annotations

from typing import Dict, List, Optional


def _ref(obj: dict) -> Optional[str]:
    if not isinstance(obj, dict):
        return None
    return obj.get("cref") or obj.get("$ref")


def _resolve(doc: dict, ref: str) -> dict:
    node = doc
    for part in ref.lstrip("#/").split("/"):
        node = node[int(part)] if part.isdigit() else node[part]
    return node


def _locs(doc: dict, item: dict) -> str:
    def q(v: float, dim: float) -> int:
        return min(500, max(0, round(v / dim * 500)))

    out = ""
    for p in item.get("prov") or []:  # one loc quad PER prov entry
        page = doc.get("pages", {}).get(str(p["page_no"]))
        if not page:
            continue
        w = page["size"]["width"]
        h = page["size"]["height"]
        bb = p["bbox"]
        left, right = bb["l"], bb["r"]
        if bb.get("coord_origin") == "BOTTOMLEFT":
            top, bottom = h - bb["t"], h - bb["b"]
        else:
            top, bottom = bb["t"], bb["b"]
        out += (f"<loc_{q(left, w)}><loc_{q(top, h)}>"
                f"<loc_{q(right, w)}><loc_{q(bottom, h)}>")
    return out


def _page_of(item: dict) -> Optional[int]:
    prov = item.get("prov") or []
    return prov[0]["page_no"] if prov else None


def _otsl_cells(table_data: dict) -> str:
    nrows = table_data.get("num_rows", 0)
    ncols = table_data.get("num_cols", 0)
    grid: Dict[tuple, dict] = {}
    for cell in table_data.get("table_cells", []):
        r0 = cell.get("start_row_offset_idx", 0)
        c0 = cell.get("start_col_offset_idx", 0)
        r1 = cell.get("end_row_offset_idx", r0 + 1)
        c1 = cell.get("end_col_offset_idx", c0 + 1)
        for r in range(r0, r1):
            for c in range(c0, c1):
                grid[(r, c)] = cell
    parts: List[str] = []
    for r in range(nrows):
        for c in range(ncols):
            cell = grid.get((r, c))
            if cell is None:
                parts.append("<ecel>")
                continue
            r0 = cell.get("start_row_offset_idx", 0)
            c0 = cell.get("start_col_offset_idx", 0)
            if r == r0 and c == c0:
                text = (cell.get("text") or "").strip()
                if cell.get("column_header"):
                    tok = "<ched>"
                elif cell.get("row_header"):
                    tok = "<rhed>"
                elif cell.get("row_section"):
                    tok = "<srow>"
                elif text:
                    tok = "<fcel>"
                else:
                    tok = "<ecel>"
                parts.append(tok + text if tok != "<ecel>" else tok)
            elif r == r0:
                parts.append("<lcel>")
            elif c == c0:
                parts.append("<ucel>")
            else:
                parts.append("<xcel>")
        parts.append("<nl>")
    return "".join(parts)


def _caption_str(doc: dict, owner: dict) -> str:
    out = ""
    for cref in owner.get("captions") or []:
        ref = _ref(cref)
        if not ref:
            continue
        cap = _resolve(doc, ref)
        out += (f"<caption>{_locs(doc, cap)}"
                f"{cap.get('text', '')}</caption>")
    return out


def render_doctags_docling(doc: dict) -> str:
    out: List[str] = ["<doctag>"]
    cur_page: Optional[int] = None

    def emit(item: dict) -> None:
        nonlocal cur_page
        page = _page_of(item)
        if page is not None:
            if cur_page is not None and page != cur_page:
                out.append("<page_break>\n")
            cur_page = page
        ref = item.get("self_ref", "")
        locs = _locs(doc, item)
        if ref.startswith("#/tables"):
            cells = _otsl_cells(item.get("data") or {})
            out.append(f"<otsl>{locs}{cells}"
                       f"{_caption_str(doc, item)}</otsl>\n")
            return
        if ref.startswith("#/pictures"):
            out.append(f"<picture>{locs}"
                       f"{_caption_str(doc, item)}</picture>\n")
            return
        label = item.get("label", "text")
        if label == "section_header":
            tag = f"section_header_level_{item.get('level', 1)}"
        else:
            tag = label
        text = item.get("text", "")
        if label == "code":
            lang = item.get("code_language", "unknown")
            out.append(f"<code>{locs}<_{lang}_>{text}</code>\n")
            return
        out.append(f"<{tag}>{locs}{text}</{tag}>\n")

    def visit(item: dict) -> None:
        children = item.get("children") or []
        ref_self = item.get("self_ref", "")
        if ref_self.startswith(("#/tables", "#/pictures")):
            # captions render nested inside the owner; all other
            # descendants of pictures/tables are skipped (the
            # serializer's traverse_pictures=False default — picture
            # sub-items never appear in the goldens). Code captions,
            # by contrast, stay standalone tree children.
            children = []
        is_group = ref_self.startswith("#/groups")
        label = item.get("label", "")
        wrapper = None
        if is_group and label == "list":
            wrapper = "unordered_list"
        elif is_group and label == "ordered_list":
            wrapper = "ordered_list"
        if wrapper:
            out.append(f"<{wrapper}>")
        if not is_group and item.get("self_ref") not in ("#/body",
                                                         "#/furniture"):
            emit(item)
        for c in children:
            ref = _ref(c)
            if ref:
                visit(_resolve(doc, ref))
        if wrapper:
            out.append(f"</{wrapper}>\n")

    visit(doc["body"])
    out.append("</doctag>")
    return "".join(out)
