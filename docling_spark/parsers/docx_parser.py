"""DOCX parser — zipfile + xml.etree re-implementation of the
reference's Word backend
(/root/reference/docling/backend/msword_backend.py).

Reproduced behaviors (reference line cites):
* linear body walk: tables / inline images (a:blip) / sdt containers /
  paragraphs (msword_backend.py:159-199)
* style→label+level parse ("Heading 2" etc., msword_backend.py:236-262)
* numbering (numId/ilvl) → list nesting state machine
  (msword_backend.py:217-234, 449-551) — is_numbered is hardcoded False
  in the reference (msword_backend.py:303), markers stay empty
* heading hierarchy with synthetic section groups
  (msword_backend.py:419-447)
* table grid with gridSpan/vMerge resolution, repeated-cell skip, and
  the 1x1-table body-unwrap rule (msword_backend.py:552-614)
* pictures from a:blip drawings (msword_backend.py:616-647) — media
  bytes are opaque here, picture spans carry no media_ref by default

* OMML equations → LaTeX (msword_backend.py:264-283 text/equation
  interleave + the standalone/inline split :349-389), converted by the
  stdlib walker in parsers/omml.py; if the plain text cannot be
  reconstructed from the runs the paragraph falls back to raw text with
  no equations, exactly like the reference.

Pure stdlib — runs inside Arrow-batched pandas UDF workers.
"""

from __future__ import annotations

import base64
import io
import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

from ..doctree import DocTree, Node, TableCell, TableData

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
M = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

MAX_LEVELS = 10


# ---------------------------------------------------------------------------
# minimal OPC/docx reading


def _read_docx(data: bytes):
    """Returns (body_element, default_style_id, style_map)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    doc_root = ET.fromstring(zf.read("word/document.xml"))
    body = doc_root.find(f"{W}body")
    default_style = "Normal"
    styles: Dict[str, ET.Element] = {}
    try:
        styles_root = ET.fromstring(zf.read("word/styles.xml"))
        for st in styles_root.findall(f"{W}style"):
            sid = st.get(f"{W}styleId")
            if sid:
                styles[sid] = st
            if (st.get(f"{W}type") == "paragraph"
                    and st.get(f"{W}default") in ("1", "true")):
                default_style = sid or "Normal"
    except KeyError:
        pass
    return body, default_style, styles


def _paragraph_text(p: ET.Element) -> str:
    """python-docx Paragraph.text semantics: run text with w:tab → \\t
    and w:br / w:cr → \\n, hyperlink runs included."""
    parts: List[str] = []
    for r in p.iter(f"{W}r"):
        for child in r:
            tag = child.tag
            if tag == f"{W}t":
                parts.append(child.text or "")
            elif tag == f"{W}tab":
                parts.append("\t")
            elif tag in (f"{W}br", f"{W}cr"):
                parts.append("\n")
    return "".join(parts)


def _equations_in_text(p: ET.Element, raw_text: str):
    """Interleave run text with converted equations
    (msword_backend.py:264-283). Returns (text, equations); when the
    plain runs can't reconstruct the paragraph text (tabs/breaks), the
    raw text passes through untouched with no equations."""
    from .omml import omml_to_latex

    only_texts: List[str] = []
    interleaved: List[str] = []
    equations: List[str] = []
    for sub in p.iter():
        if sub.tag == f"{W}t":
            only_texts.append(sub.text or "")
            interleaved.append(sub.text or "")
        elif sub.tag == f"{M}oMath":
            latex = omml_to_latex(sub)
            equations.append(latex)
            interleaved.append(latex)
    if "".join(only_texts).strip() != raw_text.strip():
        return raw_text, []
    return "".join(interleaved), equations


def _style_id(p: ET.Element, default_style: str) -> str:
    ps = p.find(f"{W}pPr/{W}pStyle")
    if ps is not None:
        return ps.get(f"{W}val") or default_style
    return default_style


def _num_id_and_ilvl(p: ET.Element):
    """(numId, ilvl) from any descendant w:numPr
    (msword_backend.py:217-234)."""
    num_pr = p.find(f".//{W}numPr")
    if num_pr is None:
        return None, None

    def geti(tag):
        el = num_pr.find(f"{W}{tag}")
        if el is None:
            return None
        try:
            return int(el.get(f"{W}val"))
        except (TypeError, ValueError):
            return 0

    return geti("numId"), geti("ilvl")


_SPLIT_RE = re.compile(r"(\D+)(\d+)$|^(\d+)(\D+)")


def _label_and_level(style_id: str):
    """Style id → (label, level) (msword_backend.py:236-262)."""
    if not style_id:
        return "Normal", None
    if ":" in style_id:
        parts = style_id.split(":")
        if len(parts) == 2:
            try:
                return parts[0], int(parts[1])
            except ValueError:
                return parts[0], 0
    m = _SPLIT_RE.match(style_id)
    parts = [g for g in m.groups() if g] if m else [style_id]
    if "Heading" in style_id and len(parts) == 2:
        parts.sort()
        if parts[0] == "Heading":
            other = parts[1]
        elif parts[1] == "Heading":
            other = parts[0]
        else:
            return style_id, None
        try:
            lvl = int(other)
        except ValueError:
            lvl = 0
        return "Heading", lvl
    return style_id, None


# ---------------------------------------------------------------------------
# walker (ports the reference's parents/history state machine)


class _DocxWalker:
    def __init__(self, default_style: str) -> None:
        self.tree = DocTree()
        self.default_style = default_style
        self.parents: Dict[int, Optional[Node]] = {
            i: None for i in range(-1, MAX_LEVELS)}
        self.level = 0
        self.level_at_new_list: Optional[int] = None
        self.list_iter = 0
        self.history = {"names": [None], "levels": [None],
                        "numids": [None], "indents": [None]}

    # -- history helpers ---------------------------------------------------

    def _update_history(self, name, level, numid, ilevel):
        self.history["names"].append(name)
        self.history["levels"].append(level)
        self.history["numids"].append(numid)
        self.history["indents"].append(ilevel)

    def _prev_numid(self):
        return self.history["numids"][-1]

    def _prev_indent(self):
        return self.history["indents"][-1]

    def _get_level(self) -> int:
        for k in range(MAX_LEVELS):
            if self.parents.get(k) is None:
                return k
        return 0

    # -- body walk (msword_backend.py:159-199) -------------------------------

    def walk(self, body: ET.Element) -> None:
        for element in body:
            tag = element.tag.split("}")[-1]
            blips = element.findall(f".//{A}blip")
            if tag == "tbl":
                try:
                    self._handle_table(element)
                except Exception:
                    pass  # broken docx table → skipped, like the reference
            elif blips:
                self._handle_picture()
            elif tag == "sdt":
                content = element.find(f".//{W}sdtContent")
                if content is not None:
                    for p in content.findall(f".//{W}p"):
                        self._handle_text(p)
            elif tag == "p":
                self._handle_text(element)

    # -- text / headings / lists (msword_backend.py:285-418) ----------------

    def _handle_text(self, p: ET.Element) -> None:
        raw_text = _paragraph_text(p)
        text, equations = _equations_in_text(p, raw_text)
        text = text.strip()
        style_id = _style_id(p, self.default_style)
        p_style_id, p_level = _label_and_level(style_id)
        numid, ilevel = _num_id_and_ilvl(p)
        if numid == 0:
            numid = None

        if (numid is not None and ilevel is not None
                and p_style_id not in ("Title", "Heading")):
            self._add_listitem(numid, ilevel, text)
            self._update_history(p_style_id, p_level, numid, ilevel)
            return
        elif (numid is None and self._prev_numid() is not None
                and p_style_id not in ("Title", "Heading")):  # close list
            if self.level_at_new_list:
                for key in list(self.parents):
                    if key >= self.level_at_new_list:
                        self.parents[key] = None
                self.level = self.level_at_new_list - 1
                self.level_at_new_list = None
            else:
                for key in list(self.parents):
                    self.parents[key] = None
                self.level = 0

        if p_style_id == "Title":
            for key in list(self.parents):
                self.parents[key] = None
            self.parents[0] = self.tree.add_title(text)
        elif "Heading" in p_style_id:
            self._add_header(p_level, text)
        elif equations:
            self._add_equations(raw_text, text, equations)
        else:
            # every other style → paragraph (msword_backend.py:389-418)
            level = self._get_level()
            self.tree.add_text("paragraph", text,
                               parent=self.parents[level - 1])

        self._update_history(p_style_id, p_level, numid, ilevel)

    def _add_equations(self, raw_text: str, text: str,
                       equations: List[str]) -> None:
        """Standalone vs inline equations (msword_backend.py:349-389):
        a paragraph with no run text is one formula item; otherwise the
        combined text splits around each equation into an inline group
        of paragraph/formula slices."""
        level = self._get_level()
        if not raw_text and text:
            self.tree.add_text("formula", text,
                               parent=self.parents[level - 1])
            return
        group = self.tree.add_group("inline",
                                    parent=self.parents[level - 1])
        remaining = text
        for eq in equations:
            if not remaining:
                break
            before, _, remaining = remaining.partition(eq)
            if before:
                self.tree.add_text("paragraph", before, parent=group)
            self.tree.add_text("formula", eq, parent=group)
        if remaining:
            self.tree.add_text("paragraph", remaining, parent=group)

    def _add_header(self, curr_level: Optional[int], text: str) -> None:
        level = self._get_level()
        if isinstance(curr_level, int):
            if curr_level > level:
                for i in range(level, curr_level):
                    self.parents[i] = self.tree.add_group(
                        "section", name=f"header-{i}",
                        parent=self.parents[i - 1])
            elif curr_level < level:
                for key in list(self.parents):
                    if key >= curr_level:
                        self.parents[key] = None
            self.parents[curr_level] = self.tree.add_heading(
                text, curr_level, parent=self.parents[curr_level - 1])
        else:
            self.parents[self.level] = self.tree.add_heading(
                text, 1, parent=self.parents[self.level - 1])

    def _add_listitem(self, numid: int, ilevel: int, text: str) -> None:
        # msword_backend.py:449-551 (is_numbered hardcoded False there)
        level = self._get_level()
        prev_indent = self._prev_indent()
        if self._prev_numid() is None:  # open new list
            self.level_at_new_list = level
            self.parents[level] = self.tree.add_group(
                "list", name="list", parent=self.parents[level - 1])
            self.list_iter += 1
            self.tree.add_list_item(text, parent=self.parents[level])
        elif (self._prev_numid() == numid
                and self.level_at_new_list is not None
                and prev_indent is not None and prev_indent < ilevel):
            for i in range(self.level_at_new_list + prev_indent + 1,
                           self.level_at_new_list + ilevel + 1):
                self.list_iter = 0
                self.parents[i] = self.tree.add_group(
                    "list", name="list", parent=self.parents[i - 1])
            self.list_iter += 1
            self.tree.add_list_item(
                text, parent=self.parents[self.level_at_new_list + ilevel])
        elif (self._prev_numid() == numid
                and self.level_at_new_list is not None
                and prev_indent is not None and ilevel < prev_indent):
            for k in list(self.parents):
                if k > self.level_at_new_list + ilevel:
                    self.parents[k] = None
            self.list_iter += 1
            self.tree.add_list_item(
                text, parent=self.parents[self.level_at_new_list + ilevel])
            self.list_iter = 0
        elif self._prev_numid() == numid or prev_indent == ilevel:
            self.list_iter += 1
            self.tree.add_list_item(text, parent=self.parents[level - 1])

    # -- tables (msword_backend.py:552-614) ----------------------------------

    def _handle_table(self, tbl: ET.Element) -> None:
        grid = tbl.find(f"{W}tblGrid")
        num_cols = len(grid.findall(f"{W}gridCol")) if grid is not None else 0
        trs = tbl.findall(f"{W}tr")
        num_rows = len(trs)

        # resolve the tc occupying each (row, col) slot, python-docx style
        slots: List[List[Optional[ET.Element]]] = []
        for r_idx, tr in enumerate(trs):
            row_slots: List[Optional[ET.Element]] = [None] * num_cols
            col = 0
            for tc in tr.findall(f"{W}tc"):
                span_el = tc.find(f"{W}tcPr/{W}gridSpan")
                span = int(span_el.get(f"{W}val")) if span_el is not None \
                    else 1
                vmerge_el = tc.find(f"{W}tcPr/{W}vMerge")
                resolved = tc
                if vmerge_el is not None and \
                        (vmerge_el.get(f"{W}val") or "continue") != "restart":
                    if r_idx > 0 and col < num_cols:
                        resolved = slots[r_idx - 1][col]
                for c in range(col, min(col + span, num_cols)):
                    row_slots[c] = resolved
                col += span
            slots.append(row_slots)

        if num_rows == 1 and num_cols == 1 and slots and slots[0][0] is not None:
            # 1x1 table: unwrap content into the body
            self.walk(slots[0][0])
            return

        span_of: Dict[int, int] = {}
        for tr in trs:
            for tc in tr.findall(f"{W}tc"):
                span_el = tc.find(f"{W}tcPr/{W}gridSpan")
                span_of[id(tc)] = int(span_el.get(f"{W}val")) \
                    if span_el is not None else 1

        data = TableData(num_rows=num_rows, num_cols=num_cols, cells=[])
        seen: set = set()
        for row_idx in range(num_rows):
            col_idx = 0
            while col_idx < num_cols:
                tc = slots[row_idx][col_idx]
                if tc is None:
                    col_idx += 1
                    continue
                grid_span = span_of.get(id(tc), 1)
                if id(tc) in seen:
                    col_idx += grid_span
                    continue
                seen.add(id(tc))
                spanned_idx = row_idx + 1
                while (spanned_idx < num_rows
                       and slots[spanned_idx][col_idx] is tc):
                    spanned_idx += 1
                cell_text = "\n".join(
                    _paragraph_text(p) for p in tc.findall(f"{W}p"))
                data.cells.append(TableCell(
                    text=cell_text,
                    row_span=spanned_idx - row_idx,
                    col_span=grid_span,
                    start_row=row_idx,
                    start_col=col_idx,
                    column_header=(row_idx == 0)))
                col_idx += grid_span

        level = self._get_level()
        self.tree.add_table(data, parent=self.parents[level - 1])

    def _handle_picture(self) -> None:
        level = self._get_level()
        self.tree.add_picture(parent=self.parents[level - 1], media_ref="")


def parse_docx_document(payload: str) -> DocTree:
    """Base64-encoded .docx bytes → DocTree."""
    data = base64.b64decode(payload)
    body, default_style, _styles = _read_docx(data)
    walker = _DocxWalker(default_style)
    if body is not None:
        walker.walk(body)
    return walker.tree
