"""PPTX parser — zipfile + xml.etree re-implementation of the
reference's PowerPoint backend
(/root/reference/docling/backend/mspowerpoint_backend.py).

Reproduced behaviors (reference line cites):
* per-slide chapter group "slide-{i}" in sldIdLst order
  (mspowerpoint_backend.py:382-391)
* shape walk: groups recurse first, then table / picture / text
  (mspowerpoint_backend.py:393-427)
* text-frame state machine (mspowerpoint_backend.py:126-256):
  bullet detection via explicit a:buChar / a:buAutoNum in the
  paragraph; run accumulation into paragraph vs list-item buffers;
  ONE list group per shape; title only for ctrTitle/title placeholders
  (the reference's SUBTITLE branch is a no-op statement — subtitles
  fall through to paragraph, bug-compatible)
* tables: per-cell rowSpan/gridSpan, cells with empty text omitted
  (mspowerpoint_backend.py:302-376)
* notes slides → furniture (not emitted in body spans)

Pure stdlib — runs inside Arrow-batched pandas UDF workers.
"""

from __future__ import annotations

import base64
import io
import zipfile
import xml.etree.ElementTree as ET
from typing import List, Optional

from ..doctree import DocTree, Node, TableCell, TableData

A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKGREL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _run_text(r: ET.Element) -> str:
    t = r.find(f"{A}t")
    return t.text or "" if t is not None else ""


def _shape_text(sp: ET.Element) -> str:
    tx = sp.find(f"{P}txBody")
    if tx is None:
        return ""
    paras = []
    for p in tx.findall(f"{A}p"):
        paras.append("".join(_run_text(r) for r in p.iter(f"{A}r")))
    return "\n".join(paras)


def _placeholder_type(sp: ET.Element) -> Optional[str]:
    ph = sp.find(f"{P}nvSpPr/{P}nvPr/{P}ph")
    if ph is None:
        return None
    return ph.get("type", "body")


class _PptxWalker:
    def __init__(self) -> None:
        self.tree = DocTree()

    def walk_slide(self, slide_root: ET.Element, idx: int) -> None:
        parent_slide = self.tree.add_group("chapter", name=f"slide-{idx}")
        sp_tree = slide_root.find(f"{P}cSld/{P}spTree")
        if sp_tree is None:
            return
        for shape in sp_tree:
            self._handle_shape(shape, parent_slide)

    def _handle_shape(self, shape: ET.Element, parent: Node) -> None:
        tag = shape.tag
        if tag == f"{P}grpSp":
            for sub in shape:
                if sub.tag in (f"{P}sp", f"{P}grpSp", f"{P}graphicFrame",
                               f"{P}pic"):
                    self._handle_shape(sub, parent)
            return
        if tag == f"{P}graphicFrame":
            tbl = shape.find(f".//{A}tbl")
            if tbl is not None:
                self._handle_table(tbl, parent)
            return
        if tag == f"{P}pic":
            self.tree.add_picture(parent=parent, media_ref="")
            return
        if tag != f"{P}sp":
            return
        if not _shape_text(shape).strip():
            return
        self._handle_text(shape, parent)

    # -- text frames (mspowerpoint_backend.py:126-256) -----------------------

    def _handle_text(self, sp: ET.Element, parent: Node) -> None:
        tx = sp.find(f"{P}txBody")
        if tx is None:
            return
        ph_type = _placeholder_type(sp)

        is_list_group_created = False
        enum_list_item_value = 0
        new_list: Optional[Node] = None
        doc_label = "list_item"
        is_numbered = False

        for p in tx.findall(f"{A}p"):
            enum_list_item_value += 1
            inline_paragraph_text = ""
            inline_list_item_text = ""
            has_bu_char = p.find(f".//{A}buChar") is not None
            has_bu_num = p.find(f".//{A}buAutoNum") is not None

            for r in p.iter(f"{A}r"):
                text = _run_text(r)
                if not text.strip():
                    continue
                if has_bu_char:
                    e_is_list = True
                    is_numbered = False
                elif has_bu_num:
                    e_is_list = True
                    is_numbered = True
                else:
                    e_is_list = False
                if e_is_list:
                    if inline_paragraph_text:
                        self.tree.add_text(doc_label, inline_paragraph_text,
                                           parent=parent)
                    inline_list_item_text += text
                else:
                    doc_label = "paragraph"
                    if ph_type in ("ctrTitle", "title"):
                        doc_label = "title"
                    # SUBTITLE branch in the reference is a no-op
                    enum_list_item_value = 0
                    inline_paragraph_text += text

            if inline_paragraph_text:
                self.tree.add_text(doc_label, inline_paragraph_text,
                                   parent=parent)
            if inline_list_item_text:
                if not is_list_group_created:
                    new_list = self.tree.add_group(
                        "ordered_list" if is_numbered else "list",
                        name="list", parent=parent)
                    is_list_group_created = True
                self.tree.add_list_item(inline_list_item_text,
                                        parent=new_list)

    # -- tables (mspowerpoint_backend.py:302-376) ----------------------------

    def _handle_table(self, tbl: ET.Element, parent: Node) -> None:
        trs = tbl.findall(f"{A}tr")
        num_rows = len(trs)
        num_cols = 0
        cells: List[TableCell] = []
        for row_idx, tr in enumerate(trs):
            tcs = tr.findall(f"{A}tc")
            num_cols = max(num_cols, len(tcs))
            for col_idx, tc in enumerate(tcs):
                row_span = int(tc.get("rowSpan") or 1)
                col_span = int(tc.get("gridSpan") or 1)
                paras = []
                for p in tc.findall(f"{A}txBody/{A}p"):
                    paras.append("".join(_run_text(r)
                                         for r in p.iter(f"{A}r")))
                text = "\n".join(paras).strip()
                if text:
                    cells.append(TableCell(
                        text=text, row_span=row_span, col_span=col_span,
                        start_row=row_idx, start_col=col_idx,
                        column_header=(row_idx == 0)))
        if cells:
            self.tree.add_table(
                TableData(num_rows=num_rows, num_cols=num_cols, cells=cells),
                parent=parent)


def parse_pptx_document(payload: str) -> DocTree:
    """Base64-encoded .pptx bytes → DocTree."""
    data = base64.b64decode(payload)
    zf = zipfile.ZipFile(io.BytesIO(data))
    pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    rels = ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target", "")
        for rel in rels.iter(f"{PKGREL}Relationship")}
    walker = _PptxWalker()
    sld_lst = pres.find(f"{P}sldIdLst")
    if sld_lst is None:
        return walker.tree
    for idx, sld in enumerate(sld_lst.findall(f"{P}sldId")):
        target = rid_to_target.get(sld.get(f"{R}id"), "")
        if not target:
            continue
        path = "ppt/" + target.lstrip("/") if not target.startswith("ppt/") \
            else target
        walker.walk_slide(ET.fromstring(zf.read(path)), idx)
    return walker.tree
