"""XLSX parser — zipfile + xml.etree re-implementation of the
reference's Excel backend
(/root/reference/docling/backend/msexcel_backend.py).

Reproduced behaviors (reference line cites):
* per-sheet section group "sheet: {name}" (msexcel_backend.py:118-127)
* connected-region table detection: scan cells row-major, grow bottom
  while the next cell in the start column is non-empty or merged
  (_find_table_bottom :273-297), grow right symmetrically
  (_find_table_right :299-323)
* merged ranges → row/col spans; non-anchor cells skipped via the
  visited set; empty in-bounds cells keep openpyxl's str(None)="None"
  (faithful to :244-262)
* header flags: row 0 of each detected table (:158-170)
* images per sheet appended after the sheet's tables (:131-138,
  326-343) — chart drawings are not images

Cell values follow openpyxl semantics: shared strings resolved
(runs concatenated, whitespace preserved), numbers cast int when the
raw text has no '.'/'e', booleans → "True"/"False".

Pure stdlib — runs inside Arrow-batched pandas UDF workers.
"""

from __future__ import annotations

import base64
import io
import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

from ..doctree import DocTree, TableCell, TableData

NS_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
NS_PKGREL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
NS_XDR = ("{http://schemas.openxmlformats.org/drawingml/2006/"
          "spreadsheetDrawing}")

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_to_idx(letters: str) -> int:
    v = 0
    for ch in letters:
        v = v * 26 + (ord(ch) - ord("A") + 1)
    return v - 1


def _parse_ref(ref: str) -> Tuple[int, int]:
    m = _CELL_REF_RE.match(ref)
    return int(m.group(2)) - 1, _col_to_idx(m.group(1))


def _cast_number(v: str) -> str:
    try:
        if "." in v or "e" in v or "E" in v:
            return str(float(v))
        return str(int(v))
    except ValueError:
        return v


class _Sheet:
    def __init__(self, name: str) -> None:
        self.name = name
        self.cells: Dict[Tuple[int, int], Optional[str]] = {}
        self.max_row = 0  # 1-based count
        self.max_col = 0
        self.merged: List[Tuple[int, int, int, int]] = []  # 1-based bounds
        self.n_images = 0

    def value(self, ri: int, rj: int) -> Optional[str]:
        return self.cells.get((ri, rj))

    def merged_at(self, ri: int, rj: int):
        """Merged range containing 0-based (ri, rj), or None."""
        r1, c1 = ri + 1, rj + 1
        for mr in self.merged:
            if mr[0] <= r1 <= mr[2] and mr[1] <= c1 <= mr[3]:
                return mr
        return None


def _shared_strings(zf: zipfile.ZipFile) -> List[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(f"{NS_MAIN}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{NS_MAIN}t")))
    return out


def _load_sheet(zf: zipfile.ZipFile, path: str, name: str,
                sst: List[str]) -> _Sheet:
    sheet = _Sheet(name)
    root = ET.fromstring(zf.read(path))
    data = root.find(f"{NS_MAIN}sheetData")
    if data is None:
        return sheet
    for row in data.findall(f"{NS_MAIN}row"):
        for c in row.findall(f"{NS_MAIN}c"):
            ref = c.get("r")
            if not ref:
                continue
            ri, rj = _parse_ref(ref)
            sheet.max_row = max(sheet.max_row, ri + 1)
            sheet.max_col = max(sheet.max_col, rj + 1)
            ctype = c.get("t", "n")
            val: Optional[str] = None
            if ctype == "inlineStr":
                is_el = c.find(f"{NS_MAIN}is")
                if is_el is not None:
                    val = "".join(t.text or ""
                                  for t in is_el.iter(f"{NS_MAIN}t"))
            else:
                v = c.find(f"{NS_MAIN}v")
                if v is not None and v.text is not None:
                    raw = v.text
                    if ctype == "s":
                        try:
                            val = sst[int(raw)]
                        except (ValueError, IndexError):
                            val = raw
                    elif ctype == "b":
                        val = "True" if raw == "1" else "False"
                    elif ctype in ("str", "e"):
                        val = raw
                    else:
                        val = _cast_number(raw)
            sheet.cells[(ri, rj)] = val
    mc = root.find(f"{NS_MAIN}mergeCells")
    if mc is not None:
        for m in mc.findall(f"{NS_MAIN}mergeCell"):
            ref = m.get("ref") or ""
            if ":" in ref:
                a, b = ref.split(":")
                (r1, c1), (r2, c2) = _parse_ref(a), _parse_ref(b)
                sheet.merged.append((r1 + 1, c1 + 1, r2 + 1, c2 + 1))
    # images: resolve the sheet's drawing and count xdr:pic elements
    drawing = root.find(f"{NS_MAIN}drawing")
    if drawing is not None:
        rid = drawing.get(f"{NS_REL}id")
        rels_path = (f"xl/worksheets/_rels/"
                     f"{path.rsplit('/', 1)[-1]}.rels")
        try:
            rels = ET.fromstring(zf.read(rels_path))
            for rel in rels.iter(f"{NS_PKGREL}Relationship"):
                if rel.get("Id") == rid:
                    target = rel.get("Target", "").replace("../", "xl/")
                    droot = ET.fromstring(zf.read(target))
                    sheet.n_images = len(list(droot.iter(f"{NS_XDR}pic")))
        except KeyError:
            pass
    return sheet


def _load_workbook(data: bytes) -> List[_Sheet]:
    zf = zipfile.ZipFile(io.BytesIO(data))
    sst = _shared_strings(zf)
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target", "")
        for rel in rels.iter(f"{NS_PKGREL}Relationship")}
    sheets: List[_Sheet] = []
    sheets_el = wb.find(f"{NS_MAIN}sheets")
    if sheets_el is None:
        return sheets
    for s in sheets_el.findall(f"{NS_MAIN}sheet"):
        rid = s.get(f"{NS_REL}id")
        target = rid_to_target.get(rid, "")
        if not target:
            continue
        if not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        sheets.append(_load_sheet(zf, target, s.get("name") or "", sst))
    return sheets


# ---------------------------------------------------------------------------
# region growth (msexcel_backend.py:176-323)


def _find_table_bottom(sheet: _Sheet, start_row: int, start_col: int) -> int:
    max_row = start_row
    while max_row < sheet.max_row - 1:
        nxt = (max_row + 1, start_col)
        mr = sheet.merged_at(*nxt)
        if sheet.value(*nxt) is None and not mr:
            break
        if mr:
            max_row = max(max_row, mr[2] - 1)
        else:
            max_row += 1
    return max_row


def _find_table_right(sheet: _Sheet, start_row: int, start_col: int) -> int:
    max_col = start_col
    while max_col < sheet.max_col - 1:
        nxt = (start_row, max_col + 1)
        mr = sheet.merged_at(*nxt)
        if sheet.value(*nxt) is None and not mr:
            break
        if mr:
            max_col = max(max_col, mr[3] - 1)
        else:
            max_col += 1
    return max_col


def _find_tables(sheet: _Sheet) -> List[TableData]:
    tables: List[TableData] = []
    visited: set = set()
    for ri in range(sheet.max_row):
        for rj in range(sheet.max_col):
            if sheet.value(ri, rj) is None or (ri, rj) in visited:
                continue
            max_row = _find_table_bottom(sheet, ri, rj)
            max_col = _find_table_right(sheet, ri, rj)
            cells: List[TableCell] = []
            local_visited: set = set()
            for r in range(ri, max_row + 1):
                for c in range(rj, max_col + 1):
                    row_span = col_span = 1
                    mr = sheet.merged_at(r, c)
                    if mr:
                        row_span = mr[2] - mr[0] + 1
                        col_span = mr[3] - mr[1] + 1
                    if (r, c) in local_visited:
                        continue
                    cells.append(TableCell(
                        text=str(sheet.value(r, c)),
                        row_span=row_span, col_span=col_span,
                        start_row=r - ri, start_col=c - rj,
                        column_header=(r - ri == 0)))
                    for sr in range(r, r + row_span):
                        for sc in range(c, c + col_span):
                            local_visited.add((sr, sc))
            visited.update(local_visited)
            tables.append(TableData(
                num_rows=max_row + 1 - ri,
                num_cols=max_col + 1 - rj,
                cells=cells))
    return tables


def parse_xlsx_document(payload: str) -> DocTree:
    """Base64-encoded .xlsx bytes → DocTree."""
    data = base64.b64decode(payload)
    tree = DocTree()
    for sheet in _load_workbook(data):
        group = tree.add_group("section", name=f"sheet: {sheet.name}")
        for table in _find_tables(sheet):
            tree.add_table(table, parent=group)
        for _ in range(sheet.n_images):
            tree.add_picture(parent=group, media_ref="")
    return tree
