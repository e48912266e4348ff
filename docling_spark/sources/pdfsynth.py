"""Deterministic minimal PDF writer — synthesizes REAL PDF binaries
(classic xref table, FlateDecode content streams, WinAnsi simple font)
from plain text, one page per input string.

Purpose: end-to-end evidence for the from-scratch native PDF reader
(parsers/pdfio.py). A corpus row's text becomes a genuine PDF byte
blob in one Arrow stage; pdfio parses the bytes back in another; the
DuckDB oracle recomputes the expected text from the same table — a
round-trip identity through real PDF file structure that a SQL engine
can verify (see __spark_entry__.q_pdf_native_roundtrip).

The writer is intentionally small but structurally honest: the output
exercises pdfio's xref parser, object lexer, stream /Length +
FlateDecode decoding, page-tree walk with inherited /Resources, font
resolution, and BT/Tm/Tj interpretation — not a fixture replay.
"""

from __future__ import annotations

import zlib
from typing import List

_ESC = {0x5C: b"\\\\", 0x28: b"\\(", 0x29: b"\\)"}


def _lit(text: str) -> bytes:
    """PDF literal string with (, ), \\ escaped; latin-1 payload."""
    raw = text.encode("latin-1", "replace")
    out = bytearray(b"(")
    for b in raw:
        out += _ESC.get(b, bytes([b]))
    out += b")"
    return bytes(out)


def synth_pdf(page_texts: List[str], compress: bool = True) -> bytes:
    """Build a one-column PDF: each input string is one page with one
    text line at a fixed position (10pt Helvetica, WinAnsi)."""
    return synth_pdf_pages([[t] for t in page_texts], compress=compress)


def synth_pdf_pages(pages: List[List[str]],
                    compress: bool = True,
                    outline: "List[tuple]" = None,
                    links: "List[tuple]" = None) -> bytes:
    """Build a one-column PDF where each page is a list of text lines
    laid out top-down at a uniform 14pt step from y=724 (10pt
    Helvetica) — single-column body geometry, clear of the page
    header/footer margins.

    ``outline``: optional list of (level, title, page_idx) in document
    order (levels start at 0 and may only deepen one step at a time) —
    written as a REAL ISO 32000-1 §12.3.3 outline tree: /Outlines root
    with /First /Last /Count, items linked via /Parent /Prev /Next
    with explicit [page /XYZ] destinations, so the reader's tree walk
    is exercised, not a flat list replay.

    ``links``: optional list of (page_idx, url) in document order —
    written as real §12.5.6.5 link annotations: per-page /Annots
    arrays of indirect /Subtype /Link objects carrying /A URI
    actions."""
    page_texts = pages
    objs: List[bytes] = []  # 1-indexed object bodies (without N 0 obj)

    n_pages = max(1, len(page_texts))
    # object layout: 1=Catalog, 2=Pages, 3=Font,
    #   4..3+n = Page_i, 4+n..3+2n = Contents_i,
    #   then (when outlined) 4+2n = /Outlines root, 5+2n+i = item i,
    #   then (when linked) one /Annot object per link, in input order
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    ann_base = 4 + 2 * n_pages + (1 + len(outline) if outline else 0)
    page_annots = {}
    for j, (pg, _url) in enumerate(links or []):
        pg = min(max(0, int(pg)), n_pages - 1)
        page_annots.setdefault(pg, []).append(ann_base + j)
    if outline:
        objs.append((f"<< /Type /Catalog /Pages 2 0 R "
                     f"/Outlines {4 + 2 * n_pages} 0 R >>").encode())
    else:
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append((f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
                 f"/MediaBox [0 0 612 792] /Resources "
                 f"<< /Font << /F1 3 0 R >> >> >>").encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                b" /Encoding /WinAnsiEncoding >>")
    for i in range(n_pages):
        annots = ""
        if i in page_annots:
            refs = " ".join(f"{a} 0 R" for a in page_annots[i])
            annots = f" /Annots [{refs}]"
        objs.append((f"<< /Type /Page /Parent 2 0 R /Contents "
                     f"{4 + n_pages + i} 0 R{annots} >>").encode())
    for i in range(n_pages):
        lines = page_texts[i] if i < len(page_texts) else [""]
        body = b" ".join(
            f"1 0 0 1 50 {724 - j * 14} Tm ".encode() + _lit(ln) +
            b" Tj" for j, ln in enumerate(lines))
        content = b"BT /F1 10 Tf " + body + b" ET"
        if compress:
            comp = zlib.compress(content)
            objs.append(b"<< /Length " + str(len(comp)).encode() +
                        b" /Filter /FlateDecode >>\nstream\n" + comp +
                        b"\nendstream")
        else:
            objs.append(b"<< /Length " + str(len(content)).encode() +
                        b" >>\nstream\n" + content + b"\nendstream")

    if outline:
        root_num = 4 + 2 * n_pages
        first_item = root_num + 1
        n_items = len(outline)
        # resolve the sibling/child structure from the level sequence
        parents = [None] * n_items   # index of parent item, None=root
        firsts = [None] * n_items    # first/last CHILD item index
        lasts = [None] * n_items
        prevs = [None] * n_items
        nexts = [None] * n_items
        counts = [0] * n_items       # open descendant count
        stack: List[int] = []        # item indices, one per level
        root_first = root_last = None
        for i, (level, _title, _pg) in enumerate(outline):
            level = max(0, int(level))
            del stack[level:]
            parent = stack[-1] if stack else None
            parents[i] = parent
            if parent is None:
                if root_first is None:
                    root_first = i
                if root_last is not None:
                    prevs[i], nexts[root_last] = root_last, i
                root_last = i
            else:
                if firsts[parent] is None:
                    firsts[parent] = i
                else:
                    prevs[i], nexts[lasts[parent]] = lasts[parent], i
                lasts[parent] = i
            p = parent
            while p is not None:       # open outline: count all
                counts[p] += 1         # descendants (§12.3.3)
                p = parents[p]
            stack.append(i)
        total = n_items
        objs.append((f"<< /Type /Outlines /First {first_item + root_first}"
                     f" 0 R /Last {first_item + root_last} 0 R"
                     f" /Count {total} >>").encode())
        for i, (level, title, pg) in enumerate(outline):
            pg = min(max(0, int(pg)), n_pages - 1)
            parent = (root_num if parents[i] is None
                      else first_item + parents[i])
            body = bytearray(b"<< /Title " + _lit(title))
            body += f" /Parent {parent} 0 R".encode()
            if prevs[i] is not None:
                body += f" /Prev {first_item + prevs[i]} 0 R".encode()
            if nexts[i] is not None:
                body += f" /Next {first_item + nexts[i]} 0 R".encode()
            if firsts[i] is not None:
                body += (f" /First {first_item + firsts[i]} 0 R"
                         f" /Last {first_item + lasts[i]} 0 R"
                         f" /Count {counts[i]}").encode()
            body += f" /Dest [{4 + pg} 0 R /XYZ 0 792 0] >>".encode()
            objs.append(bytes(body))

    for j, (_pg, url) in enumerate(links or []):
        y = 700 - 16 * j
        objs.append(b"<< /Type /Annot /Subtype /Link /Rect [50 "
                    + str(y).encode() + b" 250 " + str(y + 14).encode()
                    + b"] /Border [0 0 0] /A << /S /URI /URI "
                    + _lit(url) + b" >> >>")

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(buf)
