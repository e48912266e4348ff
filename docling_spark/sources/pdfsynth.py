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
                    compress: bool = True) -> bytes:
    """Build a one-column PDF where each page is a list of text lines
    laid out top-down at a uniform 14pt step from y=724 (10pt
    Helvetica) — single-column body geometry, clear of the page
    header/footer margins."""
    page_texts = pages
    objs: List[bytes] = []  # 1-indexed object bodies (without N 0 obj)

    n_pages = max(1, len(page_texts))
    # object layout: 1=Catalog, 2=Pages, 3=Font,
    #   4..3+n = Page_i, 4+n..3+2n = Contents_i
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append((f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
                 f"/MediaBox [0 0 612 792] /Resources "
                 f"<< /Font << /F1 3 0 R >> >> >>").encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                b" /Encoding /WinAnsiEncoding >>")
    for i in range(n_pages):
        objs.append((f"<< /Type /Page /Parent 2 0 R /Contents "
                     f"{4 + n_pages + i} 0 R >>").encode())
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
