"""Word/char-level parity of the from-scratch PDF reader vs the
reference's real cell dumps.

For each PDF in /root/reference/tests/data/pdf/ with a matching
groundtruth .pages.json (tests/data/groundtruth/docling_v2/), compare
the bag of words (and chars) produced by
docling_spark.parsers.pdfio.extract_pdf_cells against the groundtruth
`cells[*].text` (docling-parse v2 line cells,
/root/reference/tests/verify_utils.py:59-88 is the reference's own
cell gate).

Usage: python tools/pdf_parity.py [--json] [name ...]
"""
from __future__ import annotations

import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docling_spark.parsers.pdfio import extract_pdf_cells  # noqa: E402

PDF_DIR = Path("/root/reference/tests/data/pdf")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

_WORD_RE = re.compile(r"\S+")


def _words(texts):
    c = Counter()
    for t in texts:
        c.update(_WORD_RE.findall(t))
    return c


def _chars(texts):
    c = Counter()
    for t in texts:
        c.update(ch for ch in t if not ch.isspace())
    return c


def _prf(mine: Counter, gt: Counter):
    inter = sum((mine & gt).values())
    p = inter / max(1, sum(mine.values()))
    r = inter / max(1, sum(gt.values()))
    return p, r


def gt_line_texts(pg: dict, space_pt: float = 1.0) -> list:
    """Reconstruct LINE texts from a groundtruth page's cells: group
    by baseline (2pt band), sort by x, concatenate with a space
    inserted at gaps > ``space_pt`` — the same assembly rule
    pdfio.assemble_lines applies to its own runs.

    Why lines: docling-parse's sub-line cell segmentation is not a
    deterministic function of the content stream — on
    right_to_left_02 the identical local fragment/kern pattern
    ('م' [+4] 'لا ' [-10] …) is merged into one cell at x≈138 and
    split into three cells at x≈314 on the SAME line, and the same
    'لا ' fragment appears cell-final with its trailing space kept,
    with it dropped, and cell-medial, all on one line. An independent
    implementation cannot reproduce that from the PDF alone, and
    nothing downstream depends on it: docling's own pipeline merges
    cells back into lines (SanitizedPdfPage) before any text use. So
    the word-level gate compares both sides at the granularity the
    engines actually agree is meaningful — the line — while the
    cell-level numbers stay reported for visibility."""
    cells = [c for c in pg["cells"] if c["text"].strip()]
    cells.sort(key=lambda c: (round(c["rect"]["r_y0"], 1),
                              c["rect"]["r_x0"]))
    lines, cur, cury = [], [], None
    for c in cells:
        y = c["rect"]["r_y0"]
        if cury is None or abs(y - cury) <= 2.0:
            cur.append(c)
            cury = y
        else:
            lines.append(cur)
            cur, cury = [c], y
    if cur:
        lines.append(cur)
    out = []
    for ln in lines:
        ln.sort(key=lambda c: c["rect"]["r_x0"])
        txt, prev = "", None
        for c in ln:
            if prev is not None:
                gap = c["rect"]["r_x0"] - prev["rect"]["r_x1"]
                if gap > space_pt and not txt.endswith(" ") \
                        and not c["text"].startswith(" "):
                    txt += " "
            txt += c["text"]
            prev = c
        out.append(txt)
    return out


def compare(name: str) -> dict:
    pdf = PDF_DIR / f"{name}.pdf"
    gt_file = GT_DIR / f"{name}.pages.json"
    gt_pages = json.loads(gt_file.read_text())
    mine_pages = extract_pdf_cells(pdf.read_bytes())
    gt_texts, gt_lines, my_texts = [], [], []
    for pg in gt_pages:
        gt_texts += [c["text"] for c in pg["cells"]]
        gt_lines += gt_line_texts(pg)
    for pg in mine_pages:
        my_texts += [c["text"] for c in pg["cells"]]
    wp, wr = _prf(_words(my_texts), _words(gt_texts))
    lwp, lwr = _prf(_words(my_texts), _words(gt_lines))
    cp, cr = _prf(_chars(my_texts), _chars(gt_texts))
    return {"name": name, "pages": len(mine_pages),
            "gt_pages": len(gt_pages),
            "word_p": round(wp, 4), "word_r": round(wr, 4),
            "line_word_p": round(lwp, 4), "line_word_r": round(lwr, 4),
            "char_p": round(cp, 4), "char_r": round(cr, 4),
            "my_cells": len(my_texts), "gt_cells": len(gt_texts)}


def missing_words(name: str, limit: int = 30):
    """Debug helper: words in groundtruth not produced by pdfio."""
    pdf = PDF_DIR / f"{name}.pdf"
    gt_pages = json.loads((GT_DIR / f"{name}.pages.json").read_text())
    mine_pages = extract_pdf_cells(pdf.read_bytes())
    gt = _words([c["text"] for pg in gt_pages for c in pg["cells"]])
    mine = _words([c["text"] for pg in mine_pages for c in pg["cells"]])
    miss = gt - mine
    extra = mine - gt
    return (miss.most_common(limit), extra.most_common(limit))


def main(argv):
    as_json = "--json" in argv
    names = [a for a in argv if not a.startswith("-")]
    if not names:
        names = sorted(p.stem for p in PDF_DIR.glob("*.pdf")
                       if (GT_DIR / f"{p.stem}.pages.json").exists())
    rows = [compare(n) for n in names]
    if as_json:
        print(json.dumps(rows))
    else:
        for r in rows:
            print("{name:32s} pages {pages}/{gt_pages}  "
                  "word P/R {word_p:.3f}/{word_r:.3f}  "
                  "line-word P/R {line_word_p:.3f}/{line_word_r:.3f}  "
                  "char P/R {char_p:.3f}/{char_r:.3f}  "
                  "cells {my_cells}/{gt_cells}".format(**r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
