"""Diff the indented-text renderer against the reference's own .itxt
goldens (whole-string — the reference's verify_export gate,
/root/reference/tests/test_backend_csv.py:54-60). Unlike the .md gate
this pins the TREE: item indices and nesting levels.
Usage: python tools/check_itxt_dialect.py [fixture_substring]"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docling_spark.golden import fixture_names, fixture_payload  # noqa: E402
from docling_spark.itxt_dialect import render_itxt  # noqa: E402

GT = Path("/root/reference/tests/data/groundtruth/docling_v2")

PARSERS = {}


def _parser(kind):
    if kind not in PARSERS:
        if kind == "html":
            from docling_spark.parsers.html_parser import parse_html_document
            PARSERS[kind] = parse_html_document
        elif kind == "csv":
            from docling_spark.parsers.csv_parser import parse_csv_document
            PARSERS[kind] = parse_csv_document
        elif kind == "docx":
            from docling_spark.parsers.docx_parser import parse_docx_document
            PARSERS[kind] = parse_docx_document
        elif kind == "xlsx":
            from docling_spark.parsers.xlsx_parser import parse_xlsx_document
            PARSERS[kind] = parse_xlsx_document
        elif kind == "pptx":
            from docling_spark.parsers.pptx_parser import parse_pptx_document
            PARSERS[kind] = parse_pptx_document
        elif kind == "jats":
            from docling_spark.parsers.jats_parser import parse_jats_document
            PARSERS[kind] = parse_jats_document
        elif kind == "uspto":
            from docling_spark.parsers.uspto_parser import (
                parse_uspto_document,
            )
            PARSERS[kind] = parse_uspto_document
    return PARSERS[kind]


def _fixtures(kind):
    """Yield (fixture_name, golden_stem, payload)."""
    if kind == "jats":
        src = Path("/root/reference/tests/data/jats")
        for p in sorted(src.glob("*.xml")):
            yield p.name, p.name, p.read_text(encoding="utf-8")
    elif kind == "uspto":
        src = Path("/root/reference/tests/data/uspto")
        for p in sorted(src.glob("*")):
            # golden name drops the extension (ipa….itxt, pftaps….itxt)
            yield p.name, p.stem, p.read_text(encoding="utf-8",
                                              errors="replace")
    else:
        for name in fixture_names(f".{kind}"):
            yield name, name, fixture_payload(name)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    n_ok = n_miss = n_skip = 0
    for kind in ("html", "csv", "docx", "xlsx", "pptx", "jats", "uspto"):
        for name, stem, payload in _fixtures(kind):
            if only and only not in name:
                continue
            gt_path = GT / f"{stem}.itxt"
            if not gt_path.exists():
                n_skip += 1
                continue
            want = gt_path.read_text(encoding="utf-8")
            try:
                # the USPTO gate calls _export_to_indented_text() with
                # the no-truncation default (test_backend_patent_uspto
                # .py:122); every other backend passes max_text_len=70
                max_len = 10**9 if kind == "uspto" else 70
                got = render_itxt(_parser(kind)(payload),
                                  max_text_len=max_len)
            except Exception as e:
                print(f"ERR  {name}: {type(e).__name__}: {e}")
                n_miss += 1
                continue
            if got == want:
                print(f"OK   {name}")
                n_ok += 1
            else:
                n_miss += 1
                print(f"DIFF {name}")
                gl, wl = got.split("\n"), want.split("\n")
                shown = 0
                for i in range(max(len(gl), len(wl))):
                    a = gl[i] if i < len(gl) else "<EOF>"
                    b = wl[i] if i < len(wl) else "<EOF>"
                    if a != b:
                        print(f"  L{i}  got : {a[:140]!r}")
                        print(f"  L{i}  want: {b[:140]!r}")
                        shown += 1
                        if shown >= 4:
                            break
    print(f"-- ok={n_ok} diff/err={n_miss} no-golden={n_skip}")


if __name__ == "__main__":
    main()
