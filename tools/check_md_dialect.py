"""Diff the docling-dialect markdown renderer against the reference's
own .md goldens (whole-string, the reference's verify_export gate).
Usage: python tools/check_md_dialect.py [fixture_substring]"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docling_spark.golden import fixture_names, fixture_payload  # noqa: E402
from docling_spark.md_dialect import render_markdown_docling  # noqa: E402

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
        elif kind == "md":
            from docling_spark.parsers.md_parser import parse_md_document
            PARSERS[kind] = parse_md_document
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


def _fixture_names(kind):
    if kind == "md":
        src = Path("/root/reference/tests/data/md")
        return sorted(p.name for p in src.glob("*.md"))
    if kind == "jats":
        src = Path("/root/reference/tests/data/jats")
        return sorted(p.name for p in src.glob("*.xml"))
    if kind == "uspto":
        src = Path("/root/reference/tests/data/uspto")
        return sorted(p.name for p in src.glob("*"))
    return fixture_names(f".{kind}")


def _payload(kind, name):
    if kind == "jats":
        return (Path("/root/reference/tests/data/jats") / name).read_text(
            encoding="utf-8")
    if kind == "uspto":
        return (Path("/root/reference/tests/data/uspto") / name).read_text(
            encoding="utf-8", errors="replace")
    return fixture_payload(name)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    n_ok = n_miss = n_skip = 0
    for kind in ("html", "csv", "md", "docx", "xlsx", "pptx", "jats",
                 "uspto"):
        for name in _fixture_names(kind):
            if only and only not in name:
                continue
            # USPTO golden names drop the fixture extension
            stem = name.rsplit(".", 1)[0] if kind == "uspto" else name
            gt_path = GT / f"{stem}.md"
            if not gt_path.exists():
                n_skip += 1
                continue
            want = gt_path.read_text(encoding="utf-8")
            if kind == "md":
                # the reference's own md gate writes "{md}\n" and
                # compares with .rstrip() (test_backend_markdown.py)
                want = want.rstrip()
            try:
                tree = _parser(kind)(_payload(kind, name))
                # JATS goldens were generated in a serializer era that
                # escapes '&' inside table cells (see md_dialect)
                got = render_markdown_docling(
                    tree, cell_escape_amp=(kind == "jats"))
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
                        print(f"  L{i}  got : {a[:120]!r}")
                        print(f"  L{i}  want: {b[:120]!r}")
                        shown += 1
                        if shown >= 4:
                            break
    print(f"-- ok={n_ok} diff/err={n_miss} no-golden={n_skip}")


if __name__ == "__main__":
    main()
