"""Docling markdown-dialect parity: whole-string equality against the
reference's OWN .md goldens (the reference gate is verify_export,
/root/reference/tests/verify_utils.py:477-488). Covers every
model-free declarative fixture that ships a .md golden — 45 files
across html/csv/md/docx/xlsx/pptx/jats/uspto."""

from pathlib import Path

import pytest

from docling_spark.golden import fixture_names, fixture_payload
from docling_spark.md_dialect import render_markdown_docling

GT = Path("/root/reference/tests/data/groundtruth/docling_v2")
JATS_DIR = Path("/root/reference/tests/data/jats")
USPTO_DIR = Path("/root/reference/tests/data/uspto")


def _parser(kind):
    if kind == "html":
        from docling_spark.parsers.html_parser import parse_html_document
        return parse_html_document
    if kind == "csv":
        from docling_spark.parsers.csv_parser import parse_csv_document
        return parse_csv_document
    if kind == "md":
        from docling_spark.parsers.md_parser import parse_md_document
        return parse_md_document
    if kind == "docx":
        from docling_spark.parsers.docx_parser import parse_docx_document
        return parse_docx_document
    if kind == "xlsx":
        from docling_spark.parsers.xlsx_parser import parse_xlsx_document
        return parse_xlsx_document
    if kind == "pptx":
        from docling_spark.parsers.pptx_parser import parse_pptx_document
        return parse_pptx_document
    raise KeyError(kind)


def _cases():
    cases = []
    for kind in ("html", "csv", "docx", "xlsx", "pptx"):
        for name in fixture_names(f".{kind}"):
            if (GT / f"{name}.md").exists():
                cases.append((kind, name))
    for p in sorted(Path("/root/reference/tests/data/md").glob("*.md")):
        if (GT / f"{p.name}.md").exists():
            cases.append(("md", p.name))
    for p in sorted(JATS_DIR.glob("*.xml")) + sorted(
            JATS_DIR.glob("*.nxml")):
        gt_name = p.name.replace(".nxml", ".xml")
        if (GT / f"{gt_name}.md").exists():
            cases.append(("jats", p.name))
    for p in sorted(USPTO_DIR.glob("*")):
        # USPTO golden names drop the fixture extension
        if (GT / f"{p.stem}.md").exists():
            cases.append(("uspto", p.name))
    return cases


CASES = _cases()


def test_dialect_coverage_floor():
    assert len(CASES) >= 45


@pytest.mark.parametrize("kind,name", CASES)
def test_markdown_dialect_matches_reference_golden(kind, name):
    if kind == "jats":
        payload = (JATS_DIR / name).read_text(encoding="utf-8")
        from docling_spark.parsers.jats_parser import parse_jats_document
        tree = parse_jats_document(payload)
        got = render_markdown_docling(tree, cell_escape_amp=True)
        gt_name = name.replace(".nxml", ".xml")
    elif kind == "uspto":
        payload = (USPTO_DIR / name).read_text(encoding="utf-8",
                                               errors="replace")
        from docling_spark.parsers.uspto_parser import parse_uspto_document
        got = render_markdown_docling(parse_uspto_document(payload))
        gt_name = Path(name).stem
    else:
        tree = _parser(kind)(fixture_payload(name))
        got = render_markdown_docling(tree)
        gt_name = name
    want = (GT / f"{gt_name}.md").read_text(encoding="utf-8")
    if kind == "md":
        # the reference's own md gate writes "{md}\n" and compares
        # with .rstrip() (test_backend_markdown.py:35-40)
        want = want.rstrip()
    assert got == want
