"""Indented-text dialect parity: whole-string equality against the
reference's OWN .itxt goldens (gate: verify_export, invocation e.g.
/root/reference/tests/test_backend_csv.py:54-60 with max_text_len=70,
explicit_tables=False; the USPTO gate uses the no-truncation default,
test_backend_patent_uspto.py:122). Unlike the .md gate this pins the
document TREE — item indices and nesting levels — for all 39 shipped
.itxt goldens across html/csv/docx/xlsx/pptx/jats/uspto."""

from pathlib import Path

import pytest

from docling_spark.golden import fixture_names, fixture_payload
from docling_spark.itxt_dialect import render_itxt

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
    if kind == "docx":
        from docling_spark.parsers.docx_parser import parse_docx_document
        return parse_docx_document
    if kind == "xlsx":
        from docling_spark.parsers.xlsx_parser import parse_xlsx_document
        return parse_xlsx_document
    if kind == "pptx":
        from docling_spark.parsers.pptx_parser import parse_pptx_document
        return parse_pptx_document
    if kind == "jats":
        from docling_spark.parsers.jats_parser import parse_jats_document
        return parse_jats_document
    if kind == "uspto":
        from docling_spark.parsers.uspto_parser import parse_uspto_document
        return parse_uspto_document
    raise KeyError(kind)


def _cases():
    cases = []
    for kind in ("html", "csv", "docx", "xlsx", "pptx"):
        for name in fixture_names(f".{kind}"):
            if (GT / f"{name}.itxt").exists():
                cases.append((kind, name))
    for p in sorted(JATS_DIR.glob("*.xml")):
        if (GT / f"{p.name}.itxt").exists():
            cases.append(("jats", p.name))
    for p in sorted(USPTO_DIR.glob("*")):
        # USPTO golden names drop the fixture extension
        if (GT / f"{p.stem}.itxt").exists():
            cases.append(("uspto", p.name))
    return cases


CASES = _cases()


def test_itxt_coverage_floor():
    assert len(CASES) >= 39


@pytest.mark.parametrize("kind,name", CASES)
def test_itxt_matches_reference_golden(kind, name):
    if kind == "jats":
        payload = (JATS_DIR / name).read_text(encoding="utf-8")
        stem = name
    elif kind == "uspto":
        payload = (USPTO_DIR / name).read_text(encoding="utf-8",
                                               errors="replace")
        stem = Path(name).stem
    else:
        payload = fixture_payload(name)
        stem = name
    max_len = 10**9 if kind == "uspto" else 70
    got = render_itxt(_parser(kind)(payload), max_text_len=max_len)
    want = (GT / f"{stem}.itxt").read_text(encoding="utf-8")
    assert got == want
