"""AsciiDoc state-machine tests. The reference's .md goldens for
asciidoc predate its current backend (see parser docstring), so the
contract is pinned here against the CURRENT reference semantics."""

from pathlib import Path

from docling_spark.doctree import flatten
from docling_spark.parsers.asciidoc_parser import parse_asciidoc_document


def spans_of(src: str):
    return [(s["kind"], s["text"]) for s in
            flatten(parse_asciidoc_document(src))]


def test_title_sections_paragraphs():
    src = ("= My Title\n\nAn abstract line.\n\n== Section 1\n\n"
           "Multi line\nparagraph here.\n")
    assert spans_of(src) == [
        ("title", "My Title"),
        ("paragraph", "An abstract line."),
        ("section_header", "Section 1"),
        ("paragraph", "Multi line paragraph here."),
    ]


def test_lists_with_nesting():
    src = ("= T\n\n* first\n* second\n  * nested a\n  * nested b\n"
           "* third\n")
    assert spans_of(src) == [
        ("title", "T"),
        ("list_item", "first"),
        ("list_item", "second"),
        ("list_item", "nested a"),
        ("list_item", "nested b"),
        ("list_item", "third"),
    ]


def test_line_after_list_is_consumed():
    # reference quirk: the list-closing line is eaten (asciidoc_backend
    # :163-168) — only text after a subsequent line survives
    src = "* a\n* b\neaten line\nkept line\n"
    assert spans_of(src) == [
        ("list_item", "a"), ("list_item", "b"),
        ("paragraph", "kept line"),
    ]


def test_table_with_caption_and_fences():
    src = (".Table caption\n|===\n|H1 |H2\n|a |b\n|===\n")
    got = flatten(parse_asciidoc_document(src))
    assert [s["kind"] for s in got] == ["caption", "table"]
    assert got[0]["text"] == "Table caption"
    assert got[1]["text"] == "2x2\nH1\tH2\na\tb\nH:1\t1"


def test_bare_pipe_table():
    src = "|A|B|\n|1|2|\n\nafter\n"
    got = spans_of(src)
    assert got[0][0] == "table"
    assert got[0][1] == "2x2\nA\tB\n1\t2\nH:1\t1"
    assert got[1] == ("paragraph", "after")


def test_picture_with_caption_and_uri():
    src = (".An image caption\nimage::images/pic.png[Alt, width=200, "
           "height=150]\n")
    got = flatten(parse_asciidoc_document(src))
    assert [s["kind"] for s in got] == ["caption", "picture"]
    assert got[0]["text"] == "An image caption"
    assert got[1]["media_ref"] == "file://images/pic.png"


def test_reference_fixture_files_parse():
    base = Path("/root/reference/tests/data/asciidoc")
    for name in ("test_01.asciidoc", "test_02.asciidoc"):
        spans = flatten(parse_asciidoc_document(
            (base / name).read_text()))
        kinds = {s["kind"] for s in spans}
        assert spans[0]["kind"] == "title"
        assert "section_header" in kinds
        assert "list_item" in kinds
        assert "table" in kinds
        assert len(spans) > 10


# -- engine-owned goldens (DOCLING_SPARK_GEN_TEST_DATA pattern) -------------


def test_gen_flag_off_in_ci():
    """Mirror of the reference's tests/test_data_gen_flag.py: the
    regeneration flag must be OFF when the suite runs as a gate."""
    from tests.golden_store import gen_mode
    assert not gen_mode()


def test_reference_asciidoc_files_match_engine_goldens():
    from pathlib import Path

    from tests.golden_store import assert_matches_golden
    src_dir = Path("/root/reference/tests/data/asciidoc")
    for p in sorted(src_dir.glob("*.asciidoc")):
        spans = flatten(parse_asciidoc_document(
            p.read_text(encoding="utf-8")))
        assert_matches_golden(f"asciidoc_{p.stem}", spans)


def test_typed_page_doc_matches_engine_golden():
    import json as _json

    from docling_spark.parsers.pdf_page import parse_pdf_pages
    from tests.golden_store import assert_matches_golden
    payload = _json.dumps({
        "page_no": 0, "width": 612.0, "height": 792.0,
        "cells": [
            {"index": 0, "text": "Head", "l": 50, "t": 50, "r": 200,
             "b": 60},
            {"index": 1, "text": "body one", "l": 50, "t": 100, "r": 400,
             "b": 110},
            {"index": 2, "text": "body two", "l": 50, "t": 112, "r": 400,
             "b": 122},
        ],
        "clusters": [
            {"id": 1, "label": "section_header", "confidence": 0.9,
             "l": 45, "t": 45, "r": 205, "b": 65},
            {"id": 2, "label": "text", "confidence": 0.9,
             "l": 45, "t": 95, "r": 405, "b": 125},
        ],
    })
    assert_matches_golden("pdf_typed_page",
                          flatten(parse_pdf_pages([payload])))
