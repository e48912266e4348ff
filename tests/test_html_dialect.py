"""Docling-dialect HTML renderer (html_dialect.py).

Byte-parity gate: the reference ships exactly one HTML export golden
(word_tables.docx.html, compared whole-string by its own msword backend
test, /root/reference/tests/test_backend_msword.py:93-98) — rendered
here through the real docx parse. Kinds with no shipped golden (lists,
code, pictures/captions) are pinned by unit tests against the dialect
rules documented in the module.
"""

from pathlib import Path

from docling_spark.doctree import DocTree, TableCell, TableData
from docling_spark.golden import GROUNDTRUTH_DIR, fixture_payload
from docling_spark.html_dialect import HTML_HEAD, render_html_docling
from docling_spark.parsers.docx_parser import parse_docx_document


def test_word_tables_byte_parity():
    tree = parse_docx_document(fixture_payload("word_tables.docx"))
    want = (GROUNDTRUTH_DIR / "word_tables.docx.html").read_text(
        encoding="utf-8")
    assert render_html_docling(tree) == want


def _body(rendered: str) -> str:
    assert rendered.startswith(HTML_HEAD + "\n")
    assert rendered.endswith("\n</html>")
    return rendered[len(HTML_HEAD) + 1: -len("\n</html>")]


def test_heading_paragraph_escape():
    t = DocTree()
    t.add_title("A & B")
    t.add_heading("Sub <1>", level=2)
    t.add_text("text", "x < y")
    assert _body(render_html_docling(t)) == (
        "<h1>A &amp; B</h1>\n<h2h>Sub &lt;1&gt;</h2h>".replace("h2h", "h3")
        + "\n<p>x &lt; y</p>")


def test_lists_nested():
    t = DocTree()
    ul = t.add_group("list")
    t.add_list_item("one", parent=ul)
    two = t.add_list_item("two", parent=ul)
    ol = t.add_group("ordered_list", parent=two)
    t.add_list_item("2a", parent=ol)
    assert _body(render_html_docling(t)) == (
        "<ul><li>one</li><li>two<ol><li>2a</li></ol></li></ul>")


def test_picture_caption_and_code():
    t = DocTree()
    pic = t.add_picture()
    cap = t.add_text("caption", "Fig 1")
    pic.caption = cap  # bound caption renders inside the figure only
    t.add_code("x = 1")
    assert _body(render_html_docling(t)) == (
        "<figure><figcaption>Fig 1</figcaption></figure>\n"
        "<pre><code>x = 1</code></pre>")


def test_table_span_anchoring():
    data = TableData(num_rows=2, num_cols=3, cells=[
        TableCell("H", col_span=3, column_header=True),
        TableCell("a", start_row=1, start_col=0),
        TableCell("b", start_row=1, start_col=1, col_span=2),
    ])
    t = DocTree()
    t.add_table(data)
    assert _body(render_html_docling(t)) == (
        '<table><tbody><tr><th colspan="3">H</th></tr>'
        '<tr><td>a</td><td colspan="2">b</td></tr></tbody></table>')
