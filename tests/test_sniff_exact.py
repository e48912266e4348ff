"""Unit pins for the exact format-guessing chain
(operators/sniff_exact.py) against the reference semantics
(/root/reference/docling/datamodel/document.py:274-427)."""

import base64

from docling_spark.operators.sniff_exact import (
    _detect_csv,
    _detect_html_xhtml,
    _mime_from_extension,
    guess_mime_and_format,
)


def g(data, name=""):
    return guess_mime_and_format(data, name)


def test_magic_beats_extension():
    # magic check runs before the filename fallback (document.py:288-296)
    assert g(b"%PDF-1.7\nxref", "notes.md") == ("application/pdf", "pdf")


def test_extension_beats_content_probe():
    html = b"<!DOCTYPE html><html><body>x</body></html>"
    assert g(html, "page.md") == ("text/markdown", "md")
    assert g(html, "page.txt")[1] == "html"  # txt not in the ext map


def test_leading_dot_name_has_no_extension():
    # document.py:291-296: names starting with '.' yield ext ""
    assert _mime_from_extension(".md") is None
    assert _mime_from_extension("a.MD") == "text/markdown"


def test_html_probe_strips_comments_first():
    # document.py:384-386: comments removed before the doctype match
    data = b"<!-- preamble\nlines -->\n  <!DOCTYPE html><html></html>"
    assert _detect_html_xhtml(data) == "text/html"


def test_xml_decl_xhtml_vs_plain_xml():
    xhtml = (b'<?xml version="1.0"?><html '
             b'xmlns="http://www.w3.org/1999/xhtml"/>')
    assert _detect_html_xhtml(xhtml) == "application/xhtml+xml"
    assert _detect_html_xhtml(b'<?xml version="1.0"?><data/>') \
        == "application/xml"


def test_generic_doctype_root_echo_rule():
    # document.py:393-397: <!doctype root ...> followed by <root ...>
    data = b'<!DOCTYPE note SYSTEM "note.dtd"><note a="1"/>'
    assert _detect_html_xhtml(data) == "application/xml"
    # root mismatch -> no match
    assert _detect_html_xhtml(
        b'<!DOCTYPE note SYSTEM "x.dtd"><memo/>') is None


def test_csv_sniffer_accept_set():
    assert _detect_csv(b"a,b,c\n1,2,3\n") == "text/csv"
    assert _detect_csv(b"a;b;c\n1;2;3\n") == "text/csv"
    assert _detect_csv(b"a\tb\tc\n1\t2\t3\n") == "text/csv"
    # single-line input is never CSV (document.py:414-416)
    assert _detect_csv(b"a,b,c") is None
    # ':' is sniffable by csv.Sniffer but outside the accept-set
    assert _detect_csv(b"a:b:c\n1:2:3\n") is None


def test_xml_ambiguity_resolution():
    uspto = (b'<?xml version="1.0"?><!DOCTYPE us-patent-grant SYSTEM '
             b'"us-patent-grant-v45-2014-04-03.dtd">'
             b"<us-patent-grant/>")
    assert g(uspto) == ("application/xml", "uspto")
    jats = (b'<?xml version="1.0"?><!DOCTYPE article PUBLIC '
            b'"-//NLM//DTD JATS (Z39.96) Journal Publishing DTD '
            b'v1.2 20190208//EN" "JATS-journalpublishing1.dtd">'
            b"<article/>")
    assert g(jats) == ("application/xml", "jats")
    # unresolvable xml -> unknown format, mime kept
    plain = b'<?xml version="1.0"?><data/>'
    assert g(plain) == ("application/xml", "unknown")


def test_text_plain_patn_probe():
    assert g(b"PATN\r\nWKU  039305848\r\n") == ("text/plain", "uspto")
    # the reference checks \r\n specifically (document.py:343-345)
    assert g(b"PATN\nWKU\n")[1] == "unknown"


def test_bare_zip_is_unknown():
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "hello")
    assert g(buf.getvalue(), "archive.bin")[1] == "unknown"


def test_ooxml_members_resolve_container():
    from docling_spark.sources.minidocs import payload_variants
    expect = {"docx": "docx", "xlsx": "xlsx", "pptx": "pptx"}
    for kind, fmt in expect.items():
        for b64 in payload_variants(kind):
            assert g(base64.b64decode(b64), "blob.bin")[1] == fmt


def test_image_magics():
    assert g(b"\x89PNG\r\n\x1a\nrest")[1] == "image"
    assert g(b"\xff\xd8\xff\xe0rest")[1] == "image"
    assert g(b"GIF89a")[1] == "image"


def test_guess_format_reference_fixtures():
    """Mirror of the reference's own _guess_format test
    (/root/reference/tests/test_input_doc.py:113-227, stream branch)
    over the same fixtures."""
    from pathlib import Path
    data = Path("/root/reference/tests/data")

    def fmt(rel, name):
        return g((data / rel).read_bytes(), name)[1]

    assert fmt("docx/lorem_ipsum.docx", "lorem_ipsum.docx") == "docx"
    assert fmt("html/wiki_duck.html", "wiki_duck.html") == "html"
    assert fmt("md/wiki.md", "wiki.md") == "md"
    assert fmt("csv/csv-comma.csv", "csv-comma.csv") == "csv"
    # no extension: the csv.Sniffer content probe must still hit
    assert fmt("csv/csv-comma.csv", "test-comma") == "csv"
    assert fmt("uspto/ipa20110039701.xml", "ipa20110039701.xml") == "uspto"
    assert fmt("uspto/pftaps057006474.txt", "pftaps057006474.txt") == "uspto"
    assert fmt("jats/elife-56337.xml", "elife-56337.xml") == "jats"
    assert fmt("jats/elife-56337.nxml", "elife-56337.nxml") == "jats"
    assert fmt("jats/elife-56337.txt", "elife-56337.txt") == "jats"

    # valid but unsupported XML flavor: DOCTYPE root doesn't echo
    # (<!DOCTYPE docling_test ...><docling>) -> no format
    xml = (b'<?xml version="1.0" encoding="UTF-8"?><!DOCTYPE docling_test '
           b'SYSTEM "test.dtd"><docling>Docling parses documents</docling>')
    assert g(xml, "docling_test.xml")[1] == "unknown"

    # invalid USPTO named .txt -> no format
    assert g(b"xyz", "pftaps057006474.txt")[1] == "unknown"

    # any JSON routes to docling_json by extension (reference TODO
    # acknowledges no deeper validation at sniff time)
    assert g(b'{"name": ""}', "test.json")[1] == "docling_json"
    assert g(b"{}", "test.json")[1] == "docling_json"


def test_detect_charset_precedence_and_edges():
    from docling_spark.operators.sniff_exact import detect_charset
    # BOM beats a contradicting meta tag
    assert detect_charset(
        b"\xef\xbb\xbf<meta charset='koi8-r'>") == ("utf-8", "bom")
    # utf-32le BOM is not mistaken for the utf-16le prefix it contains
    assert detect_charset(b"\xff\xfe\x00\x00rest") == ("utf-32le", "bom")
    assert detect_charset(b"\xff\xfeab") == ("utf-16le", "bom")
    # meta only scanned within the first 1024 bytes
    near = b"<html>" + b" " * 900 + b"<meta charset=latin2><body>"
    far = b"<html>" + b" " * 1100 + b"<meta charset=latin2><body>"
    assert detect_charset(near) == ("latin2", "meta")
    assert detect_charset(far) == ("utf-8", "utf8_valid")
    # strict utf-8 pass vs legacy fallback
    assert detect_charset("héllo".encode()) == ("utf-8", "utf8_valid")
    assert detect_charset("héllo".encode("latin-1")) == (
        "windows-1252", "fallback")
    assert detect_charset(b"") == ("utf-8", "utf8_valid")
