"""PDF outline tree: writer (sources/pdfsynth.py outline arg) and
reader (parsers/pdfio.py::extract_outline) beyond the registry
fixture."""

from docling_spark.parsers.pdfio import PdfDocument, extract_outline
from docling_spark.sources.pdfsynth import synth_pdf_pages


def _pdf(outline):
    return synth_pdf_pages([["p0"], ["p1"], ["p2"]], outline=outline)


def test_outline_preorder_and_pages():
    ol = [(0, "A", 0), (1, "A.1", 0), (2, "A.1.a", 1),
          (1, "A.2", 2), (0, "B", 2)]
    out = extract_outline(_pdf(ol))
    assert [(e["level"], e["title"], e["page_no"]) for e in out] == ol
    assert [e["idx"] for e in out] == list(range(5))


def test_outline_counts_are_open_descendant_totals():
    # ISO 32000-1: an open item's /Count totals ALL descendants
    ol = [(0, "A", 0), (1, "A.1", 0), (2, "A.1.a", 1), (1, "A.2", 2)]
    doc = PdfDocument(_pdf(ol))
    root = doc.resolve(doc.resolve(doc.trailer["Root"])["Outlines"])
    assert root["Count"] == 4
    first = doc.resolve(root["First"])     # item A
    assert first["Count"] == 3             # A.1, A.1.a, A.2


def test_outline_absent():
    assert extract_outline(synth_pdf_pages([["x"]])) == []


def test_outline_cycle_guard():
    pdf = bytearray(_pdf([(0, "A", 0), (0, "B", 1)]))
    # corrupt B's /Next to point back at A (object 10 in the 3-page
    # layout: root=9+... compute by searching instead)
    i = pdf.find(b"/Title (B)")
    assert i > 0
    end = pdf.find(b">>", i)
    pdf[i:end] = pdf[i:end] + b" /Next %d 0 R" % _first_item_num(pdf)
    out = extract_outline(bytes(pdf))
    # terminates, visits each item once
    assert [e["title"] for e in out] == ["A", "B"]


def _first_item_num(pdf: bytes) -> int:
    i = pdf.find(b"/Title (A)")
    j = pdf.rfind(b" obj", 0, i)
    k = pdf.rfind(b"\n", 0, j)
    return int(pdf[k + 1:j].split()[0])


def test_outline_utf16_title_and_goto_action():
    pdf = bytearray(_pdf([(0, "PLACE", 0)]))
    # swap the literal title for a UTF-16BE hex-less literal string
    utf16 = b"\xfe\xff" + "Größe".encode("utf-16-be")
    esc = utf16.replace(b"\\", b"\\\\").replace(b"(", b"\\(") \
               .replace(b")", b"\\)")
    i = pdf.find(b"(PLACE)")
    pdf[i:i + 7] = b"(" + esc + b")"
    out = extract_outline(bytes(pdf))
    assert out[0]["title"] == "Größe"


def test_outline_missing_dest_is_page_minus_one():
    pdf = bytearray(_pdf([(0, "A", 0)]))
    i = pdf.find(b"/Dest")
    end = pdf.find(b"]", i)
    pdf[i:end + 1] = b" " * (end + 1 - i)   # blank out the dest
    out = extract_outline(bytes(pdf))
    assert out[0]["page_no"] == -1 and out[0]["title"] == "A"


def test_synth_without_outline_is_unchanged():
    # the outline arg must not perturb the no-outline byte stream
    # (golden PDFs elsewhere in the suite depend on it)
    a = synth_pdf_pages([["x"], ["y"]])
    b = synth_pdf_pages([["x"], ["y"]], outline=None)
    assert a == b


def test_pdf_links_roundtrip_and_order():
    from docling_spark.parsers.pdfio import extract_pdf_links
    pdf = synth_pdf_pages(
        [["p0"], ["p1"]],
        links=[(1, "https://b.com/2"), (0, "https://a.com/1"),
               (0, "https://c.com/3")])
    out = extract_pdf_links(pdf)
    # page order first, then /Annots array order (input order per page)
    assert [(e["page_no"], e["url"]) for e in out] == [
        (0, "https://a.com/1"), (0, "https://c.com/3"),
        (1, "https://b.com/2")]
    assert [e["link_idx"] for e in out] == [0, 1, 2]
    assert out[0]["r"] - out[0]["l"] == 200.0


def test_pdf_links_absent_and_with_outline():
    from docling_spark.parsers.pdfio import (extract_outline,
                                             extract_pdf_links)
    assert extract_pdf_links(synth_pdf_pages([["x"]])) == []
    # outline + links coexist: object numbering must not collide
    pdf = synth_pdf_pages([["x"], ["y"]],
                          outline=[(0, "A", 0), (1, "A.1", 1)],
                          links=[(0, "https://e.com/u")])
    assert [e["title"] for e in extract_outline(pdf)] == ["A", "A.1"]
    out = extract_pdf_links(pdf)
    assert [(e["page_no"], e["url"]) for e in out] == \
        [(0, "https://e.com/u")]


def test_pdf_links_skips_non_uri_annotations():
    from docling_spark.parsers.pdfio import extract_pdf_links
    pdf = bytearray(synth_pdf_pages([["x"]],
                                    links=[(0, "https://keep.com/")]))
    # corrupt the action type: /S /URI -> /S /XXX is skipped
    out = extract_pdf_links(bytes(pdf))
    assert len(out) == 1
    pdf2 = bytes(pdf).replace(b"/S /URI", b"/S /XXX")
    assert extract_pdf_links(pdf2) == []
