"""From-scratch native PDF reader (parsers/pdfio.py) — real-corpus
parity vs the reference's own cell dumps, plus unit pins.

The reference verifies its PDF parse with verify_cells
(/root/reference/tests/verify_utils.py:59-88) against
tests/data/groundtruth/docling_v2/*.pages.json. Those cells come from
the docling-parse NATIVE library; an independent implementation of
the PDF spec cannot be byte-identical in cell segmentation, so the
gate here is bag-of-words / bag-of-chars precision+recall floors per
fixture — measured, not aspirational (see tools/pdf_parity.py).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docling_spark.parsers.pdfio import (  # noqa: E402
    Lexer, PdfDocument, assemble_lines, extract_pdf_cells,
    parse_tounicode)
from docling_spark.sources.pdfsynth import synth_pdf  # noqa: E402
from tools.pdf_parity import PDF_DIR, compare  # noqa: E402

# measured floors (slightly below current, so real regressions trip
# them but rounding noise does not). Two word granularities:
# cell-level (docling-parse's own sub-line cells) and LINE-level
# (both sides assembled into lines by the same rule,
# tools/pdf_parity.py::gt_line_texts) — the line is the gate because
# docling-parse's sub-line segmentation is provably not a function of
# the content stream (see gt_line_texts docstring: identical
# fragment/kern patterns merge at one x and split at another on the
# SAME line of right_to_left_02), while nothing downstream consumes
# sub-line boundaries (docling itself re-merges cells into lines).
# Char parity stays cell-level: content completeness is
# granularity-free.
#
# The residual right_to_left_02 line-level word deltas (~6% of words)
# were traced glyph-by-glyph and are unsatisfiable by ANY space rule:
# the groundtruth DROPS a real code-3 space glyph with a 0.24 em
# advance mid-line ('علا ،' → joined 'علا،') yet SPLITS a 0.066 em
# kern gap on another line of the same page ('را رقتسظا') — the same
# page demands both "spaces are characters" and "spaces are geometry".
# Both a pure-geometric rule and a drop-wide-mis-mapped-space-glyph
# rule (the page's ToUnicode maps ~40 letter-wide glyphs to ' ') were
# measured to move parity by exactly zero.
FLOORS = {
    # name: (word_p, word_r, line_word_p, line_word_r, char_p, char_r)
    "2305.03393v1-pg9": (0.98, 0.98, 0.98, 0.98, 0.99, 0.99),
    "amt_handbook_sample": (0.98, 0.98, 0.99, 0.99, 0.99, 0.99),
    "code_and_formula": (0.99, 0.99, 0.99, 0.99, 0.99, 0.99),
    "picture_classification": (0.99, 0.99, 0.99, 0.99, 0.99, 0.99),
    "redp5110_sampled": (0.97, 0.96, 0.97, 0.97, 0.985, 0.985),
    "right_to_left_01": (0.95, 0.94, 0.96, 0.97, 0.99, 0.99),
    "right_to_left_02": (0.65, 0.45, 0.87, 0.91, 0.99, 0.98),
    "right_to_left_03": (0.99, 0.99, 0.99, 0.99, 0.99, 0.99),
}

needs_corpus = pytest.mark.skipif(not PDF_DIR.exists(),
                                  reason="reference corpus absent")


@needs_corpus
@pytest.mark.parametrize("name", sorted(FLOORS))
def test_real_pdf_parity(name):
    got = compare(name)
    wp, wr, lwp, lwr, cp, cr = FLOORS[name]
    assert got["pages"] == got["gt_pages"]
    assert got["word_p"] >= wp, got
    assert got["word_r"] >= wr, got
    assert got["line_word_p"] >= lwp, got
    assert got["line_word_r"] >= lwr, got
    assert got["char_p"] >= cp, got
    assert got["char_r"] >= cr, got


# -- unit pins ---------------------------------------------------------------


def test_lexer_objects():
    lx = Lexer(b"<< /A 1 /B (he\\)llo) /C [1 2 R 3.5] /D <414243> >>")
    d = lx.read_object()
    assert d["A"] == 1
    assert d["B"] == b"he)llo"
    assert d["C"][0].num == 1 and d["C"][1] == 3.5
    assert d["D"] == b"ABC"


def test_tounicode_bfrange_and_bfchar():
    cmap = (b"1 beginbfchar <0041> <0061> endbfchar\n"
            b"1 beginbfrange <0030> <0032> <0041> endbfrange")
    m = parse_tounicode(cmap)
    assert m[0x41] == "a"
    assert m[0x30] == "A" and m[0x32] == "C"


def test_synth_roundtrip_exact():
    text = "Hello Spark native PDF round trip 12345"
    pages = extract_pdf_cells(synth_pdf([text, ""]))
    assert len(pages) == 2
    cells = [c for p in pages for c in p["cells"]]
    assert len(cells) == 1
    assert cells[0]["text"] == text


def test_synth_roundtrip_uncompressed_and_escapes():
    text = "parens (and) back\\slash"
    pages = extract_pdf_cells(synth_pdf([text], compress=False))
    assert pages[0]["cells"][0]["text"] == text


def test_assemble_lines_splits_scripts_and_spaces():
    runs = [
        {"text": "E", "x0": 0, "x1": 6, "y0": 0, "y1": 10,
         "baseline": 10, "size": 10},
        {"text": "2", "x0": 6.2, "x1": 9, "y0": 0, "y1": 6,
         "baseline": 8.0, "size": 5},   # adjacent, raised, smaller
        {"text": "next", "x0": 14, "x1": 30, "y0": 0, "y1": 10,
         "baseline": 10, "size": 10},   # gap > space threshold
    ]
    cells = assemble_lines(runs)
    assert cells[0]["text"] == "E$^{2}$ next"


def test_fake_bold_dedup_keeps_single_glyph_stacks():
    bold = [{"text": "Hi", "x0": 0, "x1": 10, "y0": 0, "y1": 10,
             "baseline": 10, "size": 10},
            {"text": "Hi", "x0": 0.2, "x1": 10.2, "y0": 0, "y1": 10,
             "baseline": 10, "size": 10}]
    assert assemble_lines(bold)[0]["text"] == "Hi"
    stacked = [{"text": "و", "x0": 5, "x1": 5, "y0": 0, "y1": 10,
                "baseline": 10, "size": 10},
               {"text": "و", "x0": 5, "x1": 5, "y0": 0, "y1": 10,
                "baseline": 10, "size": 10}]
    assert "".join(c["text"] for c in assemble_lines(stacked)) == "وو"


@needs_corpus
def test_real_pdf_page_dims():
    data = (PDF_DIR / "2305.03393v1-pg9.pdf").read_bytes()
    doc = PdfDocument(data)
    pages = doc.pages()
    assert len(pages) == 1
    mb = [float(v) for v in doc.resolve(pages[0]["MediaBox"])]
    assert mb == [0.0, 0.0, 612.0, 792.0]
