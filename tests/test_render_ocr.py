"""Page render + deterministic OCR (parsers/raster.py,
operators/render.py): atlas invariants, PNG codec conformance, exact
render→OCR round trips, clipping, and the Arrow path through Spark."""

import json
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_spark.parsers.raster import (
    ADVANCE,
    ATLAS,
    GLYPH_H,
    GLYPH_W,
    ocr_page,
    png_decode,
    png_encode,
    render_page,
)


def _cells(lines, x=50.0, top=50.0, step=12.0):
    return [{"text": t, "l": x, "t": top + i * step,
             "r": 400.0, "b": top + i * step + 10.0}
            for i, t in enumerate(lines)]


def test_atlas_unique_and_anchored():
    pats = list(ATLAS.values())
    assert len(set(pats)) == len(pats)  # every glyph decodes uniquely
    assert ATLAS[" "] == bytes(GLYPH_H)
    for ch, g in ATLAS.items():
        if ch == " ":
            continue
        assert g[0] & 0x10, ch        # top-left pixel pins the window
        assert g[GLYPH_H - 1] == 0x1F  # solid baseline row


def test_png_roundtrip_random():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(33, 41)).astype(np.uint8)
    data = png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = png_decode(data)
    assert out.dtype == np.uint8 and (out == img).all()


def test_png_validates_against_repo_header_parser():
    from docling_spark.operators.multimodal import parse_image_header
    img, _ = render_page(612.0, 792.0, _cells(["hi"]))
    assert parse_image_header(png_encode(img)) == (612, 792, "image/png")


def test_roundtrip_exact_all_printable():
    # every atlas glyph survives the full cycle, incl. '?' itself
    lines = ["".join(chr(c) for c in range(0x21, 0x40)),
             "".join(chr(c) for c in range(0x40, 0x60)),
             "".join(chr(c) for c in range(0x60, 0x7F))]
    img, drawn = render_page(612.0, 792.0, _cells(lines))
    assert drawn == sum(len(ln) for ln in lines)
    rec = ocr_page(img)
    assert [c["text"] for c in rec] == lines


def test_roundtrip_spaces_and_bbox():
    img, _ = render_page(612.0, 792.0, _cells(["a  b   c", "one two"]))
    rec = ocr_page(img)
    assert [c["text"] for c in rec] == ["a  b   c", "one two"]
    assert rec[0]["l"] == pytest.approx(50.0)
    assert rec[0]["t"] == pytest.approx(50.0)
    assert rec[1]["t"] == pytest.approx(62.0)
    assert rec[0]["r"] == pytest.approx(
        50.0 + 7 * ADVANCE + GLYPH_W)


def test_roundtrip_fuzz_words():
    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,;!?"
    lines = [" ".join("".join(rng.choice(alpha)
                              for _ in range(rng.randint(1, 8)))
                      for _ in range(rng.randint(1, 6)))
             for _ in range(40)]
    img, _ = render_page(612.0, 792.0, _cells(lines))
    rec = ocr_page(img)
    assert [c["text"] for c in rec] == lines


def test_clipping_skips_whole_glyphs():
    # word straddling the right edge: glyphs past the edge are skipped
    cells = [{"text": "wide", "l": 612.0 - 2 * ADVANCE - 1.0,
              "t": 50.0, "r": 612.0, "b": 60.0}]
    img, drawn = render_page(612.0, 792.0, cells)
    assert drawn == 2  # 'w','i' fit; 'd','e' clipped whole
    rec = ocr_page(img)
    assert rec[0]["text"] == "wi"


def test_dpi_scales_pixels_and_bboxes():
    img, _ = render_page(612.0, 792.0, _cells(["zoom"]), dpi=144.0)
    assert img.shape == (1584, 1224)
    rec = ocr_page(img, dpi=144.0)
    # glyph grid is pixel-pitch, so at 2x the text splits per glyph —
    # geometry (points) must still map back to the cell origin
    assert rec[0]["l"] == pytest.approx(50.0, abs=0.5)
    assert rec[0]["t"] == pytest.approx(50.0, abs=0.5)


def test_spark_render_ocr_roundtrip(spark):
    from docling_spark.operators.render import ocr_pages, render_pages
    rows = []
    for d in range(6):
        words = [f"w{d}x{i}" for i in range(d + 3)]
        spans = []
        for pno in range(2):
            half = words[:len(words) // 2] if pno == 0 \
                else words[len(words) // 2:]
            payload = {
                "page_no": pno, "width": 612.0, "height": 792.0,
                "cells": [{"index": i, "text": w, "l": 50.0,
                           "t": 50.0 + i * 12.0, "r": 400.0,
                           "b": 60.0 + i * 12.0}
                          for i, w in enumerate(half)],
            }
            spans.append(("pdf_page", json.dumps(payload), "", pno))
        rows.append((str(d), spans))
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    imgs = render_pages(df)
    got = (ocr_pages(imgs.select("doc_id", "page_no", "png"))
           .orderBy("doc_id", "page_no").collect())
    assert len(got) == 12
    for r in got:
        d = int(r.doc_id)
        words = [f"w{d}x{i}" for i in range(d + 3)]
        half = words[:len(words) // 2] if r.page_no == 0 \
            else words[len(words) // 2:]
        assert r.text == " ".join(half)
        assert r.n_cells == len(half)


def test_render_meta_columns(spark):
    from docling_spark.operators.render import render_pages
    payload = {"page_no": 0, "width": 306.0, "height": 396.0,
               "cells": [{"index": 0, "text": "abc", "l": 10.0,
                          "t": 10.0, "r": 100.0, "b": 20.0}]}
    df = spark.createDataFrame(
        [("0", [("pdf_page", json.dumps(payload), "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    row = render_pages(df, dpi=72.0).collect()[0]
    assert (row.width_px, row.height_px) == (306, 396)
    assert row.n_cells == 1 and row.n_glyphs == 3
    assert bytes(row.png)[:8] == b"\x89PNG\r\n\x1a\n"


def test_roundtrip_fuzz_random_gaps_same_line():
    """Segmentation stress for the batched glyph decoder: several
    words per line at RANDOM x positions (arbitrary inter-word gaps,
    not the renderer's uniform space advance). Property: per line, the
    recognized text with spaces removed equals the drawn glyph
    sequence, and recognized word count never exceeds what the gap
    rule can merge (adjacent words can fuse only when the gap is
    sub-space width, never reorder or drop)."""
    rng = random.Random(1234)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    for _ in range(15):
        cells = []
        per_line = []
        y = 40.0
        for _line in range(12):
            x = float(rng.randint(0, 60))
            words = []
            while True:
                w = "".join(rng.choice(alpha)
                            for _ in range(rng.randint(1, 8)))
                if x + len(w) * ADVANCE > 560:
                    break
                cells.append({"text": w, "l": x, "t": y,
                              "r": x + len(w) * ADVANCE, "b": y + 10})
                words.append(w)
                x += len(w) * ADVANCE + rng.randint(2, 60)
            per_line.append("".join(words))
            y += 14.0
        img, drawn = render_page(612.0, 792.0, cells)
        assert drawn == sum(len(s) for s in per_line)
        rec = ocr_page(img)
        got_lines = [c["text"].replace(" ", "") for c in rec]
        assert got_lines == [s for s in per_line if s]
