"""Hostile-input properties for the round-4 late parsers: random
bytes/markup must never raise, and synth→parse round-trips must be
exact (hypothesis; mirrors test_fuzz_containment's posture)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_spark.operators.feeds import parse_feed
from docling_spark.operators.metadata import extract_metadata
from docling_spark.operators.multimodal import parse_exif, synth_tiff
from docling_spark.parsers.pdfio import extract_outline
from docling_spark.sources.pdfsynth import synth_pdf_pages

_text = st.text(max_size=400)
_blob = st.binary(max_size=400)


@settings(max_examples=150, deadline=None)
@given(_text)
def test_extract_metadata_never_raises(s):
    out = extract_metadata(s)
    assert set(out) == {"title", "canonical", "description",
                        "og_title", "og_image", "og_type",
                        "jsonld_types", "robots_meta", "n_meta"}


@settings(max_examples=150, deadline=None)
@given(_text)
def test_parse_feed_never_raises(s):
    out = parse_feed(s)
    assert isinstance(out, list)
    assert [e["entry_idx"] for e in out] == list(range(len(out)))


@settings(max_examples=200, deadline=None)
@given(_blob)
def test_parse_exif_never_raises(b):
    out = parse_exif(b)
    assert out is None or out["byte_order"] in ("II", "MM")


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=8, max_size=400))
def test_parse_exif_tiff_prefixed_garbage(b):
    # a valid magic with garbage after it must degrade, not raise
    for magic in (b"II*\x00", b"MM\x00*"):
        out = parse_exif(magic + b[4:])
        assert out is None or out["n_tags"] >= 0


@settings(max_examples=100, deadline=None)
@given(_blob)
def test_extract_outline_never_raises(b):
    # arbitrary bytes: the brute-scan recovery path must still bound
    assert isinstance(extract_outline(b), list)


_title = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=30)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), _title,
                          st.integers(0, 1)),
                min_size=1, max_size=12))
def test_outline_roundtrip_titles_and_count(entries):
    # levels may jump arbitrarily on input; the writer clamps jumps
    # to "child of the last shallower item", so round-tripped levels
    # are a canonical (order-preserving) form and titles/pages match
    pdf = synth_pdf_pages([["a"], ["b"]], outline=list(entries))
    out = extract_outline(pdf)
    assert len(out) == len(entries)
    # titles are printable-ASCII here, so the literal-string escape
    # round-trip is verbatim
    assert [e["title"] for e in out] == [t for _, t, _ in entries]
    assert [e["page_no"] for e in out] == [p for _, _, p in entries]
    assert [e["idx"] for e in out] == list(range(len(entries)))
    # pre-order levels: start at 0, never deepen by more than 1
    lv = [e["level"] for e in out]
    assert lv[0] == 0
    assert all(b - a <= 1 for a, b in zip(lv, lv[1:]))


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 65535), st.integers(1, 65535),
       st.integers(1, 8), _title, _title,
       st.booleans())
def test_exif_roundtrip(w, h, o, make, model, le):
    out = parse_exif(synth_tiff(w, h, o, make, model,
                                "2024:01:01", little_endian=le))
    assert (out["width"], out["height"], out["orientation"]) == (w, h, o)
    # latin-1 replacement is the documented lossy step
    assert out["make"] == make.encode("latin-1", "replace") \
        .decode("latin-1")
    assert out["byte_order"] == ("II" if le else "MM")
