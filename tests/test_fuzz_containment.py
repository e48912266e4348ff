"""Property-based containment tests (hypothesis): no payload, however
malformed, may escape the per-document error containment — the UDF
contract that one poisoned document can never kill a 100-TB task
(mirrors the reference's raises_on_error=False path,
document_converter.py:303-326)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_spark.operators.extract import _extract_one, _load_parsers

PARSERS = _load_parsers()
KINDS = sorted(k for k, v in PARSERS.items() if v is not None)

payloads = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)


@settings(max_examples=60, deadline=None)
@given(kind=st.sampled_from(KINDS), payload=payloads)
def test_extract_one_never_raises(kind, payload):
    spans, status, errors, _md, _itxt, _html = _extract_one(
        [{"kind": kind, "text": payload, "media_ref": "", "offset": 0}],
        PARSERS)
    assert status in ("success", "failure", "skipped")
    if status != "success":
        assert spans == []
    for s in spans:
        assert set(s) == {"kind", "text", "media_ref", "offset"}
    assert [s["offset"] for s in spans] == list(range(len(spans)))


@settings(max_examples=40, deadline=None)
@given(payload=payloads)
def test_pdf_page_payloads_contained(payload):
    spans, status, errors, _md, _itxt, _html = _extract_one(
        [{"kind": "pdf_page", "text": payload, "media_ref": "",
          "offset": 0}], PARSERS)
    assert status in ("success", "failure", "skipped")


@settings(max_examples=40, deadline=None)
@given(payload=st.binary(max_size=300).map(
    lambda b: __import__("base64").b64encode(b).decode()))
def test_binary_container_payloads_contained(payload):
    # docx/xlsx/pptx take base64 zip containers; arbitrary bytes must
    # fail cleanly, never crash
    for kind in ("docx", "xlsx", "pptx"):
        spans, status, errors, _md, _itxt, _html = _extract_one(
            [{"kind": kind, "text": payload, "media_ref": "",
              "offset": 0}], PARSERS)
        assert status in ("success", "failure", "skipped")
        if status == "failure":
            assert errors and errors[0]["component"] == "extract"
