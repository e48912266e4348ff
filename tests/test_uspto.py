"""USPTO patent backend: 4 bulk-data dialects.

The only groundtruth fixture is the APS grant (pftaps057006474) — gated
by exact span-sequence equality. The XML dialects are pinned against the
reference's own unit-test expectations
(/root/reference/tests/test_backend_patent_uspto.py:128-470): span
counts, specific texts including Greek-entity and sub/superscript
resolution, formula suppression, and the unified-table shape.
"""

from pathlib import Path

import pytest

from docling_spark.doctree import flatten, serialize_table
from docling_spark.golden import load_golden
from docling_spark.parsers.uspto_parser import (
    _parse_oasis_table,
    parse_uspto_document,
    sniff_uspto_dialect,
)

USPTO_DIR = Path("/root/reference/tests/data/uspto")


def spans_for(name: str):
    payload = (USPTO_DIR / name).read_text(encoding="utf-8")
    return flatten(parse_uspto_document(payload))


def test_aps_golden_span_equality():
    got = spans_for("pftaps057006474.txt")
    want = load_golden("pftaps057006474")
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got] \
        == [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want]


def test_aps_structure():
    # mirrors reference test_patent_uspto_grant_aps (:430-470)
    got = spans_for("pftaps057006474.txt")
    assert len(got) == 75
    assert got[0]["kind"] == "title"
    assert got[0]["text"] == "Carbocation containing cyanine-type dye"
    assert got[1] == {"kind": "section_header", "text": "ABSTRACT",
                      "media_ref": "", "offset": 1}
    assert got[2]["text"].startswith(
        "To provide a reagent with excellent stability under storage")
    assert got[2]["text"].endswith(
        "Complexes of a compound represented by the general formula (IV):")
    assert all("##STR1##" not in s["text"] for s in got)


def test_dialect_sniff():
    cases = {
        "pftaps057006474.txt": "aps",
        "ipa20200022300.xml": "ice",
        "ipg08672134.xml": "ice",
        "pg06442728.xml": "grant2",
        "pa20010031492.xml": "app1",
    }
    for name, want in cases.items():
        payload = (USPTO_DIR / name).read_text(encoding="utf-8")
        assert sniff_uspto_dialect(payload) == want, name


def test_ice_application():
    # mirrors reference test_patent_uspto_ice (:138-186)
    got = spans_for("ipa20200022300.xml")
    assert len(got) == 78
    assert got[0]["kind"] == "title"
    assert got[0]["text"] == (
        "SYSTEM FOR CONTROLLING THE OPERATION OF AN ACTUATOR MOUNTED ON "
        "A SEED PLANTING IMPLEMENT")
    assert got[1]["kind"] == "section_header"
    assert got[1]["text"] == "ABSTRACT"
    assert got[2]["kind"] == "paragraph"
    assert got[2]["text"].startswith(
        "In one aspect, a system for controlling an operation of an "
        "actuator mounted on a seed planting implement")
    assert got[3] == {"kind": "section_header", "text": "FIELD",
                      "media_ref": "", "offset": 3}


def test_grant_v2_subscripts_and_formula_suppression():
    # mirrors reference test_patent_uspto_grant_v2 (:356-397)
    got = spans_for("pg06442728.xml")
    assert len(got) == 108
    assert got[0]["text"] == "Methods and apparatus for turbo code"
    assert got[1]["text"] == "ABSTRACT"
    # subscript runs from <SB> wrappers resolve to Unicode subscripts
    assert got[2]["text"].startswith(
        "An interleaver receives incoming data frames of size N. The "
        "interleaver indexes the elements of the frame with an N₁×N₂ "
        "index array.")
    texts = [s["text"] for s in got]
    # formulas (<CWU> islands) are suppressed, not inlined
    assert ("Calculating the specified equation with the specified values "
            "for permuting row 0 of array D 350 into row 0 of array D₁ 360 "
            "proceeds as:") in texts
    assert ("and the permuted data frame is contained in array D₁ 360 shown "
            "in FIG. 3. Outputting the array column by column outputs the "
            "frame elements in the order:") in texts


def test_app_v1_tables_and_math():
    # mirrors reference test_patent_uspto_app_v1 (:400-427)
    got = spans_for("pa20010031492.xml")
    tables = [s for s in got if s["kind"] == "table"]
    assert len(got) - len(tables) == 103
    assert got[0]["text"] == "Assay reagent"
    assert got[1]["text"] == "ABSTRACT"
    texts = [s["text"] for s in got]
    assert ("5. The % toxic effect for each sample was calculated as "
            "follows:") in texts
    assert "where: Cₒ=light in control at time zero" in texts
    assert len(tables) == 1
    header = tables[0]["text"].splitlines()[0]
    assert header == "6x3"


def test_unified_table_normalization():
    # mirrors reference test_tables (:128-135): 4 tgroups with different
    # column widths unify into a single 13x10 dense grid
    payload = (USPTO_DIR / "tables_ipa20180000016.xml").read_text("utf-8")
    xml_island = payload.split("?>", 1)[1].strip()
    table = _parse_oasis_table(xml_island)
    assert table.num_rows == 13
    assert table.num_cols == 10
    grid_lines = serialize_table(table).splitlines()
    assert grid_lines[0] == "13x10"
    assert len(grid_lines) == 1 + 13 + 1  # shape line + rows + header flags


def test_all_fixtures_parse_without_error():
    for path in sorted(USPTO_DIR.glob("*")):
        payload = path.read_text(encoding="utf-8")
        if sniff_uspto_dialect(payload) is None:
            continue  # bare table island has no DOCTYPE — not a patent doc
        spans = flatten(parse_uspto_document(payload))
        assert spans, path.name
        kinds = {s["kind"] for s in spans}
        assert "title" in kinds, path.name


def test_uspto_through_spark(spark):
    from docling_spark.operators.extract import extract_spans

    rows = []
    for i, name in enumerate(
            ["pftaps057006474.txt", "ipa20200022300.xml",
             "pg06442728.xml", "pa20010031492.xml"]):
        payload = (USPTO_DIR / name).read_text(encoding="utf-8")
        rows.append((f"uspto_{i}", [("uspto", payload, "", 0)]))
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    out = {r["doc_id"]: r for r in extract_spans(df).collect()}
    assert all(r["status"] == "success" for r in out.values())
    assert out["uspto_0"]["n_spans"] == 75
    assert out["uspto_1"]["n_spans"] == 78
    golden = load_golden("pftaps057006474")
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in out["uspto_0"]["spans"]]
    assert got == [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in golden]
