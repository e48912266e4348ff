"""Minimal deterministic Office-container payload builders.

Driver-side synthesis of tiny-but-real DOCX / XLSX / PPTX files
(stdlib ``zipfile`` + fixed timestamps → byte-deterministic), used by
the driver-oracle queries for the binary declarative formats: the
corpus carries ``doc_id % N_VARIANTS`` of these as base64 payloads and
the DuckDB oracle predicts the extraction output per variant with a
plain CASE expression.

These are structurally faithful OOXML documents (the same parts the
reference backends read: word/document.xml + styles.xml, xl/workbook +
worksheet + sharedStrings, ppt/presentation + slide), not fixtures
copied from anywhere — content is templated from the variant index.
"""

from __future__ import annotations

import base64
import io
import zipfile
from typing import Dict, List

N_VARIANTS = 4

_FIXED_DATE = (1980, 1, 1, 0, 0, 0)


def _zip_bytes(parts: Dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in sorted(parts):
            info = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, parts[name])
    return buf.getvalue()


# ---------------------------------------------------------------------------
# DOCX

_DOCX_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
<w:style w:type="paragraph" w:default="1" w:styleId="Normal">
<w:name w:val="Normal"/></w:style>
<w:style w:type="paragraph" w:styleId="Title">
<w:name w:val="Title"/></w:style>
<w:style w:type="paragraph" w:styleId="Heading1">
<w:name w:val="heading 1"/></w:style>
</w:styles>
"""


def _docx_par(style: str, text: str) -> str:
    ps = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    return f"<w:p>{ps}<w:r><w:t>{text}</w:t></w:r></w:p>"


def docx_payload(v: int) -> str:
    body = "".join([
        _docx_par("Title", f"Doc v{v}"),
        _docx_par("", f"variant {v} body words"),
        _docx_par("Heading1", "Stats"),
        _docx_par("", f"{v} items"),
    ])
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>")
    return base64.b64encode(_zip_bytes({
        "word/document.xml": document,
        "word/styles.xml": _DOCX_STYLES,
    })).decode("ascii")


# ---------------------------------------------------------------------------
# XLSX

def xlsx_payload(v: int) -> str:
    ss = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
        'main" count="3" uniqueCount="3">'
        "<si><t>name</t></si><si><t>count</t></si><si><t>doc</t></si></sst>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2">'
        f'<c r="A2" t="s"><v>2</v></c><c r="B2"><v>{v}</v></c></row>'
        "</sheetData></worksheet>")
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships">'
        '<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>')
    return base64.b64encode(_zip_bytes({
        "xl/workbook.xml": workbook,
        "xl/_rels/workbook.xml.rels": wb_rels,
        "xl/worksheets/sheet1.xml": sheet,
        "xl/sharedStrings.xml": ss,
    })).decode("ascii")


# ---------------------------------------------------------------------------
# PPTX

def pptx_payload(v: int) -> str:
    def sp(ph: str, text: str) -> str:
        return (
            "<p:sp><p:nvSpPr><p:cNvPr id=\"1\" name=\"s\"/><p:cNvSpPr/>"
            f"<p:nvPr><p:ph type=\"{ph}\"/></p:nvPr></p:nvSpPr><p:spPr/>"
            f"<p:txBody><a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody>"
            "</p:sp>")
    slide = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/'
        'main" xmlns:p="http://schemas.openxmlformats.org/presentationml/'
        '2006/main">'
        "<p:cSld><p:spTree>"
        + sp("title", f"Doc v{v}")
        + sp("body", f"variant {v} slide words")
        + "</p:spTree></p:cSld></p:sld>")
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships">'
        '<p:sldIdLst><p:sldId id="256" r:id="rId1"/></p:sldIdLst>'
        "</p:presentation>")
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/slide" '
        'Target="slides/slide1.xml"/></Relationships>')
    return base64.b64encode(_zip_bytes({
        "ppt/presentation.xml": presentation,
        "ppt/_rels/presentation.xml.rels": pres_rels,
        "ppt/slides/slide1.xml": slide,
    })).decode("ascii")


def payload_variants(kind: str) -> List[str]:
    builder = {"docx": docx_payload, "xlsx": xlsx_payload,
               "pptx": pptx_payload}[kind]
    return [builder(v) for v in range(N_VARIANTS)]
