"""Exact format-guessing chain — Arrow-batched re-implementation of the
reference's full ``_guess_format`` flow for stream inputs
(/root/reference/docling/datamodel/document.py:274-427), including the
two probes the pure-Catalyst sniffer (operators/sniff.py) only
approximates:

* the ``csv.Sniffer`` CSV probe (``_detect_csv``, document.py:400-427)
  — run here verbatim via the stdlib sniffer, same delimiter accept-set
  ``{, ; \\t |}``;
* the extension→mime fallback (``_mime_from_extension``,
  document.py:348-363) with the same priority order
  (asciidoc > html > md > csv > docling-json > pdf) over the same
  extension lists (datamodel/base_models.py:57-70).

Chain order (document.py:288-311, stream branch):
  1. magic-byte mime (the ``filetype.guess_mime`` analogue: PDF, PNG,
     JPEG, TIFF, BMP, GIF, OOXML-zip member probe)
  2. if none → extension→mime fallback from the filename
  3. if none → ``_detect_html_xhtml`` (comment-strip, lowercase,
     ``<?xml``+xhtml, html doctype/tag match, generic
     DOCTYPE-root-echo XML rule; document.py:365-398)
  4. if none → ``_detect_csv`` (csv.Sniffer; document.py:400-427)
  5. if none → ``text/plain``
  6. mime → format list (base_models.py:102-105); ambiguity resolved by
     ``_guess_from_content`` (document.py:313-346): application/xml
     DOCTYPE markers → uspto / jats; text/plain ``PATN\\r\\n`` → uspto.

All per-row logic is inside one scalar Pandas UDF (Arrow batches); the
payload arrives as a ``binary`` column so byte-level magic checks are
faithful. Undetectable inputs yield format ``'unknown'`` (the
reference returns ``None`` and skips the doc).
"""

from __future__ import annotations

import csv
import re
from typing import Optional, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# extension lists: base_models.py:57-70 (only the formats
# _mime_from_extension checks, in its priority order)
_EXT_MIME_PRIORITY: Tuple[Tuple[Tuple[str, ...], str], ...] = (
    (("adoc", "asciidoc", "asc"), "text/asciidoc"),
    (("html", "htm", "xhtml"), "text/html"),
    (("md",), "text/markdown"),
    (("csv",), "text/csv"),
    (("json",), "application/json"),
    (("pdf",), "application/pdf"),
)

# mime → engine format label (MimeTypeToFormat, base_models.py:102-105,
# collapsed to this engine's `kind` vocabulary); a LIST marks ambiguity
# that _guess_from_content must resolve.
_MIME_FORMAT = {
    "text/html": "html",
    "application/xhtml+xml": "html",
    "text/markdown": "md",
    "text/csv": "csv",
    "text/asciidoc": "asciidoc",
    "application/json": "docling_json",
    "application/pdf": "pdf",
    "application/xml": ["jats", "uspto"],
    "text/plain": ["uspto"],
    "application/vnd.openxmlformats-officedocument"
    ".wordprocessingml.document": "docx",
    "application/vnd.openxmlformats-officedocument"
    ".spreadsheetml.sheet": "xlsx",
    "application/vnd.openxmlformats-officedocument"
    ".presentationml.presentation": "pptx",
    "image/png": "image",
    "image/jpeg": "image",
    "image/tiff": "image",
    "image/bmp": "image",
    "image/gif": "image",
}

_USPTO_DOCTYPE_MARKERS = (
    "us-patent-application-v4",
    "us-patent-grant-v4",
    "us-grant-025",
    "patent-application-publication",
)

_XML_DECL_RE = re.compile(r"<\?xml")
_HTML_RE = re.compile(r"<!doctype\s+html|<html|<head|<body")
_DOCTYPE_ROOT_RE = re.compile(
    r"<!doctype\s+(?P<root>[a-zA-Z_:][a-zA-Z0-9_:.-]*)\s+.*>\s*<(?P=root)\b")
_COMMENT_RE = re.compile(r"<!--(.*?)-->", flags=re.DOTALL)
_DOCTYPE_RE = re.compile(r"<!DOCTYPE [^>]+>")


def _magic_mime(data: bytes) -> Optional[str]:
    """Magic-byte mime detection — the ``filetype.guess_mime`` analogue
    for the containers this engine routes (document.py:288-291). OOXML
    zips are told apart by probing the raw head for their first member
    paths, the same trick the filetype lib uses."""
    if data.startswith(b"%PDF"):
        return "application/pdf"
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if data.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if data.startswith(b"II*\x00") or data.startswith(b"MM\x00*"):
        return "image/tiff"
    if data.startswith(b"BM"):
        return "image/bmp"
    if data.startswith(b"GIF8"):
        return "image/gif"
    if data.startswith(b"PK\x03\x04"):
        head = data[:8192]
        if b"word/" in head:
            return ("application/vnd.openxmlformats-officedocument"
                    ".wordprocessingml.document")
        if b"xl/" in head:
            return ("application/vnd.openxmlformats-officedocument"
                    ".spreadsheetml.sheet")
        if b"ppt/" in head:
            return ("application/vnd.openxmlformats-officedocument"
                    ".presentationml.presentation")
        return None  # bare zip: filetype says application/zip → no format
    return None


def _mime_from_extension(name: str) -> Optional[str]:
    """document.py:348-363 over the stream-branch extension rule
    (document.py:291-296): everything after the last dot, no leading-dot
    names."""
    if "." not in name or name.startswith("."):
        return None
    ext = name.rsplit(".", 1)[-1].lower()
    for exts, mime in _EXT_MIME_PRIORITY:
        if ext in exts:
            return mime
    return None


def _detect_html_xhtml(content: bytes) -> Optional[str]:
    """document.py:365-398, byte-for-byte semantics."""
    s = content.decode("ascii", errors="ignore").lower()
    s = _COMMENT_RE.sub("", s).lstrip()
    if _XML_DECL_RE.match(s):
        return ("application/xhtml+xml" if "xhtml" in s[:1000]
                else "application/xml")
    if _HTML_RE.match(s):
        return "text/html"
    if _DOCTYPE_ROOT_RE.search(s):
        return "application/xml"
    return None


def _detect_csv(content: bytes) -> Optional[str]:
    """document.py:400-427 — the real ``csv.Sniffer``, same accept-set."""
    s = content.decode("ascii", errors="ignore").strip()
    if "\n" not in s:
        return None
    try:
        dialect = csv.Sniffer().sniff(s)
        if dialect.delimiter in {",", ";", "\t", "|"}:
            return "text/csv"
    except csv.Error:
        return None
    return None


def _guess_from_content(content: bytes, mime: str) -> Optional[str]:
    """Ambiguity resolution, document.py:313-346: application/xml
    DOCTYPE markers and the text/plain APS ``PATN\\r\\n`` probe."""
    s = content.decode("utf-8", errors="ignore")
    if mime == "application/xml":
        m = _DOCTYPE_RE.search(s)
        if m:
            doctype = m.group()
            if any(marker in doctype for marker in _USPTO_DOCTYPE_MARKERS):
                return "uspto"
            if ("JATS-journalpublishing" in doctype
                    or "JATS-archive" in doctype):
                return "jats"
    elif mime == "text/plain":
        if s.startswith("PATN\r\n"):
            return "uspto"
    return None


def guess_mime_and_format(data: bytes, name: str) -> Tuple[str, str]:
    """One document through the full chain; returns (mime, format) with
    ``'unknown'`` where the reference returns None."""
    head = data[:8192]
    mime = _magic_mime(head)
    if mime is None:
        mime = _mime_from_extension(name or "")
    mime = mime or _detect_html_xhtml(head)
    mime = mime or _detect_csv(head)
    mime = mime or "text/plain"
    fmt = _MIME_FORMAT.get(mime)
    if fmt is None:
        return mime, "unknown"
    if isinstance(fmt, str) and mime != "text/plain":
        return mime, fmt
    # ambiguous mime (or text/plain): content decides (document.py:303-310)
    resolved = _guess_from_content(head, mime)
    return mime, resolved or "unknown"


_SNIFF_SCHEMA = "mime string, format string"


def _build_udf():
    @F.pandas_udf(_SNIFF_SCHEMA)
    def sniff_exact(payload: pd.Series, name: pd.Series) -> pd.DataFrame:
        mimes, fmts = [], []
        for data, nm in zip(payload, name):
            m, f = guess_mime_and_format(bytes(data or b""), nm or "")
            mimes.append(m)
            fmts.append(f)
        return pd.DataFrame({"mime": mimes, "format": fmts})

    return sniff_exact


_UDF = None


def exact_sniff_col(payload: Column, name: Column) -> Column:
    """struct(mime, format) for a binary payload + filename column pair
    (lazy singleton UDF — built once per session, not per call)."""
    global _UDF
    if _UDF is None:
        _UDF = _build_udf()
    return _UDF(payload, name)


def with_exact_format(df: DataFrame, payload_col: str = "payload_bin",
                      name_col: str = "filename") -> DataFrame:
    """Adds ``mime`` and ``format`` columns via the exact probe chain.
    ``payload_col`` must be ``binary`` (use ``F.encode``/``F.unbase64``
    upstream); the filename participates only through its extension,
    mirroring the reference's stream branch."""
    probed = df.withColumn(
        "_sniff", exact_sniff_col(F.col(payload_col), F.col(name_col)))
    return (probed
            .withColumn("mime", F.col("_sniff.mime"))
            .withColumn("format", F.col("_sniff.format"))
            .drop("_sniff"))


# ---------------------------------------------------------------------------
# charset sniffing (WHATWG Encoding §6 "determine the encoding" subset)

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe\x00\x00", "utf-32le"),
    (b"\x00\x00\xfe\xff", "utf-32be"),
    (b"\xff\xfe", "utf-16le"),
    (b"\xfe\xff", "utf-16be"),
)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9._-]+)", re.I)


def detect_charset(data: bytes) -> Tuple[str, str]:
    """(charset, method) for a raw document payload, in the WHATWG
    Encoding precedence a browser/crawler applies when the transport
    layer declares nothing: BOM first (authoritative), then an HTML
    ``<meta charset>`` scan over the first 1024 bytes, then a strict
    UTF-8 validity pass, then the windows-1252 legacy fallback (the
    WHATWG default for unlabeled non-UTF-8 bytes; never fails —
    every byte maps). Method ∈ {bom, meta, utf8_valid, fallback}."""
    for bom, cs in _BOMS:
        if data.startswith(bom):
            return cs, "bom"
    m = _META_CHARSET_RE.search(data[:1024])
    if m:
        return m.group(1).decode("ascii").lower(), "meta"
    try:
        data.decode("utf-8", "strict")
        return "utf-8", "utf8_valid"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


_CHARSET_SCHEMA = "struct<charset: string, method: string>"
_CHARSET_UDF = None


def charset_col(payload: Column) -> Column:
    """struct(charset, method) for a binary payload column."""
    global _CHARSET_UDF
    if _CHARSET_UDF is None:
        @F.pandas_udf(_CHARSET_SCHEMA)
        def _sniff_charset(payload: pd.Series) -> pd.DataFrame:
            cs, how = [], []
            for data in payload:
                c, h = detect_charset(bytes(data or b""))
                cs.append(c)
                how.append(h)
            return pd.DataFrame({"charset": cs, "method": how})
        _CHARSET_UDF = _sniff_charset
    return _CHARSET_UDF(payload)


def with_charset(df: DataFrame,
                 payload_col: str = "payload_bin") -> DataFrame:
    """Adds ``charset`` and ``method`` columns for a binary payload —
    the decode-planning step between container ingestion
    (operators/warc.py) and text extraction: at crawl scale the
    result keys a dictionary-encoded partition-friendly column, and
    the actual decode happens once, inside the extraction UDF, with
    the charset pinned instead of re-guessed."""
    probed = df.withColumn("_cs", charset_col(F.col(payload_col)))
    return (probed
            .withColumn("charset", F.col("_cs.charset"))
            .withColumn("method", F.col("_cs.method"))
            .drop("_cs"))
