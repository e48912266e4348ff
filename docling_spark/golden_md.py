"""Golden-span derivation for Markdown fixtures.

The reference ships NO DoclingDocument JSON groundtruth for Markdown
inputs — only the canonical markdown re-export
(`tests/data/groundtruth/docling_v2/*.md.md`, written by
tests/test_backend_markdown.py). The golden span sequence is therefore
derived from that normalized export with the fixed rule below
(documented deviation, FIXTURES.md §3.5): the export is serializer
output, so its shape is closed — ATX headings, "- "/"n. " list items,
pipe tables, ``` fences, `<!-- image -->` placeholders, plain
paragraphs.

``delegated=True`` marks fixtures the reference routes through the
HTML backend (Markdown with raw HTML blocks, md_backend.py:389-423):
their paragraph items carry the HTML backend's "text" label instead of
the Markdown backend's "paragraph".
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List

from .doctree import serialize_grid

GROUNDTRUTH_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

_HEADING_RE = re.compile(r"^(#{1,6}) (.*)$")
_ITEM_RE = re.compile(r"^\s*(?:[-*+]|\d+\.) (.*)$")
_IMG_PLACEHOLDER = "<!-- image -->"


def golden_spans_md(export: str, *, delegated: bool = False) -> List[dict]:
    para_kind = "text" if delegated else "paragraph"
    spans: List[dict] = []

    def emit(kind: str, text: str, media_ref: str = "") -> None:
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": len(spans)})

    lines = export.split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        s = line.strip()
        if not s:
            i += 1
            continue
        if s == _IMG_PLACEHOLDER:
            emit("picture", "")
            i += 1
            continue
        m = _HEADING_RE.match(line)
        if m:
            emit("title" if len(m.group(1)) == 1 else "section_header",
                 m.group(2).strip())
            i += 1
            continue
        if s.startswith("```"):
            body: List[str] = []
            i += 1
            while i < n and not lines[i].strip().startswith("```"):
                body.append(lines[i])
                i += 1
            i += 1
            emit("code", "\n".join(body).strip())
            continue
        if s.startswith("|") and s.endswith("|"):
            rows: List[List[str]] = []
            while i < n and lines[i].strip().startswith("|"):
                raw = lines[i].strip()
                cells = [c.strip() for c in raw.split("|")[1:-1]]
                if not all(re.fullmatch(r":?-+:?", c) for c in cells if c):
                    rows.append(cells)
                i += 1
            if rows:
                num_rows, num_cols = len(rows), len(rows[0])
                emit("table", serialize_grid(
                    rows, [True] * num_cols, num_rows, num_cols))
            continue
        m = _ITEM_RE.match(line)
        if m:
            emit("list_item", m.group(1).strip())
            i += 1
            continue
        # paragraph: single exported line (the serializer never wraps)
        emit(para_kind, s)
        i += 1
    return spans


def load_golden_md(name: str, *, delegated: bool = False) -> List[dict]:
    """Golden spans for an md fixture, e.g. name='duck.md' reads
    groundtruth 'duck.md.md'."""
    path = GROUNDTRUTH_DIR / f"{name}.md"
    return golden_spans_md(path.read_text(encoding="utf-8"),
                           delegated=delegated)
