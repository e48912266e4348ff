"""Docling-dialect markdown renderer over the engine's DocTree.

Clean-room reimplementation of the OBSERVED output dialect of the
reference's `DoclingDocument.export_to_markdown()` (docling-core is an
external dependency of the reference; this module is reverse-built
from the shipped goldens `tests/data/groundtruth/docling_v2/*.md`,
whole-string compared by the reference's own gate,
/root/reference/tests/verify_utils.py:477-488):

* title → ``# text``; section_header level L → ``'#'*(L+1) text``
* paragraphs/text → raw text
* lists: ``- `` / ``{n}. `` markers, 4-space indent per nesting level,
  items joined by single newlines
* code → fenced ``` blocks
* pictures → ``<!-- image -->``
* tables → GitHub pipe tables in the tabulate dialect: column width =
  max(cell width, header width + 2), numeric columns right-aligned,
  separator row of dashes spanning width+2
* blocks joined by blank lines, no trailing newline

The engine's *canonical* markdown sink (operators/export.py) is a
fixed SQL-replayable dialect used by the driver oracle; THIS renderer
exists for byte-parity with the reference's goldens and ships as the
UDF-side `markdown` column of the extraction output when
``dialect="docling"`` is requested.
"""

from __future__ import annotations

import html
import re
from typing import List, Optional


from .doctree import BODY, DocTree, Node, TableData, table_grid


_MATH_RE = re.compile(r"\$\$.*?\$\$")


def _escape_outside_math(s: str, fn) -> str:
    """Apply an escaping function only OUTSIDE embedded $$...$$ math
    islands (pinned by pnas_sample's unescaped in-math underscores)."""
    out = []
    pos = 0
    for m in _MATH_RE.finditer(s):
        out.append(fn(s[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(fn(s[pos:]))
    return "".join(out)


def md_escape(s: str) -> str:
    """Text-context escaping observed in the goldens (paragraphs,
    headings, captions, list items): HTML entities for &/</> plus
    backslash-escaped underscores. Asterisks are NOT escaped (no
    golden contains a literal backslash-asterisk)."""
    return _escape_outside_math(
        s, lambda t: html.escape(t, quote=False).replace("_", "\\_"))


def md_escape_cell(s: str, amp: bool = False) -> str:
    """Table-cell escaping: </> and underscores; ampersands only when
    ``amp`` (goldens disagree by generation era: example_04.html.md
    keeps raw '&' cells, the JATS goldens escape them). Widths are
    computed on the PRE-escape text."""
    def esc(t: str) -> str:
        if amp:
            t = t.replace("&", "&amp;")
        return (t.replace("<", "&lt;").replace(">", "&gt;")
                .replace("_", "\\_"))

    return _escape_outside_math(s, esc)

_LIST_LABELS = ("list", "ordered_list")
_START_RE = re.compile(r"start (\d+)")


def _is_number(s: str) -> bool:
    if not s:
        return False
    try:
        float(s)
    except ValueError:
        return False
    return True


def _visible_width(s: str) -> int:
    """wcswidth semantics (the width function the goldens were padded
    with): any nonprintable/control char makes the whole string width
    -1; combining marks are zero-wide; East-Asian Wide/Fullwidth count
    2; everything else 1."""
    import unicodedata

    total = 0
    for ch in s:
        o = ord(ch)
        if o < 32 or o == 0x7F:
            return -1
        if unicodedata.combining(ch):
            continue
        total += 2 if unicodedata.east_asian_width(ch) in ("W", "F") else 1
    return total


def render_table_github(data: TableData,
                        cell_escape_amp: bool = False) -> str:
    """Tabulate-style GitHub pipe table: first grid row is the header
    band; cell text has newlines collapsed to spaces and is stripped;
    column width = max(max cell visible width, header width + 2) under
    wcswidth measurement; numeric data columns (every non-empty cell
    parses as a number) right-align, everything else left-aligns."""
    grid = table_grid(data)
    if not grid or data.num_cols == 0:
        return ""
    # observed dialect: data cells are stripped after newline collapse;
    # header cells keep their surrounding spaces (width contributions
    # in the goldens pin both)
    headers = [(c.text or "").replace("\n", " ") for c in grid[0]]
    body = [[(c.text or "").replace("\n", " ").strip() for c in row]
            for row in grid[1:]]
    ncols = data.num_cols

    numeric = []
    for c in range(ncols):
        col_vals = [row[c] for row in body]
        # an empty-string cell disqualifies the column (tabulate treats
        # "" as a non-number value, not as missing)
        numeric.append(bool(col_vals)
                       and all(_is_number(v) for v in col_vals))
    widths = []
    for c in range(ncols):
        w = _visible_width(headers[c]) + 2
        for row in body:
            w = max(w, _visible_width(row[c]))
        widths.append(w)

    def fmt_row(cells: List[str]) -> str:
        out = []
        for c in range(ncols):
            pad = " " * max(widths[c] - _visible_width(cells[c]), 0)
            cell = md_escape_cell(cells[c], amp=cell_escape_amp)
            cell = pad + cell if numeric[c] else cell + pad
            out.append(cell)
        return "| " + " | ".join(out) + " |"

    lines = [fmt_row(headers),
             "|" + "|".join("-" * (w + 2) for w in widths) + "|"]
    lines.extend(fmt_row(row) for row in body)
    return "\n".join(lines)


def _list_start(group: Node) -> int:
    m = _START_RE.search(group.name or "")
    return int(m.group(1)) if m else 1


def _render_list(group: Node, depth: int, out_lines: List[str]) -> None:
    ordered = group.group_label == "ordered_list"
    idx = _list_start(group)
    for child in group.children:
        if child.is_group and child.group_label in _LIST_LABELS:
            _render_list(child, depth + 1, out_lines)
            continue
        if child.kind == "list_item" and child.layer == BODY:
            marker = f"{idx}." if ordered else "-"
            if ordered:
                idx += 1
            text = md_escape(child.text)
            out_lines.append("    " * depth + f"{marker} {text}")
        for sub in child.children:
            if sub.is_group and sub.group_label in _LIST_LABELS:
                _render_list(sub, depth + 1, out_lines)


def render_markdown_docling(tree: DocTree, *,
                            cell_escape_amp: bool = False) -> str:
    blocks: List[str] = []

    # captions bound to a picture/table render WITH the owning item
    # and are skipped at their own body-tree position
    bound_captions: set = set()

    def collect_bound(node: Node) -> None:
        if node.caption is not None:
            bound_captions.add(id(node.caption))
        for child in node.children:
            collect_bound(child)

    collect_bound(tree.root)

    def emit(node: Node) -> Optional[str]:
        k = node.kind
        text = md_escape(node.text)
        if k == "title":
            return f"# {text}"
        if k == "section_header":
            return "#" * (max(node.level, 1) + 1) + f" {text}"
        if k == "code":
            return f"```\n{node.text}\n```"
        if k == "formula":
            return f"$${node.text}$$"
        if k == "picture":
            return "<!-- image -->"
        if k == "table" and node.table is not None:
            return render_table_github(node.table,
                                       cell_escape_amp=cell_escape_amp)
        return text

    def visit(node: Node) -> None:
        if node.is_group and node.group_label in _LIST_LABELS:
            lines: List[str] = []
            _render_list(node, 0, lines)
            if lines:
                blocks.append("\n".join(lines))
            return
        if node.is_group and node.group_label == "inline":
            # inline group: children render on ONE line joined by
            # spaces; formulas inline as $...$ (the docx text/equation
            # interleave shape)
            parts = []
            for child in node.children:
                if child.kind == "formula":
                    parts.append(f"${child.text}$")
                elif child.kind == "picture":
                    parts.append("<!-- image -->")
                else:
                    parts.append(child.text)
            blocks.append(" ".join(parts))
            return
        if not node.is_group and node.layer == BODY \
                and id(node) not in bound_captions:
            if node.caption is not None and node.caption.text:
                blocks.append(md_escape(node.caption.text))
            block = emit(node)
            if block:
                blocks.append(block)
        for child in node.children:
            visit(child)

    for child in tree.root.children:
        visit(child)
    return "\n\n".join(blocks)
