"""In-UDF document tree: the engine's analogue of the reference's
``DoclingDocument`` (see /root/reference/docling/datamodel — docling-core
pydantic trees; structure documented in
/root/reference/docs/concepts/docling_document.md:22-44).

A parse run builds a tree of :class:`Node` objects; reading order is the
depth-first order of the body tree (same rule as the reference,
docs/concepts/docling_document.md:43-44). :func:`flatten` converts the
tree into the engine's canonical output: an ordered list of
``(kind, text, media_ref, offset)`` spans, skipping group containers and
furniture-layer items (the extraction contract from FIXTURES.md §3).

This module is pure Python + stdlib so it runs inside Arrow-batched
pandas UDF workers with zero extra imports.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

BODY = "body"
FURNITURE = "furniture"

# Output-span kinds (the reference's DocItemLabel values emitted by the
# declarative backends; label set docling/models/layout_model.py:28-46).
KIND_TITLE = "title"
KIND_SECTION_HEADER = "section_header"
KIND_TEXT = "text"
KIND_LIST_ITEM = "list_item"
KIND_CODE = "code"
KIND_CAPTION = "caption"
KIND_PICTURE = "picture"
KIND_TABLE = "table"
KIND_FORMULA = "formula"
KIND_FOOTNOTE = "footnote"
KIND_PAGE_HEADER = "page_header"
KIND_PAGE_FOOTER = "page_footer"
KIND_CHECKBOX_SELECTED = "checkbox_selected"
KIND_CHECKBOX_UNSELECTED = "checkbox_unselected"


@dataclass
class TableCell:
    """Dense table cell (analogue of docling-core TableCell, used e.g.
    /root/reference/docling/backend/html_backend.py:452-463)."""

    text: str
    row_span: int = 1
    col_span: int = 1
    start_row: int = 0
    start_col: int = 0
    column_header: bool = False
    row_header: bool = False


@dataclass
class TableData:
    num_rows: int
    num_cols: int
    cells: List[TableCell] = field(default_factory=list)


@dataclass
class Node:
    kind: str  # span kind, or "group"
    text: str = ""
    media_ref: str = ""
    layer: str = BODY
    is_group: bool = False
    group_label: str = ""  # list | ordered_list | section | ...
    name: str = ""  # group name (ordered list start is encoded here)
    level: int = 0  # heading level
    table: Optional[TableData] = None
    parent: Optional["Node"] = None
    children: List["Node"] = field(default_factory=list)
    # caption item bound to this picture/table (the docling-core
    # ``captions`` ref list): the caption node also sits in the body
    # tree (span-sequence parity), but serializers render it WITH the
    # owning item and skip it at its tree position.
    caption: Optional["Node"] = None

    def add(self, child: "Node") -> "Node":
        child.parent = self
        self.children.append(child)
        return child


class DocTree:
    """Mutable document under construction.

    ``root`` is the body root ("_root_" in the reference's serialized
    form). Items added with ``parent=None`` attach to the root — the
    same default the reference's ``DoclingDocument.add_text`` uses,
    which is what puts HTML figure captions at the end of the body tree
    (/root/reference/docling/backend/html_backend.py:527-531 adds the
    caption with no parent).
    """

    def __init__(self) -> None:
        self.root = Node(kind="group", is_group=True, group_label="root")

    def _attach(self, node: Node, parent: Optional[Node]) -> Node:
        (parent if parent is not None else self.root).add(node)
        return node

    def add_text(self, kind: str, text: str, parent: Optional[Node] = None,
                 layer: str = BODY, media_ref: str = "") -> Node:
        return self._attach(
            Node(kind=kind, text=text, media_ref=media_ref, layer=layer), parent)

    def add_title(self, text: str, parent: Optional[Node] = None,
                  layer: str = BODY) -> Node:
        return self._attach(Node(kind=KIND_TITLE, text=text, layer=layer), parent)

    def add_heading(self, text: str, level: int, parent: Optional[Node] = None,
                    layer: str = BODY) -> Node:
        return self._attach(
            Node(kind=KIND_SECTION_HEADER, text=text, level=level, layer=layer),
            parent)

    def add_list_item(self, text: str, parent: Optional[Node] = None,
                      layer: str = BODY) -> Node:
        return self._attach(
            Node(kind=KIND_LIST_ITEM, text=text, layer=layer), parent)

    def add_code(self, text: str, parent: Optional[Node] = None,
                 layer: str = BODY) -> Node:
        return self._attach(Node(kind=KIND_CODE, text=text, layer=layer), parent)

    def add_group(self, label: str, name: str = "", parent: Optional[Node] = None,
                  layer: str = BODY) -> Node:
        return self._attach(
            Node(kind="group", is_group=True, group_label=label, name=name,
                 layer=layer), parent)

    def add_table(self, data: TableData, parent: Optional[Node] = None,
                  layer: str = BODY) -> Node:
        return self._attach(
            Node(kind=KIND_TABLE, table=data, layer=layer), parent)

    def add_picture(self, parent: Optional[Node] = None, layer: str = BODY,
                    media_ref: str = "") -> Node:
        return self._attach(
            Node(kind=KIND_PICTURE, media_ref=media_ref, layer=layer), parent)


def table_grid(data: TableData) -> List[List[TableCell]]:
    """Row-major grid with span expansion (TableData.grid semantics the
    reference's tests check, /root/reference/tests/verify_utils.py:178-190).
    Empty slots get an empty placeholder cell."""
    empty = TableCell(text="")
    grid: List[List[TableCell]] = [
        [empty] * data.num_cols for _ in range(data.num_rows)]
    for cell in data.cells:
        for r in range(cell.start_row, min(cell.start_row + cell.row_span,
                                           data.num_rows)):
            for c in range(cell.start_col, min(cell.start_col + cell.col_span,
                                               data.num_cols)):
                grid[r][c] = cell
    return grid


def serialize_table(data: TableData) -> str:
    """Canonical table text used on BOTH the engine and golden side so
    span equality reduces to string equality (FIXTURES.md §3.4):

    ``"{num_rows}x{num_cols}\\n"`` + rows joined by newline (cell texts,
    row-major, spans expanded, tab-joined) + trailing ``"H:"`` line with
    the 0/1 ``column_header`` flags of row 0.
    """
    grid = table_grid(data)
    lines = [f"{data.num_rows}x{data.num_cols}"]
    for row in grid:
        lines.append("\t".join(c.text for c in row))
    header_flags = grid[0] if grid else []
    lines.append("H:" + "\t".join("1" if c.column_header else "0"
                                  for c in header_flags))
    return "\n".join(lines)


def serialize_grid(grid_texts: List[List[str]], header_flags: List[bool],
                   num_rows: int, num_cols: int) -> str:
    """Same canonical form from pre-expanded grid texts (golden side)."""
    lines = [f"{num_rows}x{num_cols}"]
    for row in grid_texts:
        padded = list(row) + [""] * (num_cols - len(row))
        lines.append("\t".join(padded[:num_cols]))
    lines.append("H:" + "\t".join("1" if f else "0" for f in header_flags))
    return "\n".join(lines)


def flatten(tree: DocTree) -> List[dict]:
    """Depth-first body-tree order → dense ordered spans.

    Rules (FIXTURES.md §3, mirroring the reference's reading-order
    definition docs/concepts/docling_document.md:43-44):
      1. DFS from the body root following children.
      2. Group nodes are skipped but descended.
      3. Items with layer != body (furniture) are skipped but descended.
      4. Each emitted span gets offset = emission index (0-based dense).
    """
    spans: List[dict] = []

    def visit(node: Node) -> None:
        if not node.is_group and node.layer == BODY:
            if node.kind == KIND_TABLE and node.table is not None:
                text = serialize_table(node.table)
                spans.append({"kind": KIND_TABLE, "text": text,
                              "media_ref": "", "offset": len(spans)})
            else:
                spans.append({"kind": node.kind, "text": node.text,
                              "media_ref": node.media_ref,
                              "offset": len(spans)})
        for child in node.children:
            visit(child)

    for child in tree.root.children:
        visit(child)
    return spans
