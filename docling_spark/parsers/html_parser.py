"""HTML → DocTree extraction walker.

A from-scratch re-implementation of the *semantics* of the reference's
HTML backend (/root/reference/docling/backend/html_backend.py:46-546)
on the stdlib DOM shim (dom.py). Behaviors reproduced:

 - <br> → newline text nodes (html_backend.py:110-113)
 - furniture-until-first-h1 rule: content before any h1..h6 heading is
   FURNITURE; an <h1> switches the layer to BODY and resets the parent
   stack (html_backend.py:115-118, 209-215)
 - recursive walk with floating-text capture flushed only for <div>
   parents (html_backend.py:127-161)
 - heading hierarchy stack with synthetic "section" groups for skipped
   levels; h1 → title, h2..h6 → section_header (html_backend.py:204-248)
 - paragraphs/code stripped, empty dropped (html_backend.py:250-273)
 - ul/ol list groups, nested-list list items with flattened recursive
   text (html_backend.py:275-372)
 - table grid with colspan/rowspan expansion, th-only rows = column
   headers, inline $$formula$$ extraction, nested tables skipped
   (html_backend.py:374-477)
 - figure/figcaption: the caption is added at the BODY ROOT (the
   reference calls add_text with no parent, html_backend.py:527-531),
   the picture under the current parent; bare <img> → picture
   (html_backend.py:509-546)
"""

from __future__ import annotations

from typing import List, Optional

from ..doctree import BODY, FURNITURE, DocTree, Node, TableCell, TableData
from ..doctree import (
    KIND_CAPTION,
    KIND_TEXT,
)
from .dom import Element, TextNode, parse_html

# Tags that generate node items (html_backend.py:28-43).
TAGS_FOR_NODE_ITEMS = frozenset((
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "pre", "ul", "ol", "li",
    "table", "figure", "img",
))

MAX_LEVELS = 10


class _HtmlWalker:
    def __init__(self) -> None:
        self.tree = DocTree()
        self.level = 0
        self.parents: dict = {i: None for i in range(MAX_LEVELS)}
        self.layer = BODY

    # ------------------------------------------------------------------
    def convert(self, payload: str) -> DocTree:
        root = parse_html(payload)
        content = root.find("body") or root

        # Replace <br> with newline text nodes.
        for br in content.find_all("br"):
            if br.parent is not None:
                br.parent.replace_child(br, "\n")

        has_heading = content.find(("h1", "h2", "h3", "h4", "h5", "h6"))
        self.layer = BODY if has_heading is None else FURNITURE
        self.walk(content)
        return self.tree

    # ------------------------------------------------------------------
    def walk(self, tag: Element) -> None:
        children = tag.children
        n = len(children)
        # suffix[i]: any Element at position ≥ i is a node-item tag —
        # precomputed so the per-text-node flush test ("is this text
        # followed by a node-item sibling?") is O(1) instead of an
        # O(tail) sibling scan per text node (quadratic on wide divs)
        suffix = [False] * (n + 1)
        for i in range(n - 1, -1, -1):
            c = children[i]
            suffix[i] = suffix[i + 1] or (
                c.__class__ is Element and c.name in TAGS_FOR_NODE_ITEMS)
        text = ""
        for i, element in enumerate(children):
            cls = element.__class__
            if cls is Element:
                self.analyze_tag(element)
            elif cls is str:
                # Floating text outside analyzed tags: flush when this
                # is the last child or a node-item tag follows.
                # (bare str = plain text; preformatted runs are
                # TextNode instances and are skipped)
                text += element
                if i + 1 >= n or suffix[i + 1]:
                    text = text.strip()
                    if text and tag.name == "div":
                        self.tree.add_text(KIND_TEXT, text,
                                           parent=self.parents[self.level],
                                           layer=self.layer)
                    text = ""

    def analyze_tag(self, tag: Element) -> None:
        name = tag.name
        if name in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self.handle_header(tag)
        elif name == "p":
            self.handle_paragraph(tag)
        elif name == "pre":
            self.handle_code(tag)
        elif name in ("ul", "ol"):
            self.handle_list(tag)
        elif name == "li":
            self.handle_list_item(tag)
        elif name == "table":
            self.handle_table(tag)
        elif name == "figure":
            self.handle_figure(tag)
        elif name == "img":
            self.handle_image(tag)
        else:
            self.walk(tag)

    # -- text helpers ----------------------------------------------------
    @staticmethod
    def _node_text(item) -> str:
        """bs4 ``item.text``: the string itself for string nodes, the
        recursive plain-text join for tags."""
        if item.__class__ is str:
            return item
        if isinstance(item, TextNode):
            return item.data
        return item.text

    def get_text(self, item) -> str:
        parts = self._extract_text_recursively(item)
        return "".join(parts) + " "

    def _extract_text_recursively(self, item) -> List[str]:
        if item.__class__ is str:
            return [item]
        if isinstance(item, TextNode):
            return [item.data]
        result: List[str] = []
        if item.name not in ("ul", "ol"):
            for child in item.children:
                result.extend(self._extract_text_recursively(child))
        return ["".join(result) + " "]

    # -- handlers ----------------------------------------------------------
    def handle_header(self, element: Element) -> None:
        hlevel = int(element.name[1])
        text = element.text.strip()

        if hlevel == 1:
            self.layer = BODY
            for key in self.parents:
                self.parents[key] = None
            self.level = 1
            self.parents[1] = self.tree.add_title(
                text, parent=self.parents[0], layer=self.layer)
        else:
            if hlevel > self.level:
                # synthetic section groups for skipped levels
                for i in range(self.level + 1, hlevel):
                    self.parents[i] = self.tree.add_group(
                        "section", name=f"header-{i}",
                        parent=self.parents[i - 1], layer=self.layer)
                self.level = hlevel
            elif hlevel < self.level:
                for key in list(self.parents):
                    if key > hlevel:
                        self.parents[key] = None
                self.level = hlevel
            self.parents[hlevel] = self.tree.add_heading(
                text, level=hlevel, parent=self.parents[hlevel - 1],
                layer=self.layer)

    def handle_paragraph(self, element: Element) -> None:
        text = element.text.strip()
        if text:
            self.tree.add_text(KIND_TEXT, text,
                               parent=self.parents[self.level],
                               layer=self.layer)

    def handle_code(self, element: Element) -> None:
        text = element.text.strip()
        if text:
            self.tree.add_code(text, parent=self.parents[self.level],
                               layer=self.layer)

    def handle_list(self, element: Element) -> None:
        if element.name == "ul":
            self.parents[self.level + 1] = self.tree.add_group(
                "list", name="list", parent=self.parents[self.level],
                layer=self.layer)
        else:  # ol
            start_attr = element.get("start")
            start = (int(start_attr)
                     if isinstance(start_attr, str) and start_attr.isnumeric()
                     else 1)
            name = "ordered list" + (f" start {start}" if start != 1 else "")
            self.parents[self.level + 1] = self.tree.add_group(
                "ordered_list", name=name, parent=self.parents[self.level],
                layer=self.layer)
        self.level += 1
        self.walk(element)
        self.parents[self.level + 1] = None
        self.level -= 1

    def handle_list_item(self, element: Element) -> None:
        nested_list = element.find(("ul", "ol"))
        parent = self.parents[self.level]
        if parent is None:
            return

        if nested_list is not None:
            text = self.get_text(element)
            text = text.replace("\n", "").replace("\r", "")
            text = " ".join(text.split()).strip()
            if text:
                self.parents[self.level + 1] = self.tree.add_list_item(
                    text, parent=parent, layer=self.layer)
                self.level += 1
                self.walk(element)
                self.parents[self.level + 1] = None
                self.level -= 1
            else:
                self.walk(element)
        else:
            text = element.text.strip()
            if text:
                self.tree.add_list_item(text, parent=parent,
                                        layer=self.layer)

    def handle_table(self, element: Element) -> None:
        data = parse_table_data(element)
        if data is not None:
            self.tree.add_table(data, parent=self.parents[self.level],
                                layer=self.layer)

    def handle_figure(self, element: Element) -> None:
        figcaption = element.find("figcaption")
        if figcaption is None:
            self.tree.add_picture(parent=self.parents[self.level],
                                  layer=self.layer)
        else:
            texts = [self._node_text(item) for item in figcaption.children]
            cap = self.tree.add_text(KIND_CAPTION, "".join(texts).strip(),
                                     parent=None, layer=self.layer)
            pic = self.tree.add_picture(parent=self.parents[self.level],
                                        layer=self.layer)
            pic.caption = cap

    def handle_image(self, element: Element) -> None:
        self.tree.add_picture(parent=self.parents[self.level],
                              layer=self.layer)


def _int_attr(element: Element, key: str) -> int:
    val = element.get(key, "1")
    return int(val) if isinstance(val, str) and val.isnumeric() else 1


def parse_table_data(element: Element) -> Optional[TableData]:
    """Grid parse with span expansion (html_backend.py:374-465)."""
    if element.find("table") is not None:
        return None  # nested tables skipped

    rows = element.find_all("tr")
    num_rows = len(rows)
    num_cols = 0
    row_cells = [row.find_all(("td", "th")) for row in rows]
    for cells in row_cells:
        col_count = sum(_int_attr(c, "colspan") for c in cells)
        num_cols = max(num_cols, col_count)

    grid: List[List[Optional[str]]] = [
        [None] * num_cols for _ in range(num_rows)]
    data = TableData(num_rows=num_rows, num_cols=num_cols, cells=[])

    for row_idx, cells in enumerate(row_cells):
        col_header = True
        for c in cells:
            if c.name == "td":
                col_header = False
                break

        col_idx = 0
        for html_cell in cells:
            # inline $$formula$$ extraction
            for formula in html_cell.find_all("inline-formula"):
                math_parts = formula.text.split("$$")
                if len(math_parts) == 3 and formula.parent is not None:
                    formula.parent.replace_child(
                        formula, f"$${math_parts[1]}$$")

            text = html_cell.text
            col_span = _int_attr(html_cell, "colspan")
            row_span = _int_attr(html_cell, "rowspan")

            while grid[row_idx][col_idx] is not None:
                col_idx += 1
            for r in range(row_span):
                for c in range(col_span):
                    if row_idx + r < num_rows and col_idx + c < num_cols:
                        grid[row_idx + r][col_idx + c] = text

            data.cells.append(TableCell(
                text=text, row_span=row_span, col_span=col_span,
                start_row=row_idx, start_col=col_idx,
                column_header=col_header,
                row_header=(not col_header) and html_cell.name == "th"))
    return data


def parse_html_document(payload: str) -> DocTree:
    """Parse an HTML payload into a DocTree (the extraction operator's
    entry point for kind='html' spans)."""
    return _HtmlWalker().convert(payload)
