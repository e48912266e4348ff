"""Minimal HTML DOM on the Python stdlib ``html.parser``.

The reference parses HTML with BeautifulSoup over the *stdlib*
"html.parser" builder (/root/reference/docling/backend/html_backend.py:63),
so its tree semantics are reproducible without bs4. This shim provides
exactly the surface the extraction walker needs, with the same
behaviors:

 - start tags push; end tags pop to the nearest matching open tag
   (closing everything in between); unmatched end tags are ignored;
   void elements never push (html.parser reports no implied end tags,
   same as the bs4 html.parser builder).
 - ``.text`` concatenates descendant plain-text nodes only — contents
   of <script>/<style> and comments/doctypes are excluded (bs4 ≥4.9
   ``get_text`` semantics: exact-type NavigableString check).
 - entity references are decoded in normal data, kept raw inside
   script/style (html.parser convert_charrefs behavior, same as bs4).
 - "preformatted" strings (script/style payloads, comments, doctype)
   are flagged so callers can skip them for floating-text capture, the
   check the reference does via ``isinstance(el, PreformattedString)``
   (html_backend.py:140-142).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, List, Optional, Sequence, Union

VOID_ELEMENTS = frozenset((
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
))


class TextNode:
    __slots__ = ("data", "preformatted", "parent")

    def __init__(self, data: str, preformatted: bool = False) -> None:
        self.data = data
        self.preformatted = preformatted
        self.parent: Optional["Element"] = None

    @property
    def is_text(self) -> bool:
        return True


class Element:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None) -> None:
        self.name = name
        self.attrs = attrs or {}
        self.children: List[Union["Element", TextNode]] = []
        self.parent: Optional["Element"] = None

    @property
    def is_text(self) -> bool:
        return False

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def append(self, node: Union["Element", TextNode]) -> None:
        node.parent = self
        self.children.append(node)

    def descendants(self) -> Iterator[Union["Element", TextNode]]:
        for child in self.children:
            yield child
            if isinstance(child, Element):
                yield from child.descendants()

    def find(self, names: Union[str, Sequence[str]]) -> Optional["Element"]:
        if isinstance(names, str):
            names = (names,)
        for node in self.descendants():
            if isinstance(node, Element) and node.name in names:
                return node
        return None

    def find_all(self, names: Union[str, Sequence[str]],
                 recursive: bool = True) -> List["Element"]:
        if isinstance(names, str):
            names = (names,)
        out: List[Element] = []
        nodes = self.descendants() if recursive else iter(self.children)
        for node in nodes:
            if isinstance(node, Element) and node.name in names:
                out.append(node)
        return out

    @property
    def text(self) -> str:
        parts: List[str] = []
        for node in self.descendants():
            if isinstance(node, TextNode) and not node.preformatted:
                parts.append(node.data)
        return "".join(parts)

    def next_tag_siblings(self) -> List["Element"]:
        return _next_tag_siblings(self)

    def replace_child(self, old, new) -> None:
        idx = self.children.index(old)
        new.parent = self
        self.children[idx] = new


def _next_tag_siblings(node) -> List[Element]:
    if node.parent is None:
        return []
    sibs = node.parent.children
    idx = sibs.index(node)
    return [s for s in sibs[idx + 1:] if isinstance(s, Element)]


def next_sibling(node):
    if node.parent is None:
        return None
    sibs = node.parent.children
    idx = sibs.index(node)
    return sibs[idx + 1] if idx + 1 < len(sibs) else None


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: List[Element] = [self.root]

    # -- helpers ---------------------------------------------------------
    @property
    def top(self) -> Element:
        return self.stack[-1]

    def _in_preformatted(self) -> bool:
        return self.top.name in ("script", "style")

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs))
        self.top.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self.top.append(Element(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored (bs4 html.parser behavior)

    def handle_data(self, data):
        if data:
            self.top.append(TextNode(data, preformatted=self._in_preformatted()))

    def handle_comment(self, data):
        self.top.append(TextNode(data, preformatted=True))

    def handle_decl(self, decl):
        self.top.append(TextNode(decl, preformatted=True))

    def unknown_decl(self, data):
        self.top.append(TextNode(data, preformatted=True))


def parse_html(payload: str) -> Element:
    builder = _TreeBuilder()
    builder.feed(payload)
    builder.close()
    return builder.root
