"""Minimal tolerant DOM for the selector engine and content normalizer.

The reference parses HTML with lxml/BeautifulSoup
(`/root/reference/crawler/services/html_parser.py:31-84`); neither library
exists in this container, so this is a from-scratch stdlib ``html.parser``
tree: element nodes with attrs + parent links, text children as plain
strings, comments dropped, tolerant of unclosed/misnested tags (the closer
walks up to the nearest open ancestor).

Shared by kernels/contentnorm.py (C2 normalize-for-hash) and
kernels/selectors.py (X1/X2/X3/X5 CSS/XPath extraction) so one parse per
page serves every selector — the reference's parse-once optimization
(`url_extractor.py:113`).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = {"br", "hr", "img", "input", "area", "base", "col", "embed",
             "source", "track", "wbr", "meta", "link"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # Node | str
        self.parent = parent


class TreeBuilder(HTMLParser):
    """Tolerant DOM builder (text + element nodes, comments dropped)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("__root__", {}, None)
        self._cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, self._cur)
        self._cur.children.append(node)
        if tag not in VOID_TAGS:
            self._cur = node

    def handle_startendtag(self, tag, attrs):
        self._cur.children.append(Node(tag, {k: (v or "") for k, v in attrs}, self._cur))

    def handle_endtag(self, tag):
        # close the nearest open ancestor with this tag (tolerant of nesting errors)
        n = self._cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self._cur = n.parent

    def handle_data(self, data):
        if data:
            self._cur.children.append(data)
    # comments: default handler drops them


def build_tree(html: str | bytes | None) -> Node:
    """Parse HTML into a Node tree; malformed input keeps whatever parsed."""
    if html is None:
        html = ""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    builder = TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    return builder.root


def iter_elements(node: Node):
    """All element nodes under ``node`` in document order (depth-first)."""
    for child in node.children:
        if isinstance(child, Node):
            yield child
            yield from iter_elements(child)


def iter_text_nodes(node: Node):
    """All text-node strings under ``node`` in document order."""
    for child in node.children:
        if isinstance(child, Node):
            yield from iter_text_nodes(child)
        else:
            yield child


def serialize(node: Node) -> str:
    """Serialize a Node tree back to HTML: attributes double-quoted in
    insertion order, void tags without end tags, text re-escaped (& < >).
    For simple well-formed input (quoted attributes, no entities) the
    parse -> serialize round-trip is byte-identical, which the render layer
    (kernels/render.py) relies on so an un-transformed page passes through
    unchanged. Only the characters that MUST be escaped are (& < > in text;
    & < " in double-quoted attributes) — html.escape would also rewrite
    quotes the input legally left bare, breaking the round-trip."""

    def esc_text(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def esc_attr(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")

    parts: list[str] = []

    def emit(n) -> None:
        if isinstance(n, str):
            parts.append(esc_text(n))
            return
        if n.tag == "__root__":
            for c in n.children:
                emit(c)
            return
        attrs = "".join(
            f' {k}="{esc_attr(v)}"' for k, v in n.attrs.items()
        )
        parts.append(f"<{n.tag}{attrs}>")
        if n.tag not in VOID_TAGS:
            for c in n.children:
                emit(c)
            parts.append(f"</{n.tag}>")

    emit(node)
    return "".join(parts)


def text_bs4(node: Node) -> str:
    """BeautifulSoup ``get_text(strip=True)``: each text node stripped,
    empties dropped, joined with no separator (html_parser.py:126-129)."""
    return "".join(s for s in (t.strip() for t in iter_text_nodes(node)) if s)


def text_itertext(node: Node) -> str:
    """lxml ``"".join(element.itertext()).strip()`` (html_parser.py:241-244):
    raw text concatenated, then only the ends stripped."""
    return "".join(iter_text_nodes(node)).strip()
