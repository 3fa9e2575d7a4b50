"""HTML -> spans / links / normalized-text kernel (X1-X7, C2 in SURVEY.md §2.6).

The reference extracts content with CSS/XPath selectors over lxml/BeautifulSoup
(``/root/reference/crawler/services/html_parser.py``,
``selector_processor.py:34-91``, ``url_extractor.py:121-236``) and normalizes
boilerplate away (``content_normalizer.py:122-186``). This container has no
lxml/bs4/selectolax, so the kernel is a single-pass stdlib ``html.parser``
walk that produces, in DOM order:

  * spans: interleaved text + media span sequence — the input_hint shape
    (kind, text, media_ref, offset); text spans are per block element, media
    spans are document links (<a class~=download / media-extension href>) and
    images. Offset is the 0-based emission index: the per-row invariant is
    span-sequence equality on (kind, text, media_ref, order).
  * links: every <a href> with its anchor text and position (the frontier
    expansion input; within-page order drives within-page dedup U5).
  * title: first <title> or <h1> text.

``normalize_text`` is the content-hash/simhash input: boilerplate tags
dropped, whitespace collapsed, lowercased.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

BLOCK_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "td", "th", "title"}
SKIP_TAGS = {"script", "style", "noscript", "iframe", "form", "nav", "header", "footer", "aside"}
MEDIA_EXTENSIONS = (".pdf", ".doc", ".docx", ".xls", ".xlsx", ".zip", ".jpg", ".jpeg", ".png", ".mp4", ".mp3")
_WS = re.compile(r"\s+")


def _collapse(text: str) -> str:
    return _WS.sub(" ", text).strip()


CONTAINER_TAGS = {"div", "li", "article", "section", "td", "tr", "ul", "ol"}


class _SpanParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str | None, str | None]] = []  # (kind, text, media_ref)
        # (href, anchor_text, container_id) — preview resolved at close
        self.links: list[tuple[str, str, int | None]] = []
        self.title: str | None = None
        self._skip_depth = 0
        self._block_stack: list[tuple[str, list[str]]] = []
        self._link_stack: list[tuple[str, list[str], bool]] = []  # (href, text_parts, is_media)
        # X6 container scoping: innermost open container owns each link's
        # preview (= the container's full subtree text, reference
        # url_extractor.py:121-236 association semantics)
        self._container_stack: list[tuple[int, list[str]]] = []
        self._container_text: dict[int, str] = {}
        self._next_cid = 0

    @staticmethod
    def _is_media_anchor(href: str, cls: str) -> bool:
        h = href.lower().split("?")[0]
        return "download" in cls.lower() or h.endswith(MEDIA_EXTENSIONS)

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        ad = dict(attrs)
        if tag in BLOCK_TAGS:
            self._block_stack.append((tag, []))
        if tag in CONTAINER_TAGS:
            self._container_stack.append((self._next_cid, []))
            self._next_cid += 1
        if tag == "a" and ad.get("href"):
            self._link_stack.append((ad["href"], [], self._is_media_anchor(ad["href"], ad.get("class", ""))))
        elif tag == "img" and ad.get("src"):
            self.spans.append(("media", None, ad["src"]))
        else:
            # X7 data-attribute URLs (url_extractor.py:330-384): JS-driven
            # navigation targets on non-anchor elements
            for attr in ("data-url", "data-href", "data-link"):
                if ad.get(attr):
                    cid = self._container_stack[-1][0] if self._container_stack else None
                    self.links.append((ad[attr], "", cid))
                    break

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a" and self._link_stack:
            href, parts, is_media = self._link_stack.pop()
            anchor = _collapse("".join(parts))
            cid = self._container_stack[-1][0] if self._container_stack else None
            self.links.append((href, anchor, cid))
            if is_media:
                self.spans.append(("media", None, href))
        elif tag in CONTAINER_TAGS and self._container_stack:
            cid, parts = self._container_stack.pop()
            text = _collapse("".join(parts))
            self._container_text[cid] = text
            if self._container_stack:  # subtree text bubbles to the parent
                self._container_stack[-1][1].append(" " + text)
        elif tag in BLOCK_TAGS and self._block_stack:
            open_tag, parts = self._block_stack.pop()
            text = _collapse("".join(parts))
            if text:
                self.spans.append(("text", text, None))
                if self.title is None and open_tag in ("title", "h1"):
                    self.title = text

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._link_stack:
            self._link_stack[-1][1].append(data)
        if self._block_stack:
            self._block_stack[-1][1].append(data)
        if self._container_stack:
            self._container_stack[-1][1].append(data)


def extract_page(html: str) -> dict:
    """Parse one HTML document.

    Returns {"title": str|None,
             "spans": [(kind, text, media_ref, offset)],
             "links": [(href, anchor_text, preview, pos)]} where preview is
    the full text of the link's innermost container element (X6 container-
    scoped metadata association), None for container-less links.
    """
    parser = _SpanParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        pass  # malformed HTML: keep whatever was parsed before the error
    # unclosed containers still resolve their links' previews; like
    # handle_endtag, each popped container's text bubbles into the still-open
    # parent so outer previews keep inner-subtree text on malformed HTML
    while parser._container_stack:
        cid, parts = parser._container_stack.pop()
        text = _collapse("".join(parts))
        parser._container_text[cid] = text
        if parser._container_stack:
            parser._container_stack[-1][1].append(" " + text)
    spans = [(k, t, m, i) for i, (k, t, m) in enumerate(parser.spans)]
    links = [
        (h, a, parser._container_text.get(c) if c is not None else None, i)
        for i, (h, a, c) in enumerate(parser.links)
    ]
    return {"title": parser.title, "spans": spans, "links": links}


def _replay_into(node, parser: HTMLParser) -> None:
    """Feed a dom.Node subtree into an HTMLParser-shaped handler as start/
    data/end events in document order — the lex-free second consumer of a
    single ``html.parser`` pass. On well-formed HTML the event stream is
    identical to lexing; on misnested input the tree's tolerant recovery
    normalizes event order (every open element gets a synthesized end event,
    as in HTML5 tree construction) rather than replaying the raw tag soup."""
    for child in node.children:
        if isinstance(child, str):
            parser.handle_data(child)
        else:
            attrs = list(child.attrs.items())
            parser.handle_starttag(child.tag, attrs)
            _replay_into(child, parser)
            parser.handle_endtag(child.tag)


def parse_page_tree(root) -> dict:
    """``extract_page`` over an already-built dom tree (see _replay_into for
    the malformed-input difference vs the streaming parser)."""
    parser = _SpanParser()
    _replay_into(root, parser)
    # every element received an end event, so the unclosed-container drain of
    # extract_page has nothing left to do here
    spans = [(k, t, m, i) for i, (k, t, m) in enumerate(parser.spans)]
    links = [
        (h, a, parser._container_text.get(c) if c is not None else None, i)
        for i, (h, a, c) in enumerate(parser.links)
    ]
    return {"title": parser.title, "spans": spans, "links": links}


class _TextParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


def normalize_text(html: str) -> str:
    """Boilerplate-stripped, whitespace-collapsed, lowercased page text
    (the exact-hash / simhash input, C2-equivalent)."""
    parser = _TextParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        pass
    return _collapse(" ".join(parser.parts)).lower()
