"""Content normalization for hashing (C2 — SURVEY.md §2.2).

Behavior-equivalent to the reference's ContentNormalizer.normalize_for_hash
(`crawler/services/content_normalizer.py:36-97,122-186,278-397`), rebuilt on
a minimal stdlib DOM (no bs4/lxml in this container):

  1. drop boilerplate containers (nav/header/footer/aside/menu/noscript/
     iframe/script/style/link/meta/sidebar);
  2. drop any element whose class or id matches an ad/tracking pattern
     (ad-, advert, sponsor, banner, cookie-, gdpr, popup, modal, tracking,
     analytics, social-share, newsletter, ... — the reference's 20-pattern set);
  3. drop HTML comments;
  4. prefer <main>/<article>, else a <div> with content-ish class/id, else
     <body>, else the whole document;
  5. text with single-space separators;
  6. strip timestamp/dynamic families (ISO datetimes, dates, times,
     month-name dates, "N hours ago", updated/posted + relative words,
     view/like/comment counts);
  7. collapse whitespace, lowercase.

The output feeds sha256 + simhash — dynamic chrome must never flip a
content hash between crawls of the same page.
"""

from __future__ import annotations

import re

from crawler_spark.kernels.dom import Node as _Node
from crawler_spark.kernels.dom import TreeBuilder as _TreeBuilder

BOILERPLATE_TAGS = {
    "nav", "header", "footer", "aside", "sidebar", "menu", "noscript",
    "iframe", "script", "style", "link", "meta",
}

AD_PATTERNS = [re.compile(p, re.IGNORECASE) for p in [
    r"ad[_-]", r"ads[_-]", r"advert", r"sponsor", r"promo", r"banner",
    r"cookie[_-]", r"gdpr", r"consent", r"popup", r"modal", r"overlay",
    r"tracking", r"analytics", r"social[_-]share", r"share[_-]buttons?",
    r"related[_-]", r"recommend", r"newsletter", r"subscription",
]]

TIMESTAMP_PATTERNS = [re.compile(p, re.IGNORECASE) for p in [
    r"\d{4}[-/]\d{2}[-/]\d{2}[T\s]\d{2}:\d{2}(:\d{2})?([+-]\d{2}:?\d{2}|Z)?",
    r"\d{4}[-/]\d{2}[-/]\d{2}",
    r"\b\d{1,2}:\d{2}(:\d{2})?\b",
    r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|"
    r"Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|"
    r"Dec(?:ember)?)\s+\d{1,2},?\s+\d{4}",
    r"\d+\s+(?:second|minute|hour|day|week|month|year)s?\s+ago",
    r"(?:updated|posted|published)\s+(?:yesterday|today|just now)",
    r"\d+[\d,.]*[KMB]?\s+(?:views?|likes?|comments?|reads?)",
    r"(?:last\s+)?(?:updated|modified|posted|published)[\s:]+.*?ago",
]]

_CONTENTISH = re.compile(r"content|main|article|post|entry", re.IGNORECASE)


def _is_ad(node: _Node) -> bool:
    blob = node.attrs.get("class", "") + " " + node.attrs.get("id", "")
    return blob.strip() != "" and any(p.search(blob) for p in AD_PATTERNS)


def _prune(node: _Node) -> None:
    kept = []
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag in BOILERPLATE_TAGS or _is_ad(child):
                continue
            _prune(child)
        kept.append(child)
    node.children = kept


def _find_first(node: _Node, pred) -> _Node | None:
    for child in node.children:
        if isinstance(child, _Node):
            if pred(child):
                return child
            found = _find_first(child, pred)
            if found is not None:
                return found
    return None


def _main_content(root: _Node) -> _Node:
    for tag in ("main", "article"):
        el = _find_first(root, lambda n, t=tag: n.tag == t)
        if el is not None:
            return el
    el = _find_first(
        root, lambda n: n.tag == "div" and _CONTENTISH.search(n.attrs.get("class", ""))
    )
    if el is not None:
        return el
    el = _find_first(
        root, lambda n: n.tag == "div" and _CONTENTISH.search(n.attrs.get("id", ""))
    )
    if el is not None:
        return el
    body = _find_first(root, lambda n: n.tag == "body")
    return body if body is not None else root


def _text_of(node: _Node) -> str:
    parts: list[str] = []

    def walk(n: _Node) -> None:
        for child in n.children:
            if isinstance(child, _Node):
                walk(child)
            else:
                s = child.strip()
                if s:
                    parts.append(s)

    walk(node)
    return " ".join(parts)


def remove_timestamps(text: str) -> str:
    for p in TIMESTAMP_PATTERNS:
        text = p.sub("", text)
    return text


def normalize_tree(root: _Node) -> str:
    """C2 pipeline over an already-built DOM tree. MUTATES the tree (prunes
    boilerplate/ad subtrees in place) — callers sharing one parse across
    extractors must run every read-only walk first (parse_udfs does)."""
    _prune(root)
    main = _main_content(root)
    text = _text_of(main)
    text = remove_timestamps(text)
    return re.sub(r"\s+", " ", text).strip().lower()


def normalize_for_hash(html: str | bytes | None) -> str:
    """HTML -> stable lowercase text for content hashing (C2 full pipeline)."""
    if html is None:
        return ""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass  # keep whatever parsed
    return normalize_tree(builder.root)
