"""Static-DOM render layer: the deterministic half of browser rendering.

The reference drives a real Playwright page (`/root/reference/crawler/
services/step_executors/browser_executor.py:151-205`, browser pool in
`services/browser_pool.py`): navigation follows meta refreshes, frame
content is reachable from the rendered page, and `<base href>` governs URL
resolution. JavaScript execution needs a real browser and stays behind the
``Render`` hook (sources/browser.py) — but everything a browser does
*without* running script is deterministic on the static DOM, and this
module implements exactly that half:

- **meta-refresh follow** (``<meta http-equiv="refresh" content="N;
  url=...">``): navigate to the target, bounded hops, cycle-safe — the
  refresh-redirect pattern legacy portals use instead of HTTP 3xx.
- **iframe inlining** (``<iframe src=...>``): fetch the frame document and
  graft its ``<body>`` children under the iframe element so frame content
  is selector-reachable from the main document, bounded count + depth.
- **noscript promotion**: unwrap ``<noscript>`` wrappers — the content
  served for script-less clients participates in extraction.
- **base-href resolution**: relative refresh/iframe URLs resolve against
  the first ``<base href>`` when present, else the document URL (HTML spec
  §4.2.3).

The transformed tree re-serializes via kernels/dom.serialize; pages that
need none of the transforms pass through byte-identically (round-trip
gated in tests), so the layer composes with the content-length /
extraction oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from urllib.parse import urljoin

from crawler_spark.kernels.dom import Node, build_tree, iter_elements, serialize

# fetch hook: absolute url -> html body, or None when unfetchable (missing
# from the corpus, non-2xx, ...) — the transform is skipped, never raised
Fetch = Callable[[str], "str | None"]


def _base_href(tree: Node, doc_url: str) -> str:
    for el in iter_elements(tree):
        if el.tag == "base" and el.attrs.get("href"):
            return urljoin(doc_url, el.attrs["href"])
    return doc_url


def meta_refresh_target(tree: Node, doc_url: str) -> str | None:
    """The refresh navigation target, absolute, or None. Content grammar
    (WHATWG §4.2.5.3): ``<seconds> [;,] url=<target>`` — a bare delay with
    no URL refreshes to self and is NOT followed (that would loop)."""
    for el in iter_elements(tree):
        if el.tag != "meta":
            continue
        if el.attrs.get("http-equiv", "").strip().lower() != "refresh":
            continue
        content = el.attrs.get("content", "")
        for part in content.replace(",", ";").split(";")[1:]:
            part = part.strip()
            if part.lower().startswith("url="):
                target = part[4:].strip().strip("'\"")
                if target:
                    return urljoin(_base_href(tree, doc_url), target)
    return None


def _body_children(tree: Node) -> list:
    for el in iter_elements(tree):
        if el.tag == "body":
            return el.children
    return tree.children  # fragment without <body>: take it whole


def _inline_iframes(
    tree: Node,
    base: str,
    fetch: Fetch,
    seen: set[str],
    budget: list[int],
    depth: int,
) -> None:
    if depth <= 0:
        return
    # snapshot before mutating: grafting frame content mid-iteration would
    # surface nested iframes to THIS depth's walk, bypassing the depth bound
    # (their own inlining already happened in the recursion below)
    for el in list(iter_elements(tree)):
        if el.tag != "iframe" or not el.attrs.get("src") or el.children:
            continue
        if budget[0] <= 0:
            return
        target = urljoin(base, el.attrs["src"])
        if target in seen:
            continue  # frame cycle: leave the iframe empty
        seen.add(target)
        budget[0] -= 1
        html = fetch(target)
        if html is None:
            continue
        sub = build_tree(html)
        # nested frames resolve against the FRAME document's base
        _inline_iframes(
            sub, _base_href(sub, target), fetch, seen, budget, depth - 1
        )
        children = _body_children(sub)
        for c in children:
            if isinstance(c, Node):
                c.parent = el
        el.children = list(children)


def _unwrap_noscript(tree: Node) -> None:
    for el in iter_elements(tree):
        new_children: list = []
        changed = False
        for c in el.children:
            if isinstance(c, Node) and c.tag == "noscript":
                for gc in c.children:
                    if isinstance(gc, Node):
                        gc.parent = el
                    new_children.append(gc)
                changed = True
            else:
                new_children.append(c)
        if changed:
            el.children = new_children
    # the root's own direct children too
    new_children = []
    changed = False
    for c in tree.children:
        if isinstance(c, Node) and c.tag == "noscript":
            for gc in c.children:
                if isinstance(gc, Node):
                    gc.parent = tree
                new_children.append(gc)
            changed = True
        else:
            new_children.append(c)
    if changed:
        tree.children = new_children


def static_dom_render(
    fetch: Fetch,
    max_refresh_hops: int = 3,
    max_iframes: int = 8,
    iframe_depth: int = 2,
):
    """Build a ``Render`` hook (url, html) -> rendered_html for
    sources/browser.py: follow meta refreshes (bounded, cycle-safe), inline
    iframes (bounded count + nesting depth), unwrap noscript, then
    re-serialize. All fetches go through ``fetch`` — in the engine that is
    the fixture corpus / politeness-governed fetcher, never a side
    channel."""

    def render(url: str, html: str) -> str:
        seen = {url}
        cur_url, cur_html = url, html
        for _ in range(max_refresh_hops):
            tree = build_tree(cur_html)
            target = meta_refresh_target(tree, cur_url)
            if target is None or target in seen:
                break
            fetched = fetch(target)
            if fetched is None:
                break
            seen.add(target)
            cur_url, cur_html = target, fetched
        tree = build_tree(cur_html)
        base = _base_href(tree, cur_url)
        _inline_iframes(
            tree, base, fetch, set(seen), [max_iframes], iframe_depth
        )
        _unwrap_noscript(tree)
        return serialize(tree)

    return render
