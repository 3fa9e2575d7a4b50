"""Sitemap discovery + parsing (sitemaps.org protocol), pure-Python kernel.

The reference has NO sitemap handling (verified: no 'sitemap' match anywhere
under /root/reference/crawler) — seed discovery there is config-driven seed
URLs only (`crawler/services/seed_url_crawler.py:303+`). A crawl-tier engine
at 10^10-URL scale gets most of its frontier from sitemaps, so this component
is designed fresh against the public protocol (sitemaps.org/protocol.html)
plus RFC 9309 §2.3 ("other records": the `Sitemap:` line in robots.txt):

  * discovery: `Sitemap:` lines in robots.txt are GLOBAL (not scoped to any
    user-agent group), case-insensitive key, value is an absolute URL;
  * `<urlset>` documents yield page entries: loc (required; entry dropped
    when missing/empty), lastmod, changefreq, priority (0.0-1.0, default
    0.5 per spec; out-of-range / non-numeric -> default);
  * `<sitemapindex>` documents yield child-sitemap entries (kind='sitemap')
    so the caller can recurse one level per round (index fan-out is frontier
    recirculation, not in-process recursion — same shape as pagination);
  * namespace-agnostic tag matching (documents in the wild carry the 0.9
    namespace, no namespace, or vendor extensions — localname only);
  * malformed XML -> [] (a fetch-quality problem, not a crash).

Pure functions only — Spark integration (Arrow-batched pandas UDF + explode)
lives in crawler_spark/functions/sitemap_udfs.py.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

__all__ = ["SitemapEntry", "sitemap_urls", "parse_sitemap", "sitemap_priority_to_frontier"]

DEFAULT_PRIORITY = 0.5


@dataclass
class SitemapEntry:
    kind: str  # 'url' (urlset entry) | 'sitemap' (sitemapindex entry)
    loc: str
    lastmod: str | None = None
    changefreq: str | None = None
    priority: float = DEFAULT_PRIORITY


def sitemap_urls(robots_text: str) -> list[str]:
    """`Sitemap:` directives from robots.txt, file order, duplicates kept
    (duplicate suppression is the seen set's job downstream). Global per
    RFC 9309 §2.3 — group membership is irrelevant, so this is a flat line
    scan independent of robots.parse_robots (which rightly ignores them)."""
    out: list[str] = []
    for raw in robots_text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val:
                out.append(val)
    return out


def _localname(tag: str) -> str:
    # '{http://www.sitemaps.org/schemas/sitemap/0.9}loc' -> 'loc'
    return tag.rsplit("}", 1)[-1].lower()


def _parse_priority(text: str | None) -> float:
    if text is None:
        return DEFAULT_PRIORITY
    try:
        p = float(text.strip())
    except ValueError:
        return DEFAULT_PRIORITY
    return p if 0.0 <= p <= 1.0 else DEFAULT_PRIORITY


def parse_sitemap(xml_text: str) -> list[SitemapEntry]:
    """Parse one sitemap document. Root <urlset> -> kind='url' entries;
    root <sitemapindex> -> kind='sitemap' entries; anything else / malformed
    XML -> []. Child order is preserved (document order is the protocol's
    only ordering signal and feeds the frontier's first-seen tiebreak)."""
    if not xml_text:
        return []
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    rootname = _localname(root.tag)
    if rootname == "urlset":
        child_tag, kind = "url", "url"
    elif rootname == "sitemapindex":
        child_tag, kind = "sitemap", "sitemap"
    else:
        return []
    entries: list[SitemapEntry] = []
    for child in root:
        if _localname(child.tag) != child_tag:
            continue
        fields: dict[str, str] = {}
        for el in child:
            name = _localname(el.tag)
            if name in ("loc", "lastmod", "changefreq", "priority"):
                fields[name] = (el.text or "").strip()
        loc = fields.get("loc", "")
        if not loc:
            continue  # loc is required by the protocol; entry is unusable
        entries.append(
            SitemapEntry(
                kind=kind,
                loc=loc,
                lastmod=fields.get("lastmod") or None,
                changefreq=fields.get("changefreq") or None,
                priority=_parse_priority(fields.get("priority")),
            )
        )
    return entries


def sitemap_priority_to_frontier(priority: float) -> int:
    """Map protocol priority (0.0-1.0, higher = more important) onto the
    frontier's 0-10 priority scale (S1: HIGHER numeric = crawled first —
    10 is manual/highest; `priority_queue.py:89-155` score
    `(10-priority)*10^12 + ts`, lower score drains first), so protocol
    1.0 -> 10 (front) and 0.0 -> 0 (back). round-half-even is fine here:
    the 0.1-step grid has no .5 ties and both engines use the same rule."""
    return int(round(priority * 10))
