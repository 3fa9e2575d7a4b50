"""Deterministic synthetic web corpus for engine tests + benchmarks.

Stands in for the network boundary (the reference fetches real Indonesian
legal portals — BPK Peraturan / SPSE tenders, PRD.md:2616,2763). Every page
is derived purely from (host, path) via sha256, so any process — Spark
executor, DuckDB oracle, or the pure-Python simulator — reconstructs the
exact same web. Shape mirrors the BPK config (PRD.md:2706-2710): listing
pages paginated by ?page=N linking detail pages; detail pages carry a title,
body paragraphs, a PDF link (media span), and an image (media span).

Failure planting (deterministic):
  * page 404s when sha-derived byte % 17 == 0      (not_found, no retry)
  * page 500s when byte % 23 == 1                  (server_error, retryable)
  * detail duplicates: detail d and d+1 share a body when d % 7 == 3
    (exact-dup suppression must collapse them)
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass


@dataclass(frozen=True)
class CorpusSpec:
    n_hosts: int = 4
    listing_pages: int = 4       # pages per host listing chain
    details_per_page: int = 5
    hosts_with_robots: int = 2   # first k hosts get a robots.txt


def _h(s: str) -> bytes:
    return hashlib.sha256(s.encode()).digest()


def host_name(i: int) -> str:
    return f"portal{i}.go.id"


def listing_url(host: str, page: int) -> str:
    return f"https://{host}/putusan?page={page}"


def detail_url(host: str, page: int, slot: int) -> str:
    return f"https://{host}/putusan/detail/{page * 100 + slot}"


def robots_txt(spec: CorpusSpec, host_idx: int) -> str | None:
    """Hosts 0..k-1: disallow /private/ and every 5th detail id bucket via a
    wildcard; host 0 also sets a crawl-delay."""
    if host_idx >= spec.hosts_with_robots:
        return None
    lines = ["User-agent: *", "Disallow: /private/", "Disallow: /putusan/detail/*3$"]
    if host_idx == 0:
        lines.append("Crawl-delay: 2")
    return "\n".join(lines) + "\n"


def page_status(url: str) -> int:
    b = _h("status:" + url)[0]
    if b % 17 == 0:
        return 404
    if b % 23 == 1:
        return 500
    if b % 19 == 2:
        return 429  # rate-limited: retryable, carries Retry-After
    return 200


def retry_after_rounds(url: str) -> str:
    """Deterministic Retry-After value (in rounds) for 429 responses."""
    return str(_h("ra:" + url)[1] % 3 + 2)


def _effective_det(page: int, slot: int) -> int:
    det = page * 100 + slot
    if det % 7 == 3:  # planted exact duplicate: whole page == det-1's page
        det -= 1
    return det


def detail_html(host: str, page: int, slot: int) -> str:
    """Page content depends ONLY on (host, effective det) — a planted
    duplicate is byte-identical to its twin (same title/body/links), so
    exact-content dedup must collapse the two distinct URLs."""
    det = _effective_det(page, slot)
    seed = f"{host}/{det}"
    words = []
    for i in range(30):
        words.append(_h(f"w:{seed}:{i}").hex()[:6])
    body = " ".join(words)
    # the back-link keeps a live re-discovery path to the listing (both
    # twins share (host, page), so planted duplicates stay byte-identical)
    return (
        f"<html><head><title>Putusan {det} {host}</title></head><body>"
        f"<h1>Putusan Nomor {det}</h1>"
        f"<p>{body}</p>"
        f'<a class="download-pdf" href="/files/{det}.pdf">Unduh PDF</a>'
        f"<p>Dokumen resmi {seed}</p>"
        f'<img src="/img/{det}.png">'
        f'<a class="back" href="{listing_url(host, page)}">Kembali</a>'
        f"</body></html>"
    )


def listing_html(spec: CorpusSpec, host: str, page: int) -> str:
    links = []
    for slot in range(spec.details_per_page):
        u = detail_url(host, page, slot)
        links.append(f'<div class="item"><a href="{u}">Detail {page}-{slot}</a></div>')
    # last listing page has no next link; StopDetector also stops on 404.
    # prev links create the re-discovery cycles that exercise TTL'd
    # (windowed) seen membership; under permanent membership they are
    # always dedup-dropped.
    nxt = (
        f'<a class="next" href="{listing_url(host, page + 1)}">Next</a>'
        if page < spec.listing_pages
        else ""
    )
    prv = (
        f'<a class="prev" href="{listing_url(host, page - 1)}">Prev</a>'
        if page > 1
        else ""
    )
    return (
        f"<html><head><title>Daftar {host} p{page}</title></head><body>"
        + "".join(links)
        + prv
        + nxt
        + "</body></html>"
    )


def build_corpus(spec: CorpusSpec) -> dict[str, tuple[int, str, str | None]]:
    """url -> (status, content, retry_after). The whole synthetic web."""
    corpus: dict[str, tuple[int, str, str | None]] = {}
    for hi in range(spec.n_hosts):
        host = host_name(hi)
        for page in range(1, spec.listing_pages + 1):
            lu = listing_url(host, page)
            st = page_status(lu)
            ra = retry_after_rounds(lu) if st == 429 else None
            corpus[lu] = (st, listing_html(spec, host, page) if st == 200 else "", ra)
            for slot in range(spec.details_per_page):
                du = detail_url(host, page, slot)
                st = page_status(du)
                ra = retry_after_rounds(du) if st == 429 else None
                corpus[du] = (st, detail_html(host, page, slot) if st == 200 else "", ra)
    return corpus


def robots_map(spec: CorpusSpec) -> dict[str, str]:
    out = {}
    for hi in range(spec.n_hosts):
        txt = robots_txt(spec, hi)
        if txt is not None:
            out[host_name(hi)] = txt
    return out


def seed_urls(spec: CorpusSpec) -> list[str]:
    return [listing_url(host_name(i), 1) for i in range(spec.n_hosts)]


def website_configs(spec: CorpusSpec) -> dict[str, dict]:
    """Per-host {field: selector} website configs, shaped like the BPK
    production config (PRD.md:2699-2713): a title selector, a body-paragraph
    array, and a download-documents array — runnable against detail_html."""
    cfg = {
        "title": "h1",
        "body": {"selector": "p", "type": "array"},
        "documents": {"selector": "a.download-pdf", "attribute": "href",
                      "type": "array"},
    }
    return {host_name(i): cfg for i in range(spec.n_hosts)}
