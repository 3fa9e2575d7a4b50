"""Pagination kernel (operators P1-P3 in SURVEY.md §2.3).

Behavior-equivalent to ``/root/reference/crawler/utils/pagination.py``:
pattern detection (:173-356), per-pattern URL generation (:56-165), and the
stateful stop detector (:441-537). Fresh implementation; patterns are plain
dicts (UDF/Arrow-transportable) instead of a class hierarchy.

Pattern dict: {"kind": "query_param"|"path_segment"|"path_embedded"|"template",
               "current_page": int, and kind-specific keys}.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qs, urlencode, urlparse, urlunparse

QUERY_PARAM_NAMES = ["page", "p", "offset", "start", "skip", "from"]  # priority order
PATH_SEGMENT_INDICATORS = {"page", "p"}
_EMBEDDED = re.compile(r"^(.*\D)(\d+)(\D*)$")
DEFAULT_OFFSET_INCREMENT = 20
MAX_EMBEDDED_PAGE = 9999


def detect_pattern(seed_url: str) -> dict | None:
    """Detect the pagination pattern of a seed URL, or None."""
    if not seed_url or not isinstance(seed_url, str):
        raise ValueError("seed_url must be a non-empty string")
    parts = urlparse(seed_url.strip())
    if not parts.scheme or not parts.netloc:
        raise ValueError(f"URL must have scheme and hostname: {seed_url}")

    # 1) query parameter (?page=5, ?offset=40[&limit=20])
    if parts.query:
        params = parse_qs(parts.query)
        for name in QUERY_PARAM_NAMES:
            if name not in params:
                continue
            try:
                value = int(params[name][0])
            except (ValueError, IndexError):
                continue
            increment = 1
            if name == "offset":
                try:
                    if "limit" in params:
                        increment = int(params["limit"][0])
                    elif "size" in params:
                        increment = int(params["size"][0])
                    else:
                        increment = DEFAULT_OFFSET_INCREMENT
                except (ValueError, IndexError):
                    increment = DEFAULT_OFFSET_INCREMENT
                current = (value // increment) + 1
            else:
                current = value
            return {
                "kind": "query_param",
                "param_name": name,
                "increment": increment,
                "current_page": current,
            }

    # 2) path segment (/page/5, /p/3)
    if parts.path:
        segs = parts.path.split("/")
        for i, seg in enumerate(segs):
            if seg.lower() in PATH_SEGMENT_INDICATORS and i + 1 < len(segs):
                try:
                    page = int(segs[i + 1])
                except ValueError:
                    continue
                return {"kind": "path_segment", "segment_index": i + 1, "current_page": page}

    # 3) embedded trailing number (/list5.html, /products-p5); last digit run,
    #    plausible page numbers only (1-9999) to avoid matching IDs
    if parts.path and any(c.isdigit() for c in parts.path):
        m = _EMBEDDED.search(parts.path)
        if m:
            page = int(m.group(2))
            if 1 <= page <= MAX_EMBEDDED_PAGE:
                return {
                    "kind": "path_embedded",
                    "prefix": m.group(1),
                    "suffix": m.group(3),
                    "current_page": page,
                }
    return None


def template_pattern(template: str, current_page: int = 1) -> dict:
    return {"kind": "template", "template": template, "current_page": current_page}


def generate_url(pattern: dict, base_url: str, page_number: int) -> str:
    """Generate the URL for `page_number` under a detected/template pattern."""
    kind = pattern["kind"]
    if kind == "template":
        return pattern["template"].replace("{page}", str(page_number))

    parts = urlparse(base_url)
    if kind == "query_param":
        params = parse_qs(parts.query, keep_blank_values=True)
        name, inc = pattern["param_name"], pattern.get("increment", 1)
        value = (page_number - 1) * inc if name == "offset" else page_number
        params[name] = [str(value)]
        query = urlencode({k: v[0] for k, v in params.items()}, doseq=False)
        return urlunparse((parts.scheme, parts.netloc, parts.path, parts.params, query, parts.fragment))
    if kind == "path_segment":
        segs = parts.path.split("/")
        idx = pattern["segment_index"]
        if 0 <= idx < len(segs):
            segs[idx] = str(page_number)
        return urlunparse((parts.scheme, parts.netloc, "/".join(segs), parts.params, parts.query, parts.fragment))
    if kind == "path_embedded":
        new_path = f"{pattern['prefix']}{page_number}{pattern['suffix']}"
        return urlunparse((parts.scheme, parts.netloc, new_path, parts.params, parts.query, parts.fragment))
    raise ValueError(f"Unknown pattern kind: {kind}")


def generate_range(pattern: dict, base_url: str, start_page: int, end_page: int) -> list[str]:
    return [generate_url(pattern, base_url, n) for n in range(start_page, end_page + 1)]


DEFAULT_MAX_PAGES = 100
DEFAULT_START_PAGE = 1


def plan_pagination(seed_url: str, config: dict | None = None) -> tuple[str, list[str]]:
    """P4 strategy pick (crawler/services/pagination.py:50-143,292-315):
    template -> auto-detect -> selector fallback -> single page.

    Returns (strategy, urls):
      * template: every page start_page..max_pages from the {page} template
        (max_pages is the END page number, reference semantics);
      * detected:<kind>: the seed plus pages current+1..max_pages;
      * selector_fallback / single_page / disabled: the seed only (selector
        pagination is DOM-driven inside the fetch loop).
    """
    cfg = config or {}
    if not cfg.get("enabled", True):
        return "disabled", [seed_url]
    max_pages = cfg.get("max_pages") or DEFAULT_MAX_PAGES
    template = cfg.get("url_template")
    if template:
        start = cfg.get("start_page") or DEFAULT_START_PAGE
        pat = template_pattern(template, start)
        return "template", generate_range(pat, seed_url, start, max_pages)
    pattern = detect_pattern(seed_url)
    if pattern:
        urls = [seed_url] + generate_range(
            pattern, seed_url, pattern["current_page"] + 1, max_pages
        )
        return f"detected:{pattern['kind']}", urls
    if cfg.get("selector"):
        return "selector_fallback", [seed_url]
    return "single_page", [seed_url]


class StopDetector:
    """Stateful pagination stop detection, used inside the per-host fetch group.

    Stop rules (checked in order): 404 / 403 / 5xx; URL revisit (circular);
    `max_empty` consecutive sub-`min_content_length` responses; exact duplicate
    content (sha256).
    """

    def __init__(self, min_content_length: int = 100, max_empty: int = 2):
        self.min_content_length = min_content_length
        self.max_empty = max_empty
        self._hashes: set[str] = set()
        self._urls: set[str] = set()
        self._consecutive_empty = 0

    def check(self, status_code: int, content: bytes | str, url: str) -> tuple[bool, str]:
        if status_code == 404:
            return True, "404 Not Found - end of pagination"
        if status_code == 403:
            return True, "403 Forbidden - access denied"
        if status_code >= 500:
            return True, f"Server error: HTTP {status_code}"

        if url in self._urls:
            return True, f"Circular pagination detected: revisited {url}"
        self._urls.add(url)

        data = content if isinstance(content, bytes) else content.encode("utf-8")
        if len(data) < self.min_content_length:
            self._consecutive_empty += 1
            if self._consecutive_empty >= self.max_empty:
                return True, (
                    f"{self._consecutive_empty} consecutive empty responses "
                    f"(< {self.min_content_length} bytes)"
                )
        else:
            self._consecutive_empty = 0

        if data:
            digest = hashlib.sha256(data).hexdigest()
            if digest in self._hashes:
                return True, "Duplicate content detected (identical page)"
            self._hashes.add(digest)

        return False, ""

    def reset(self) -> None:
        self._hashes.clear()
        self._urls.clear()
        self._consecutive_empty = 0
