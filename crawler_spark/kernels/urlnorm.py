"""URL canonicalization kernel (operators U1-U4, U8 in SURVEY.md §2.1).

Behavior-equivalent to the reference's URL utilities
(``/root/reference/crawler/utils/url.py:78-269`` — normalize, hash, equivalence;
``/root/reference/crawler/services/html_parser.py:357-383`` — relative resolve),
re-implemented fresh. Golden-tested in tests/test_urlnorm.py against values
minted from the reference's observed behavior.

Canonicalization rules (the URL-seen-set invariant depends on these being
bit-exact):
  * scheme + netloc lowercased (path case preserved)
  * fragment dropped
  * known tracking params dropped unless they are also semantic/preserved
  * multi-valued params collapse to their FIRST value
  * params sorted by name; re-encoded with ``quote_plus`` (space -> '+')
  * blank values kept (``?empty=&page=3`` keeps ``empty=``)

The param-name sets below are data (public tracker/param names), mirrored from
the reference's sets at url.py:8-75 so the seen-set matches row-for-row.
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qs, urlencode, urljoin, urlparse, urlunparse

TRACKING_PARAMS = frozenset(
    {
        # Google Analytics
        "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
        "utm_id", "utm_source_platform", "utm_creative_format",
        "utm_marketing_tactic",
        # Facebook
        "fbclid", "fb_action_ids", "fb_action_types", "fb_source", "fb_ref",
        # Google Ads / Microsoft / Twitter / TikTok / LinkedIn
        "gclid", "gclsrc", "dclid", "msclkid", "twclid", "ttclid", "li_fat_id",
        # Mailchimp / HubSpot
        "mc_cid", "mc_eid", "_hsenc", "_hsmi",
        # generic
        "ref", "referrer", "source", "campaign", "medium",
    }
)

SEMANTIC_PARAMS = frozenset(
    {
        "page", "p", "category", "cat", "id", "item", "product", "search",
        "q", "query", "sort", "order", "filter", "limit", "offset", "lang",
        "locale", "size", "color", "variant", "tab", "section",
    }
)


def normalize_url(
    url: str,
    *,
    remove_fragment: bool = True,
    remove_tracking: bool = True,
    sort_params: bool = True,
    lowercase_scheme_host: bool = True,
    preserve_params: frozenset[str] | set[str] | None = None,
) -> str:
    """Canonicalize a URL for dedup. Raises ValueError on unparseable input."""
    if not url or not isinstance(url, str):
        raise ValueError("URL must be a non-empty string")
    try:
        parts = urlparse(url.strip())
    except Exception as exc:  # pragma: no cover - urlparse rarely raises
        raise ValueError(f"Invalid URL: {exc}") from exc
    if not parts.scheme or not parts.netloc:
        raise ValueError(f"URL must have a scheme and hostname: {url}")

    scheme = parts.scheme.lower() if lowercase_scheme_host else parts.scheme
    netloc = parts.netloc.lower() if lowercase_scheme_host else parts.netloc

    query = ""
    if parts.query:
        multi = parse_qs(parts.query, keep_blank_values=True)
        keep = SEMANTIC_PARAMS if preserve_params is None else (SEMANTIC_PARAMS | set(preserve_params))
        if remove_tracking:
            multi = {k: v for k, v in multi.items() if k in keep or k not in TRACKING_PARAMS}
        firsts = {k: v[0] for k, v in multi.items()}
        items = sorted(firsts.items()) if sort_params else list(firsts.items())
        query = urlencode(items, doseq=False)

    fragment = "" if remove_fragment else parts.fragment
    return urlunparse((scheme, netloc, parts.path, parts.params, query, fragment))


def hash_url(url: str, normalize: bool = True, **kw) -> str:
    """SHA-256 hex digest of the (normalized) URL — the seen-set key."""
    if normalize:
        url = normalize_url(url, **kw)
    return hashlib.sha256(url.encode("utf-8")).hexdigest()


def normalize_and_hash(url: str, **kw) -> tuple[str, str]:
    norm = normalize_url(url, **kw)
    return norm, hashlib.sha256(norm.encode("utf-8")).hexdigest()


def are_urls_equivalent(url1: str, url2: str, **kw) -> bool:
    try:
        return normalize_url(url1, **kw) == normalize_url(url2, **kw)
    except ValueError:
        return False


def resolve_relative(href: str, base_url: str) -> str:
    """Absolutize an extracted href against its page URL (U8)."""
    return urljoin(base_url, href)


def canonical_host(url: str) -> str:
    """Lowercased hostname (without userinfo/port) — the politeness key."""
    host = urlparse(url.strip()).hostname
    return host.lower() if host else ""


# Registrable-domain extraction (beyond-reference; the reference keys
# politeness on the raw hostname only — rate_limiter.py keys on
# website_id/host). Subdomain sharding (www./m./arsip. mirrors of one
# portal) silently multiplies a host-keyed politeness budget; grouping by
# the REGISTRABLE domain restores one budget per organization. The suffix
# set is the Indonesian slice of the public-suffix list (the .id registry's
# second-level zones) plus the generic TLD default rule; swap in the full
# PSL snapshot for a world-wide crawl — the algorithm (longest matching
# public suffix + one label) is the PSL's, unchanged.
ID_SECOND_LEVEL_SUFFIXES = frozenset(
    {
        "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
        "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    }
)


def registered_domain(host: str) -> str:
    """Registrable domain of a lowercased hostname: public suffix + one
    label. IP literals and single-label hosts pass through unchanged
    (minus any trailing FQDN dots — stripped FIRST, on every branch, so
    the Catalyst twin registered_domain_col stays bit-identical)."""
    host = host.rstrip(".")
    if not host or host.replace(".", "").isdigit():
        return host
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    last2 = ".".join(labels[-2:])
    if last2 in ID_SECOND_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return last2
