"""Golden tests for pagination detection/generation/stop rules (P1-P3).

Goldens minted from the reference's pagination.py observed behavior.
"""

from __future__ import annotations

import pytest

from crawler_spark.kernels.pagination import (
    StopDetector,
    detect_pattern,
    generate_range,
    generate_url,
    template_pattern,
)

DETECT_GOLDENS = [
    ("https://example.com/products?page=5",
     {"kind": "query_param", "param_name": "page", "increment": 1, "current_page": 5},
     "https://example.com/products?page=6"),
    ("https://example.com/api/items?offset=40&limit=20",
     {"kind": "query_param", "param_name": "offset", "increment": 20, "current_page": 3},
     "https://example.com/api/items?offset=60&limit=20"),
    ("https://example.com/api/items?offset=40",
     {"kind": "query_param", "param_name": "offset", "increment": 20, "current_page": 3},
     "https://example.com/api/items?offset=60"),
    ("https://example.com/search?q=test&p=2",
     {"kind": "query_param", "param_name": "p", "increment": 1, "current_page": 2},
     "https://example.com/search?q=test&p=3"),
    ("https://example.com/page/5",
     {"kind": "path_segment", "segment_index": 2, "current_page": 5},
     "https://example.com/page/6"),
    ("https://example.com/products/page/3",
     {"kind": "path_segment", "segment_index": 3, "current_page": 3},
     "https://example.com/products/page/4"),
    ("https://example.com/category/electronics/p/2",
     {"kind": "path_segment", "segment_index": 4, "current_page": 2},
     "https://example.com/category/electronics/p/3"),
    ("https://example.com/products-p5",
     {"kind": "path_embedded", "prefix": "/products-p", "suffix": "", "current_page": 5},
     "https://example.com/products-p6"),
    ("https://example.com/category/list5.html",
     {"kind": "path_embedded", "prefix": "/category/list", "suffix": ".html", "current_page": 5},
     "https://example.com/category/list6.html"),
    ("https://example.com/archive2024-page3",
     {"kind": "path_embedded", "prefix": "/archive2024-page", "suffix": "", "current_page": 3},
     "https://example.com/archive2024-page4"),
    ("https://example.com/?start=10",
     {"kind": "query_param", "param_name": "start", "increment": 1, "current_page": 10},
     "https://example.com/?start=11"),
    ("https://example.com/?from=30&page=2",  # 'page' outranks 'from'
     {"kind": "query_param", "param_name": "page", "increment": 1, "current_page": 2},
     "https://example.com/?from=30&page=3"),
]


@pytest.mark.parametrize("url,expected,next_url", DETECT_GOLDENS)
def test_detect_and_generate_golden(url, expected, next_url):
    got = detect_pattern(url)
    assert got == expected
    assert generate_url(got, url, got["current_page"] + 1) == next_url


def test_detect_none():
    assert detect_pattern("https://example.com/detail/123456") is None  # >9999: an ID
    assert detect_pattern("https://example.com/plain") is None


def test_detect_invalid():
    with pytest.raises(ValueError):
        detect_pattern("no-scheme.com/x")


def test_template():
    pat = template_pattern("https://e.com/l?page={page}")
    assert generate_url(pat, "ignored", 7) == "https://e.com/l?page=7"


def test_generate_range():
    pat = detect_pattern("https://e.com/l?page=1")
    assert generate_range(pat, "https://e.com/l?page=1", 2, 4) == [
        "https://e.com/l?page=2", "https://e.com/l?page=3", "https://e.com/l?page=4",
    ]


def test_stop_http_errors():
    det = StopDetector()
    assert det.check(404, "x", "u")[0] and "404" in det.check(404, "x", "u")[1]
    assert det.check(403, "x", "u") == (True, "403 Forbidden - access denied")
    assert det.check(503, "x", "u") == (True, "Server error: HTTP 503")
    assert det.check(200, "y" * 200, "u2") == (False, "")


def test_stop_consecutive_empty():
    det = StopDetector()
    results = [det.check(200, c, f"https://e.com/p{i}")
               for i, c in enumerate(["x" * 200, "y" * 200, "short", "tiny"])]
    assert [r[0] for r in results] == [False, False, False, True]
    assert results[3][1] == "2 consecutive empty responses (< 100 bytes)"


def test_empty_counter_resets():
    det = StopDetector()
    det.check(200, "short", "u1")
    det.check(200, "z" * 200, "u2")      # resets counter
    assert det.check(200, "tiny", "u3") == (False, "")


def test_stop_duplicate_content_and_revisit():
    det = StopDetector()
    assert det.check(200, "z" * 200, "https://e.com/a") == (False, "")
    stop, reason = det.check(200, "z" * 200, "https://e.com/b")
    assert stop and reason == "Duplicate content detected (identical page)"
    det2 = StopDetector()
    det2.check(200, "z" * 200, "https://e.com/a")
    stop, reason = det2.check(200, "w" * 200, "https://e.com/a")
    assert stop and reason.startswith("Circular pagination detected")


class TestStrategyPick:
    """P4: template -> auto-detect -> selector fallback -> single page."""

    def test_disabled_returns_seed(self):
        from crawler_spark.kernels.pagination import plan_pagination

        s, urls = plan_pagination("https://x.go.id/l?page=1", {"enabled": False})
        assert s == "disabled" and urls == ["https://x.go.id/l?page=1"]

    def test_template_wins_over_detection(self):
        from crawler_spark.kernels.pagination import plan_pagination

        s, urls = plan_pagination(
            "https://x.go.id/l?page=1",
            {"url_template": "https://x.go.id/l?halaman={page}", "max_pages": 3},
        )
        assert s == "template"
        assert urls == [f"https://x.go.id/l?halaman={n}" for n in (1, 2, 3)]

    def test_template_start_page(self):
        from crawler_spark.kernels.pagination import plan_pagination

        _, urls = plan_pagination(
            "https://x.go.id/l",
            {"url_template": "https://x.go.id/p/{page}", "start_page": 5, "max_pages": 7},
        )
        assert urls == ["https://x.go.id/p/5", "https://x.go.id/p/6", "https://x.go.id/p/7"]

    def test_autodetect_includes_seed_then_next_pages(self):
        from crawler_spark.kernels.pagination import plan_pagination

        s, urls = plan_pagination("https://x.go.id/l?page=2", {"max_pages": 5})
        assert s == "detected:query_param"
        assert urls[0] == "https://x.go.id/l?page=2"
        assert urls[1:] == [f"https://x.go.id/l?page={n}" for n in (3, 4, 5)]

    def test_selector_fallback(self):
        from crawler_spark.kernels.pagination import plan_pagination

        s, urls = plan_pagination("https://x.go.id/tentang", {"selector": "a.next"})
        assert s == "selector_fallback" and urls == ["https://x.go.id/tentang"]

    def test_single_page_when_nothing_applies(self):
        from crawler_spark.kernels.pagination import plan_pagination

        s, urls = plan_pagination("https://x.go.id/tentang")
        assert s == "single_page" and urls == ["https://x.go.id/tentang"]
