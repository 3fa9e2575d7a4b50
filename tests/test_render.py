"""Static-DOM render layer (kernels/render.py): the deterministic half of
browser rendering — meta-refresh follow, iframe inlining, noscript
promotion, base-href resolution — plus the serialize round-trip the
content-length oracles rely on."""

from __future__ import annotations

import pytest

from crawler_spark.kernels.dom import build_tree, serialize
from crawler_spark.kernels.render import meta_refresh_target, static_dom_render

CORPUS = {
    "https://p.go.id/a": (
        '<html><head><meta http-equiv="refresh" content="0; url=/b">'
        "</head><body>stub</body></html>"
    ),
    "https://p.go.id/b": (
        '<html><body><h1 class="t">B</h1><iframe src="/f"></iframe>'
        "</body></html>"
    ),
    "https://p.go.id/f": (
        '<html><body><div id="m"><span class="nomor">NO-9</span></div>'
        "</body></html>"
    ),
    "https://p.go.id/hop1": (
        '<html><head><meta http-equiv="refresh" content="1;url=/hop2">'
        "</head><body></body></html>"
    ),
    "https://p.go.id/hop2": (
        '<html><head><meta http-equiv="refresh" content="1;url=/hop3">'
        "</head><body></body></html>"
    ),
    "https://p.go.id/hop3": "<html><body>deep</body></html>",
    "https://p.go.id/loop": (
        '<html><head><meta http-equiv="refresh" content="0; url=/loop">'
        "</head><body>looped</body></html>"
    ),
    "https://p.go.id/base": (
        '<html><head><base href="https://other.go.id/dir/">'
        "<meta http-equiv=\"refresh\" content=\"2, URL='rel'\">"
        "</head><body></body></html>"
    ),
    "https://other.go.id/dir/rel": "<html><body>reached</body></html>",
    "https://p.go.id/selfframe": (
        '<html><body><iframe src="/selfframe"></iframe></body></html>'
    ),
}


@pytest.fixture()
def render():
    return static_dom_render(CORPUS.get)


def test_serialize_roundtrip_is_identity_for_plain_pages():
    for html in CORPUS.values():
        assert serialize(build_tree(html)) == html
    # void tags, nested attrs, text escaping
    page = '<html><body><img src="/x.png"><br><p a="1" b="2">t</p></body></html>'
    assert serialize(build_tree(page)) == page


def test_refresh_then_iframe(render):
    out = render("https://p.go.id/a", CORPUS["https://p.go.id/a"])
    assert '<h1 class="t">B</h1>' in out
    assert "NO-9" in out, "frame document must be inlined after the refresh"
    assert "stub" not in out


def test_refresh_hops_bounded(render):
    out = render("https://p.go.id/hop1", CORPUS["https://p.go.id/hop1"])
    assert "deep" in out  # 2 hops < default bound of 3
    tight = static_dom_render(CORPUS.get, max_refresh_hops=1)
    out = tight("https://p.go.id/hop1", CORPUS["https://p.go.id/hop1"])
    assert "deep" not in out and "hop3" in out  # stopped at hop2's stub


def test_refresh_cycle_safe(render):
    out = render("https://p.go.id/loop", CORPUS["https://p.go.id/loop"])
    assert "looped" in out  # self-refresh is not followed


def test_refresh_without_url_not_followed(render):
    page = '<html><head><meta http-equiv="refresh" content="30"></head><body>stay</body></html>'
    assert "stay" in render("https://p.go.id/x", page)
    assert meta_refresh_target(build_tree(page), "https://p.go.id/x") is None


def test_base_href_governs_resolution(render):
    out = render("https://p.go.id/base", CORPUS["https://p.go.id/base"])
    assert "reached" in out


def test_iframe_cycle_and_budget(render):
    out = render(
        "https://p.go.id/selfframe", CORPUS["https://p.go.id/selfframe"]
    )
    # the page's own URL is in the seen set: self-framing stays empty
    assert out.count("<iframe") == 1 and "</iframe>" in out
    many = (
        "<html><body>"
        + "".join(f'<iframe src="/f?n={i}"></iframe>' for i in range(12))
        + "</body></html>"
    )
    corpus = dict(CORPUS)
    for i in range(12):
        corpus[f"https://p.go.id/f?n={i}"] = f"<html><body><b>F{i}</b></body></html>"
    capped = static_dom_render(corpus.get, max_iframes=4)
    out = capped("https://p.go.id/many", many)
    assert sum(f"F{i}" in out for i in range(12)) == 4


def test_iframe_depth_bounded():
    corpus = {
        "https://p.go.id/d1": '<html><body><iframe src="/d2"></iframe></body></html>',
        "https://p.go.id/d2": '<html><body><iframe src="/d3"></iframe><i>two</i></body></html>',
        "https://p.go.id/d3": "<html><body><i>three</i></body></html>",
    }
    r = static_dom_render(corpus.get, iframe_depth=2)
    out = r("https://p.go.id/top", '<html><body><iframe src="/d1"></iframe></body></html>')
    # depth 2: d1 inlined, d2 inlined inside it, d3 NOT
    assert "two" in out and "three" not in out


def test_noscript_promoted(render):
    page = (
        "<html><body><noscript><div id=\"m\">nm</div></noscript>"
        "<p>t</p></body></html>"
    )
    out = render("https://p.go.id/n", page)
    assert "<noscript>" not in out and '<div id="m">nm</div>' in out


def test_unfetchable_targets_leave_page_intact(render):
    page = (
        '<html><head><meta http-equiv="refresh" content="0; url=/missing">'
        '</head><body><iframe src="/alsomissing"></iframe>keep</body></html>'
    )
    out = render("https://p.go.id/u", page)
    assert "keep" in out and '<iframe src="/alsomissing"></iframe>' in out
