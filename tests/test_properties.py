"""Property-based tests (hypothesis) over the pure kernels.

The reference ships only example-based tests (SURVEY.md §5); these pin the
algebraic properties the engine depends on: idempotent canonicalization
(seen-set stability), hash-order invariants, membership-filter guarantees,
robots-matcher consistency with urllib's parser on the shared subset.
"""

from __future__ import annotations

import string
from urllib import robotparser

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.kernels.membership import BloomFilter, CuckooFilter
from crawler_spark.kernels.pagination import detect_pattern, generate_url
from crawler_spark.kernels.robots import parse_robots
from crawler_spark.kernels.simhash import hamming, simhash64_signed
from crawler_spark.kernels.urlnorm import normalize_url

HOST = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,6}){1,2}", fullmatch=True)
PATHSEG = st.text(string.ascii_lowercase + string.digits + "-_", min_size=0, max_size=10)
PARAM = st.tuples(
    st.text(string.ascii_lowercase, min_size=1, max_size=6),
    st.text(string.ascii_letters + string.digits, min_size=0, max_size=8),
)


@st.composite
def urls(draw):
    host = draw(HOST)
    segs = draw(st.lists(PATHSEG, max_size=3))
    params = draw(st.lists(PARAM, max_size=4))
    frag = draw(st.sampled_from(["", "#x", "#sec-2"]))
    q = "&".join(f"{k}={v}" for k, v in params)
    path = "/" + "/".join(s for s in segs if s)
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "") + frag


class TestUrlNormProperties:
    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, u):
        once = normalize_url(u)
        assert normalize_url(once) == once

    @given(urls())
    @settings(max_examples=200, deadline=None)
    def test_case_of_scheme_host_irrelevant(self, u):
        assert normalize_url(u) == normalize_url(u.replace("https://", "HTTPS://", 1).replace("http://", "HTTP://", 1))

    @given(urls())
    @settings(max_examples=200, deadline=None)
    def test_fragment_stripped(self, u):
        assert "#" not in normalize_url(u)


class TestSimhashProperties:
    TOKENS = st.lists(st.text(string.ascii_lowercase, min_size=1, max_size=8), min_size=1, max_size=30)

    @given(TOKENS)
    @settings(max_examples=100, deadline=None)
    def test_order_invariant(self, toks):
        import random

        a = " ".join(toks)
        shuffled = toks[:]
        random.Random(7).shuffle(shuffled)
        b = " ".join(shuffled)
        assert simhash64_signed(a) == simhash64_signed(b)

    @given(TOKENS)
    @settings(max_examples=100, deadline=None)
    def test_self_distance_zero(self, toks):
        fp = simhash64_signed(" ".join(toks))
        assert hamming(fp, fp) == 0


class TestMembershipProperties:
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=500, unique=True))
    @settings(max_examples=30, deadline=None)
    def test_bloom_never_false_negative(self, keys):
        arr = np.array(keys, dtype=np.uint64)
        f = BloomFilter.for_capacity(len(arr))
        f.add_many(arr)
        assert f.contains_many(arr).all()
        g = BloomFilter.from_bytes(f.to_bytes())
        assert g.contains_many(arr).all()

    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=300, unique=True))
    @settings(max_examples=30, deadline=None)
    def test_cuckoo_insert_then_delete_roundtrip(self, keys):
        arr = np.array(keys, dtype=np.uint64)
        f = CuckooFilter.for_capacity(len(arr) * 2)
        assert f.add_many(arr) == len(arr)
        assert f.contains_many(arr).all()
        assert f.delete_many(arr) == len(arr)
        assert f.n_items == 0


class TestPaginationProperties:
    @given(st.integers(min_value=1, max_value=9999), st.integers(min_value=1, max_value=9999))
    @settings(max_examples=100, deadline=None)
    def test_detect_generate_roundtrip_query_param(self, cur, nxt):
        u = f"https://x.go.id/list?page={cur}"
        p = detect_pattern(u)
        assert p["kind"] == "query_param" and p["current_page"] == cur
        g = generate_url(p, u, nxt)
        assert detect_pattern(g)["current_page"] == nxt

    @given(st.integers(min_value=1, max_value=9999), st.integers(min_value=1, max_value=9999))
    @settings(max_examples=100, deadline=None)
    def test_detect_generate_roundtrip_path_segment(self, cur, nxt):
        u = f"https://x.go.id/arsip/page/{cur}"
        p = detect_pattern(u)
        assert p["kind"] == "path_segment" and p["current_page"] == cur
        g = generate_url(p, u, nxt)
        assert detect_pattern(g)["current_page"] == nxt


# no leading '//': urllib.parse reads that as an authority component and
# robotparser then treats the rule as empty-path (match-all) — a stdlib
# parsing quirk outside the RFC subset being compared
ROBOTS_PATH = st.from_regex(r"/([a-z0-9][a-z0-9/\-_.]{0,19})?", fullmatch=True)


class TestRobotsVsStdlib:
    """On PREFIX-FREE wildcard-free rule sets at most one rule can match any
    probe, so RFC 9309 longest-match (ours) and CPython robotparser's
    first-match-in-file-order must agree. (Overlapping rules genuinely
    diverge: urllib predates the RFC's longest-match/Allow-wins tiebreak.)"""

    @given(
        st.lists(st.tuples(st.booleans(), ROBOTS_PATH), min_size=1, max_size=5),
        ROBOTS_PATH,
    )
    @settings(max_examples=150, deadline=None)
    def test_agreement_on_plain_rules(self, rules, probe):
        from hypothesis import assume

        paths = [p for _, p in rules]
        assume(
            not any(
                i != j and a.startswith(b)
                for i, a in enumerate(paths)
                for j, b in enumerate(paths)
            )
        )
        lines = ["User-agent: *"]
        for allow, path in rules:
            lines.append(("Allow: " if allow else "Disallow: ") + path)
        txt = "\n".join(lines) + "\n"

        ours = parse_robots(txt).is_allowed("testbot", probe)

        rp = robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        theirs = rp.can_fetch("testbot", f"https://x.go.id{probe}")
        assert ours == theirs


class TestSelectorEngineProperties:
    """The selector engine must be total over arbitrary (malformed) HTML and
    keep its structural invariants — a crash in the extract UDF would fail a
    whole Spark task at 100 TB."""

    HTML_CHARS = st.text(
        alphabet=st.sampled_from(list("<>/ abc=\"'!-&;#.x1")), max_size=200
    )

    @given(HTML_CHARS)
    @settings(max_examples=300, deadline=None)
    def test_process_selectors_never_raises(self, html):
        from crawler_spark.kernels.selectors import process_selectors

        got = process_selectors(html, {
            "t": "h1.x",
            "links": {"selector": "a", "attribute": "href", "type": "array"},
            "xp": "//a/@href",
            "bad": {"nope": 1},
        })
        assert set(got) == {"t", "links", "xp", "bad"}
        assert got["bad"] is None
        assert got["links"] is None or isinstance(got["links"], list)

    @given(HTML_CHARS)
    @settings(max_examples=200, deadline=None)
    def test_single_is_first_of_array(self, html):
        from crawler_spark.kernels.selectors import build_tree, extract_data

        tree = build_tree(html)
        arr = extract_data(tree, "a", "href", result_type="array")
        one = extract_data(tree, "a", "href", result_type="single")
        assert one == (arr[0] if arr else None)

    @given(st.integers(min_value=0, max_value=10), st.integers(min_value=0, max_value=10))
    @settings(max_examples=50, deadline=None)
    def test_css_document_order(self, n_b, n_i):
        from crawler_spark.kernels.selectors import apply_css_selector, build_tree

        parts = [f"<b>b{i}</b>" for i in range(n_b)] + [f"<i>i{i}</i>" for i in range(n_i)]
        tree = build_tree("".join(parts))
        got = apply_css_selector(tree, "i, b", select_all=True)
        assert got == [f"b{i}" for i in range(n_b)] + [f"i{i}" for i in range(n_i)]


# --------------------------------------------------- stream parse == replay

_TAGS = ["div", "p", "li", "span", "h1", "td", "section", "article"]
_TEXT = st.text(
    string.ascii_letters + string.digits + " .,;-", min_size=0, max_size=12
)


@st.composite
def html_nodes(draw, depth=0):
    """Small well-formed HTML fragments: nested known tags, text, anchors,
    images, data-url carriers — everything the span parser reacts to."""
    kind = draw(
        st.sampled_from(
            ["text", "elem", "a", "img", "data"] if depth < 3 else ["text", "img"]
        )
    )
    if kind == "text":
        return draw(_TEXT)
    if kind == "img":
        return f'<img src="/img/{draw(st.integers(0, 99))}.png">'
    if kind == "a":
        href = f"/doc/{draw(st.integers(0, 99))}" + draw(
            st.sampled_from(["", ".pdf", ".html"])
        )
        cls = draw(st.sampled_from(["", ' class="download"', ' class="x"']))
        return f'<a href="{href}"{cls}>{draw(_TEXT)}</a>'
    if kind == "data":
        return f'<span data-url="/js/{draw(st.integers(0, 99))}">{draw(_TEXT)}</span>'
    tag = draw(st.sampled_from(_TAGS))
    kids = draw(st.lists(html_nodes(depth=depth + 1), max_size=4))
    return f"<{tag}>" + "".join(kids) + f"</{tag}>"


@given(st.lists(html_nodes(), max_size=5))
@settings(max_examples=120, deadline=None)
def test_tree_replay_equals_stream_parse_on_wellformed_html(nodes):
    """The single-lex hot path (build_tree + event replay) must reproduce the
    streaming extract_page exactly on well-formed HTML — spans, links
    (incl. container previews), and title."""
    from crawler_spark.kernels.dom import build_tree
    from crawler_spark.kernels.htmlparse import extract_page, parse_page_tree

    html = "<html><body>" + "".join(nodes) + "</body></html>"
    assert parse_page_tree(build_tree(html)) == extract_page(html)
