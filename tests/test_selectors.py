"""Config-driven selector extraction (X1/X2/X3/X5) golden tests.

Cases ported (values, not code) from the reference's
tests/unit/test_selector_processor.py and tests/unit/test_html_parser.py,
run against the from-scratch CSS/XPath engines in kernels/selectors.py and
the Spark struct-UDF surface in functions/selector_udfs.py.
"""

import pytest

from crawler_spark.kernels.dom import build_tree
from crawler_spark.kernels.selectors import (
    apply_css_selector,
    apply_xpath,
    detect_selector_type,
    extract_data,
    navigate_json_path,
    process_selectors,
)

HTML_CONTENT = """
<html>
    <head><title>Test Page</title></head>
    <body>
        <h1 class="title">Main Title</h1>
        <div class="content">
            <p>Paragraph 1</p>
            <p>Paragraph 2</p>
        </div>
        <ul class="links">
            <li><a href="/link1" class="article">Article 1</a></li>
            <li><a href="/link2" class="article">Article 2</a></li>
            <li><a href="/link3" class="article">Article 3</a></li>
        </ul>
    </body>
</html>
"""

SAMPLE_HTML = """
<html>
    <head><title>Test Page</title></head>
    <body>
        <div class="container">
            <h1>Article List</h1>
            <article class="article" data-url="/article/1">
                <h3 class="article-title">First Article</h3>
                <p class="article-preview">This is the first article preview</p>
                <a href="/article/1" class="article-link">Read more</a>
            </article>
            <article class="article" data-url="/article/2">
                <h3 class="article-title">Second Article</h3>
                <p class="article-preview">This is the second article preview</p>
                <a href="/article/2" class="article-link">Read more</a>
            </article>
            <article class="article">
                <h3 class="article-title">Third Article</h3>
                <p class="article-preview">This is the third article preview</p>
                <a href="https://external.com/article" class="external-link">External</a>
            </article>
        </div>
        <nav>
            <a href="/page/1" class="nav-link">Page 1</a>
            <a href="/page/2" class="nav-link">Page 2</a>
        </nav>
    </body>
</html>
"""

JSON_CONTENT = {
    "status": "success",
    "data": {
        "user": {"name": "John", "email": "john@example.com"},
        "posts": [
            {"title": "Post 1", "url": "/post1"},
            {"title": "Post 2", "url": "/post2"},
        ],
    },
}


class TestProcessSelectors:
    def test_css_single(self):
        assert process_selectors(HTML_CONTENT, {"title": "h1.title"}) == {
            "title": "Main Title"
        }

    def test_css_array_attribute(self):
        got = process_selectors(
            HTML_CONTENT,
            {"links": {"selector": "a.article", "attribute": "href", "type": "array"}},
        )
        assert got["links"] == ["/link1", "/link2", "/link3"]

    def test_xpath_selector(self):
        got = process_selectors(HTML_CONTENT, {"title": "//h1[@class='title']/text()"})
        assert got["title"] == "Main Title"

    def test_multiple_selectors(self):
        got = process_selectors(
            HTML_CONTENT,
            {
                "title": "h1.title",
                "paragraphs": {"selector": ".content p", "type": "array"},
                "links": {"selector": "a.article", "attribute": "href", "type": "array"},
            },
        )
        assert got["title"] == "Main Title"
        assert got["paragraphs"] == ["Paragraph 1", "Paragraph 2"]
        assert got["links"] == ["/link1", "/link2", "/link3"]

    def test_json_selectors(self):
        got = process_selectors(
            JSON_CONTENT, {"status": "status", "user_name": "data.user.name"}
        )
        assert got == {"status": "success", "user_name": "John"}
        assert process_selectors(JSON_CONTENT, {"email": "data.user.email"}) == {
            "email": "john@example.com"
        }

    def test_json_array_index(self):
        got = process_selectors(
            JSON_CONTENT,
            {"first_post": "data.posts.0.title", "first_url": "data.posts.0.url"},
        )
        assert got == {"first_post": "Post 1", "first_url": "/post1"}

    def test_json_path_not_found(self):
        assert process_selectors(JSON_CONTENT, {"missing": "data.nonexistent.field"}) == {
            "missing": None
        }

    def test_json_array_wrap(self):
        # result_type=array over a scalar wraps; over a miss -> []
        got = process_selectors(
            JSON_CONTENT,
            {
                "one": {"selector": "data.user.name", "type": "array"},
                "none": {"selector": "data.nope", "type": "array"},
            },
        )
        assert got == {"one": ["John"], "none": []}

    def test_detect_selector_type(self):
        assert detect_selector_type("//div[@class='test']") == "xpath"
        assert detect_selector_type("/html/body/div") == "xpath"
        assert detect_selector_type("div.class") == "css"
        assert detect_selector_type("#id-selector") == "css"

    def test_empty_selectors(self):
        assert process_selectors(HTML_CONTENT, {}) == {}

    def test_selector_not_found(self):
        assert process_selectors(HTML_CONTENT, {"missing": ".nonexistent-class"}) == {
            "missing": None
        }

    def test_invalid_selector_config(self):
        got = process_selectors(HTML_CONTENT, {"invalid": {"no_selector_field": "v"}})
        assert got["invalid"] is None
        assert process_selectors(HTML_CONTENT, {"bad_type": 42}) == {"bad_type": None}

    def test_attribute_single(self):
        got = process_selectors(
            HTML_CONTENT, {"first_link": {"selector": "a.article", "attribute": "href"}}
        )
        assert got["first_link"] == "/link1"


class TestCssEngine:
    def test_single(self):
        tree = build_tree(SAMPLE_HTML)
        assert apply_css_selector(tree, "h1") == ["Article List"]

    def test_multiple(self):
        tree = build_tree(SAMPLE_HTML)
        got = apply_css_selector(tree, ".article-title", select_all=True)
        assert got == ["First Article", "Second Article", "Third Article"]

    def test_attribute(self):
        tree = build_tree(SAMPLE_HTML)
        got = apply_css_selector(tree, "a.article-link", "href", select_all=True)
        assert got == ["/article/1", "/article/2"]

    def test_no_match(self):
        tree = build_tree(SAMPLE_HTML)
        assert apply_css_selector(tree, ".nonexistent", select_all=True) == []

    def test_child_vs_descendant(self):
        tree = build_tree(
            '<div class="a"><p>direct</p><span><p>nested</p></span></div>'
        )
        assert apply_css_selector(tree, "div.a > p", select_all=True) == ["direct"]
        assert apply_css_selector(tree, "div.a p", select_all=True) == [
            "direct", "nested"
        ]

    def test_id_and_attr_selectors(self):
        tree = build_tree(
            '<div id="main"><meta property="og:lang" content="id-ID">'
            '<a href="/x" rel="nofollow external">x</a></div>'
        )
        assert apply_css_selector(
            tree, "meta[property='og:lang']", "content", select_all=True
        ) == ["id-ID"]
        assert apply_css_selector(tree, "#main a", "href") == ["/x"]
        assert apply_css_selector(tree, "a[rel~=external]", "href") == ["/x"]
        assert apply_css_selector(tree, "a[rel^=nofollow]", "href") == ["/x"]
        assert apply_css_selector(tree, "a[rel$=external]", "href") == ["/x"]
        assert apply_css_selector(tree, "a[rel*='low ext']", "href") == ["/x"]

    def test_selector_groups_document_order(self):
        tree = build_tree("<b>one</b><i>two</i><b>three</b>")
        assert apply_css_selector(tree, "i, b", select_all=True) == [
            "one", "two", "three"
        ]

    def test_multivalued_class_compound(self):
        tree = build_tree('<p class="x y z">hit</p><p class="x">miss</p>')
        assert apply_css_selector(tree, "p.x.y", select_all=True) == ["hit"]


class TestXPathEngine:
    def test_text(self):
        tree = build_tree(SAMPLE_HTML)
        assert apply_xpath(tree, "//h1/text()") == ["Article List"]

    def test_attribute_step(self):
        tree = build_tree(SAMPLE_HTML)
        got = apply_xpath(tree, "//a[@class='article-link']/@href")
        assert got == ["/article/1", "/article/2"]

    def test_attribute_param(self):
        tree = build_tree(SAMPLE_HTML)
        got = apply_xpath(tree, "//a[@class='article-link']", "href")
        assert got == ["/article/1", "/article/2"]

    def test_multiple_elements(self):
        tree = build_tree(SAMPLE_HTML)
        assert len(apply_xpath(tree, "//h3[@class='article-title']")) == 3

    def test_no_match(self):
        tree = build_tree(SAMPLE_HTML)
        assert apply_xpath(tree, "//nonexistent") == []

    def test_child_axis(self):
        tree = build_tree(
            '<div class="content"><div>a</div><span><div>b</div></span></div>'
        )
        assert apply_xpath(tree, "//div[@class='content']/div") == ["a"]

    def test_bare_attr_predicate(self):
        tree = build_tree('<a href="/1" download>d</a><a href="/2">n</a>')
        assert apply_xpath(tree, "//a[@download]/@href") == ["/1"]

    def test_itertext_semantics(self):
        # element result: raw text concatenated, ends stripped (lxml itertext)
        tree = build_tree("<p> Hello <b>bold</b> world </p>")
        assert apply_xpath(tree, "//p") == ["Hello bold world"]


class TestExtractData:
    def test_css_single(self):
        assert extract_data(SAMPLE_HTML, "h1") == "Article List"

    def test_css_array(self):
        got = extract_data(
            SAMPLE_HTML, "a.article-link", "href", result_type="array"
        )
        assert got == ["/article/1", "/article/2"]

    def test_xpath_single(self):
        got = extract_data(SAMPLE_HTML, "//h1", selector_type="xpath")
        assert got == "Article List"

    def test_no_match_single_vs_array(self):
        assert extract_data(SAMPLE_HTML, ".missing") is None
        assert extract_data(SAMPLE_HTML, ".missing", result_type="array") == []


def test_navigate_json_path_edges():
    assert navigate_json_path({"a": [{"b": 1}]}, "a.0.b") == 1
    assert navigate_json_path({"a": [{"b": 1}]}, "a.5.b") is None
    assert navigate_json_path({"a": 1}, "a.b") is None
    assert navigate_json_path({"a": 1}, "") == {"a": 1}


class TestSparkSurface:
    def test_struct_extraction(self, spark):
        from crawler_spark.functions.selector_udfs import extract_with_selectors

        rows = [
            (1, '<div><h1 class="t">One</h1><a class="d" href="/a.pdf">A</a>'
                '<a class="d" href="/b.pdf">B</a></div>'),
            (2, '<div><h1 class="t">Two</h1></div>'),
            (3, "<div>no title</div>"),
        ]
        df = spark.createDataFrame(rows, "id int, html string")
        selectors = {
            "title": "h1.t",
            "docs": {"selector": "a.d", "attribute": "href", "type": "array"},
            "bad": {"type": "array"},  # invalid config -> null
        }
        out = {
            r["id"]: r
            for r in extract_with_selectors(df, "html", selectors)
            .select("id", "extracted.*")
            .collect()
        }
        assert out[1]["title"] == "One" and out[1]["docs"] == ["/a.pdf", "/b.pdf"]
        assert out[2]["title"] == "Two" and out[2]["docs"] == []
        assert out[3]["title"] is None
        assert all(out[i]["bad"] is None for i in (1, 2, 3))

    def test_no_shuffle_in_plan(self, spark):
        from crawler_spark.functions.selector_udfs import extract_with_selectors

        df = spark.createDataFrame([(1, "<p>x</p>")], "id int, html string")
        plan = (
            extract_with_selectors(df, "html", {"p": "p"})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, "selector extraction must be a pure map"


class TestExtendedSyntax:
    """r02 additions beyond the reference's own usage: sibling combinators
    and positional XPath predicates (common in real-world website configs)."""

    def test_adjacent_sibling(self):
        tree = build_tree("<h2>A</h2><p>first</p><p>second</p><h2>B</h2><p>third</p>")
        assert apply_css_selector(tree, "h2 + p", select_all=True) == ["first", "third"]

    def test_general_sibling(self):
        tree = build_tree("<p>before</p><h2>A</h2><p>x</p><span></span><p>y</p>")
        assert apply_css_selector(tree, "h2 ~ p", select_all=True) == ["x", "y"]

    def test_sibling_with_classes(self):
        tree = build_tree(
            '<div><span class="label">L</span><span class="value">V</span></div>'
        )
        assert apply_css_selector(tree, ".label + .value") == ["V"]

    def test_xpath_positional_per_parent(self):
        tree = build_tree(
            "<ul><li>a1</li><li>a2</li></ul><ul><li>b1</li><li>b2</li></ul>"
        )
        # [n] is per-parent (lxml semantics), not global
        assert apply_xpath(tree, "//ul/li[2]") == ["a2", "b2"]
        assert apply_xpath(tree, "//li[1]") == ["a1", "b1"]

    def test_xpath_positional_after_attr(self):
        tree = build_tree(
            '<div><a href="/1" class="d">one</a><a href="/2">two</a>'
            '<a href="/3" class="d">three</a></div>'
        )
        # [@class='d'][2] = second among the class-matching anchors
        assert apply_xpath(tree, "//a[@class='d'][2]/@href") == ["/3"]
        # [2][@class='d'] = second anchor, kept only if it has the class
        assert apply_xpath(tree, "//a[2][@class='d']/@href") == []

    def test_xpath_positional_document_order(self):
        tree = build_tree(
            "<div><p>a</p><section><p>b1</p><p>b2</p></section><p>c</p></div>"
        )
        # first p of div = 'a'; first p of section = 'b1' -> document order
        assert apply_xpath(tree, "//p[1]") == ["a", "b1"]
