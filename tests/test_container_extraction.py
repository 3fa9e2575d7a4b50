"""X6 container-scoped extraction: each link's preview is its innermost
container's full text (url_extractor.py:121-236 association semantics)."""

from crawler_spark.kernels.htmlparse import extract_page


def test_link_preview_from_container():
    html = """
    <body>
      <div class="item">
        <a href="/putusan/1">Putusan Satu</a>
        <span>Pengadilan Negeri Jakarta, perkara perdata</span>
      </div>
      <div class="item">
        <a href="/putusan/2">Putusan Dua</a>
        <span>Mahkamah Agung, kasasi</span>
      </div>
    </body>"""
    links = extract_page(html)["links"]
    assert links[0][0] == "/putusan/1"
    assert "Pengadilan Negeri Jakarta" in links[0][2]
    assert links[1][0] == "/putusan/2"
    assert "Mahkamah Agung" in links[1][2]
    # previews are scoped: item 1's metadata never leaks into item 2's
    assert "Mahkamah" not in links[0][2]
    assert "Jakarta" not in links[1][2]


def test_nested_container_uses_innermost_but_full_subtree():
    html = """
    <body><div class="outer">Outer label
      <div class="inner"><a href="/x">X</a> inner detail
        <ul><li>sub item</li></ul>
      </div>
    </div></body>"""
    links = extract_page(html)["links"]
    preview = links[0][2]
    assert "inner detail" in preview
    assert "sub item" in preview  # nested subtree text bubbles up
    assert "Outer label" not in preview  # innermost container wins


def test_containerless_link_has_no_preview():
    links = extract_page('<body><p><a href="/y">Y</a></p></body>')["links"]
    assert links[0][2] is None


def test_document_wide_fallback_order_preserved():
    html = '<body><div><a href="/a">A</a></div><a href="/b">B</a></body>'
    links = extract_page(html)["links"]
    assert [l[0] for l in links] == ["/a", "/b"]
    assert [l[3] for l in links] == [0, 1]


def test_data_attribute_urls_extracted():
    """X7: data-url/data-href/data-link on non-anchor elements are frontier
    candidates, with container-scoped previews like regular anchors."""
    html = """
    <body>
      <div class="card" data-url="/putusan/77">Kartu putusan tujuh puluh tujuh</div>
      <tr data-href="/putusan/78"><td>Baris 78</td></tr>
      <span data-link="/putusan/79">span 79</span>
      <div data-url="">empty ignored</div>
    </body>"""
    links = extract_page(html)["links"]
    hrefs = [l[0] for l in links]
    assert hrefs == ["/putusan/77", "/putusan/78", "/putusan/79"]
    # the div's own subtree text is the preview
    assert "tujuh puluh tujuh" in links[0][2]
    assert links[1][2] is not None and "Baris 78" in links[1][2]


def test_data_url_ordering_with_anchors():
    html = '<body><div data-url="/x">X</div><a href="/y">Y</a></body>'
    links = extract_page(html)["links"]
    # data-url links record at element START, anchors at END — both present
    assert {l[0] for l in links} == {"/x", "/y"}


def test_unclosed_nested_containers_bubble_text_to_parent():
    # ADVICE r01: the end-of-parse drain for unclosed containers did not
    # bubble inner text into the still-open parent, so on malformed HTML the
    # outer container's link preview lost all inner-subtree text.
    html = (
        '<div><a href="/doc">Doc</a> outer text'
        "<div>inner deep text"  # unclosed inner div
        # unclosed outer div, document just ends
    )
    links = extract_page(html)["links"]
    assert links[0][0] == "/doc"
    preview = links[0][2]
    assert "outer text" in preview
    assert "inner deep text" in preview, "inner subtree text must bubble up"
