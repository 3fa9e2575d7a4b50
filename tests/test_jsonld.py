"""JSON-LD structured-data extraction: flatten contract (kernels/jsonld.py),
hostile-input bounds, and the engine wiring into pages.jsonld_json."""

import json

import pytest

from crawler_spark.kernels.jsonld import (
    MAX_BLOCK_BYTES,
    MAX_DEPTH,
    MAX_ROWS_PER_PAGE,
    flatten_jsonld,
)


def test_flatten_contract():
    html = (
        '<html><head><script type="application/ld+json">'
        '{"@context":"https://schema.org","@type":"LegalDocument",'
        '"name":"Doc 5","identifier":5,'
        '"author":{"@type":"Organization","name":"Portal 3"},'
        '"keywords":["k1","k2"]}</script>'
        '<script type=" application/LD+JSON ">'
        '{"@graph":[{"@type":"WebPage","url":"https://x/5"},'
        '{"@type":["A","B"],"n":4,"flag":true,"none":null}]}</script>'
        "</head></html>"
    )
    rows = flatten_jsonld(html)
    assert (0, 0, "LegalDocument", "name", 0, "Doc 5") in rows
    assert (0, 0, "LegalDocument", "identifier", 0, "5") in rows       # int -> str
    assert (0, 0, "LegalDocument", "author.@type", 0, "Organization") in rows
    assert (0, 0, "LegalDocument", "author.name", 0, "Portal 3") in rows
    assert (0, 0, "LegalDocument", "keywords", 1, "k2") in rows        # list idx
    assert (1, 0, "WebPage", "url", 0, "https://x/5") in rows          # @graph
    assert (1, 1, "A|B", "flag", 0, "true") in rows                    # bool canon
    assert (1, 1, "A|B", "none", 0, None) in rows                      # null canon
    # @type consumed as item_type, never emitted as a field at item level
    assert not any(r[3] == "@type" for r in rows)


def test_broken_block_skipped_without_shifting_indices():
    """An invalid block consumes its block index but yields no rows — an ad
    injecting broken JSON must not shift later blocks' identity."""
    html = (
        '<script type="application/ld+json">{broken</script>'
        '<script type="application/ld+json">{"@type":"A","x":1}</script>'
    )
    assert flatten_jsonld(html) == [(1, 0, "A", "x", 0, "1")]


def test_top_level_list_and_nonstruct_items():
    rows = flatten_jsonld(
        '<script type="application/ld+json">'
        '[{"@type":"A","x":1},"stray",{"@type":"B","y":2}]</script>'
    )
    assert rows == [(0, 0, "A", "x", 0, "1"), (0, 2, "B", "y", 0, "2")]


def test_list_of_dicts_indexed_paths():
    rows = flatten_jsonld(
        '<script type="application/ld+json">'
        '{"@type":"ItemList","itemListElement":['
        '{"@type":"ListItem","position":1},'
        '{"@type":"ListItem","position":2}]}</script>'
    )
    assert (0, 0, "ItemList", "itemListElement[0].position", 0, "1") in rows
    assert (0, 0, "ItemList", "itemListElement[1].@type", 0, "ListItem") in rows


def test_bounds_oversized_block_and_depth_and_rowcap():
    big = '<script type="application/ld+json">{"@type":"A","x":"' \
          + "y" * (MAX_BLOCK_BYTES + 10) + '"}</script>'
    assert flatten_jsonld(big) == []
    # depth bomb: nesting beyond MAX_DEPTH is silently truncated, not fatal
    deep = '{"@type":"A"' + ',"n":{' * 20 + '"x":1' + "}" * 20 + "}"
    rows = flatten_jsonld(f'<script type="application/ld+json">{deep}</script>')
    assert all(r[3].count(".") < MAX_DEPTH for r in rows)
    # row-count bomb: a huge scalar array truncates at the cap
    wide = '{"@type":"A","k":[' + ",".join("1" for _ in range(MAX_ROWS_PER_PAGE + 500)) + "]}"
    rows = flatten_jsonld(f'<script type="application/ld+json">{wide}</script>')
    assert len(rows) == MAX_ROWS_PER_PAGE


def test_non_ld_scripts_ignored():
    assert flatten_jsonld(
        '<script>var x = {"@type":"A"};</script>'
        '<script type="text/javascript">{"@type":"B"}</script>'
        "<p>no ld here</p>"
    ) == []


def test_engine_jsonld_column(spark, tmp_path):
    """jsonld_extract=True adds pages.jsonld_json alongside extracted_json:
    detail pages carrying a schema.org block get its flatten; pages without
    ld+json get NULL."""
    from crawler_spark.engine.corpus import (
        CorpusSpec, build_corpus, robots_map, seed_urls,
    )
    from crawler_spark.engine.superstep import CrawlEngine

    spec = CorpusSpec(n_hosts=2, listing_pages=2, details_per_page=3,
                      hosts_with_robots=0)
    corpus = build_corpus(spec)
    ld_corpus = {}
    for url, (status, content, ra) in corpus.items():
        if "/detail/" in url and content:
            det = url.rsplit("/", 1)[1]
            block = (
                '<script type="application/ld+json">'
                '{"@type":"LegalDocument","identifier":' + det + ","
                '"name":"Putusan ' + det + '"}</script>'
            )
            content = content.replace("</head>", block + "</head>", 1)
        ld_corpus[url] = (status, content, ra)

    eng = CrawlEngine(
        spark, str(tmp_path / "ld"), ld_corpus, robots_map(spec),
        per_host_budget=4, jsonld_extract=True,
    )
    eng.run(seeds=seed_urls(spec), max_rounds=6)
    pages = eng.store.read(spark, "pages")
    assert "jsonld_json" in pages.columns
    details = pages.filter(pages.url_norm.contains("/detail/")).collect()
    assert details
    for row in details:
        got = json.loads(row["jsonld_json"])
        expect = [
            list(t) for t in flatten_jsonld(row["raw_html"])
        ]
        assert [[r["block_idx"], r["item_idx"], r["item_type"], r["field"],
                 r["idx"], r["value"]] for r in got] == expect
    listings = pages.filter(pages.url_norm.contains("?page=")).collect()
    assert listings and all(r["jsonld_json"] is None for r in listings)
