"""Sitemap ingestion through the engine: enqueue semantics + priority order.

enqueue_sitemaps parses sitemap documents distributed, enqueues page
entries with the protocol priority mapped onto the S1 scale, returns
sitemapindex children for caller-side recirculation, and inherits the
enqueue==seen invariant (replay = no-op).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    detail_html,
    detail_url,
    host_name,
)
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=1, listing_pages=1, details_per_page=4,
                  hosts_with_robots=0)
HOST = host_name(0)


def _urlset(entries: list[tuple[str, float]]) -> str:
    body = "".join(
        f"<url><loc>{u}</loc><priority>{p}</priority></url>" for u, p in entries
    )
    return (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + body + "</urlset>"
    )


def _index(children: list[str]) -> str:
    body = "".join(f"<sitemap><loc>{c}</loc></sitemap>" for c in children)
    return f"<sitemapindex>{body}</sitemapindex>"


@pytest.fixture()
def corpus():
    c = build_corpus(SPEC)
    # deterministic 200s for the four details the sitemap advertises
    for slot in range(SPEC.details_per_page):
        u = detail_url(HOST, 1, slot)
        c[u] = (200, detail_html(HOST, 1, slot), None)
    return c


def test_sitemap_enqueue_priority_drives_crawl_order(spark, corpus, tmp_path):
    """Protocol priority 1.0 -> S1 priority 10 -> fetched before 0.1 -> 1,
    within one host and round (the politeness budget covers all four)."""
    eng = CrawlEngine(spark, str(tmp_path / "s1"), corpus, {},
                      per_host_budget=8)
    urls = [detail_url(HOST, 1, s) for s in range(4)]
    xml = _urlset([(urls[0], 0.1), (urls[1], 1.0), (urls[2], 0.5),
                   (urls[3], 0.9)])
    docs = spark.createDataFrame([(xml,)], "xml string")
    metrics, children = eng.enqueue_sitemaps(docs)
    assert metrics["n_enqueued"] == 4
    assert metrics["n_sitemap_children"] == 0
    assert children.count() == 0
    eng.run(max_rounds=6)
    order = [u for _r, _h, _o, u in eng.crawl_order()]
    pos = {u: i for i, u in enumerate(order)}
    # S1: protocol 1.0 (S1 prio 10) first, then 0.9 (9), 0.5 (5), 0.1 (1)
    assert pos[urls[1]] < pos[urls[3]] < pos[urls[2]] < pos[urls[0]]


def test_sitemap_replay_is_noop_and_children_recirculate(spark, corpus, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "s2"), corpus, {},
                      per_host_budget=8)
    urls = [detail_url(HOST, 1, s) for s in range(2)]
    child_url = f"https://{HOST}/sitemap-part-0.xml"
    idx_docs = spark.createDataFrame([(_index([child_url]),)], "xml string")
    m1, children = eng.enqueue_sitemaps(idx_docs)
    # an index document enqueues no pages, only returns its children
    assert m1["n_enqueued"] == 0
    assert m1["n_sitemap_children"] == 1
    got = children.collect()
    assert [(r["sitemap_url"], r["lastmod"]) for r in got] == [(child_url, None)]
    # caller fetches the child (here: synthesizes its content) and feeds it
    # back — one level per call
    child_docs = spark.createDataFrame(
        [(_urlset([(urls[0], 0.8), (urls[1], 0.2)]),)], "xml string"
    )
    m2, _ = eng.enqueue_sitemaps(child_docs)
    assert m2["n_enqueued"] == 2
    # replay of the SAME child sitemap: enqueue==seen drops everything
    m3, _ = eng.enqueue_sitemaps(child_docs)
    assert m3["n_enqueued"] == 0


def test_streaming_sitemap_crawl_equals_batch(spark, corpus, tmp_path):
    """Sitemap docs split across micro-batches + an index child resolved
    through the fetch callable: the drained result equals one batch crawl
    of the same advertised URLs, and a checkpointed replay is a no-op."""
    import json

    from crawler_spark.streaming.crawl_stream import run_streaming_sitemap_crawl

    urls = [detail_url(HOST, 1, s) for s in range(2)]
    # the child sitemap advertises pages UNREACHABLE by link extraction
    # (nothing links /putusan/extra/*), so its enqueue cannot be deduped by
    # earlier crawl rounds — sitemap discovery is their only path in
    extras = [f"https://{HOST}/putusan/extra/{i}" for i in range(2)]
    for u in extras:
        corpus[u] = (200, detail_html(HOST, 1, 0), None)
    child_url = f"https://{HOST}/sitemap-child.xml"
    child_xml = _urlset([(extras[0], 0.6), (extras[1], 0.4)])
    smdir = tmp_path / "smq"
    smdir.mkdir()
    (smdir / "a.json").write_text(
        json.dumps({"xml": _urlset([(urls[0], 0.9), (urls[1], 0.3)])}) + "\n"
    )
    (smdir / "b.json").write_text(
        json.dumps({"xml": _index([child_url])}) + "\n"
    )
    eng = CrawlEngine(spark, str(tmp_path / "s4"), corpus, {},
                      per_host_budget=8)
    log = run_streaming_sitemap_crawl(
        spark, eng, str(smdir), str(tmp_path / "ckpt"),
        fetch_sitemap={child_url: child_xml}.get,
    )
    assert len(log) == 2  # one micro-batch per file
    assert sum(b["n_enqueued"] for b in log) == 4
    assert sum(b["n_sitemap_children"] for b in log) == 1
    crawled = {u for _r, _h, _o, u in eng.crawl_order()}
    # every advertised URL fetched (plus anything link-discovered from them)
    assert set(urls) | set(extras) <= crawled
    # replay with the SAME checkpoint: no new files -> no new batches
    log2 = run_streaming_sitemap_crawl(
        spark, eng, str(smdir), str(tmp_path / "ckpt"),
        fetch_sitemap={child_url: child_xml}.get,
    )
    assert log2 == []


def test_duplicate_entries_keep_max_priority(spark, corpus, tmp_path):
    """One URL advertised twice (0.9 and 0.2): the enqueue keeps the most
    important mapping (S1 9, not 2) deterministically."""
    eng = CrawlEngine(spark, str(tmp_path / "s3"), corpus, {},
                      per_host_budget=8)
    u = detail_url(HOST, 1, 0)
    docs = spark.createDataFrame(
        [(_urlset([(u, 0.9), (u, 0.2)]),)], "xml string"
    )
    m, _ = eng.enqueue_sitemaps(docs)
    assert m["n_enqueued"] == 1
    row = (
        eng.store.read(spark, "frontier")
        .filter(F.col("url_norm") == u)
        .select("priority")
        .collect()
    )
    assert [r["priority"] for r in row] == [9]


def test_discover_sitemaps_from_robots(spark, corpus, tmp_path):
    """Discovery half of the loop: robots Sitemap lines surface per host;
    hosts without declarations are absent."""
    robots = {
        HOST: ("User-agent: *\nDisallow: /private/\n"
               f"Sitemap: https://{HOST}/sitemap.xml\n"
               f"sitemap: https://{HOST}/sitemap-2.xml\n"),
        "other.go.id": "User-agent: *\nDisallow: /\n",
    }
    eng = CrawlEngine(spark, str(tmp_path / "disc"), corpus, robots,
                      per_host_budget=8)
    assert eng.discover_sitemaps() == {
        HOST: [f"https://{HOST}/sitemap.xml", f"https://{HOST}/sitemap-2.xml"]
    }
