"""Website-config selector extraction wired into the crawl engine: every
fetched detail page runs its host's {field: selector} map (the reference's
core config surface) into pages.extracted_json."""

import json

from crawler_spark.engine.corpus import (
    CorpusSpec, build_corpus, robots_map, seed_urls, website_configs,
)
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=2, details_per_page=3,
                  hosts_with_robots=0)


def test_engine_extracts_configured_fields(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    eng = CrawlEngine(
        spark, str(tmp_path / "sel"), corpus, robots, per_host_budget=4,
        selector_configs=website_configs(SPEC),
    )
    eng.run(seeds=seeds, max_rounds=6)

    pages = eng.store.read(spark, "pages")
    details = pages.filter(pages.url_norm.contains("/detail/")).collect()
    assert details, "fixture must crawl detail pages"
    for row in details:
        got = json.loads(row["extracted_json"])
        det = row["url_norm"].rsplit("/", 1)[1]
        # planted duplicates render their twin's content (corpus semantics)
        eff = int(det) - 1 if int(det) % 7 == 3 else int(det)
        assert got["title"] == f"Putusan Nomor {eff}"
        assert got["documents"] == [f"/files/{eff}.pdf"]
        assert isinstance(got["body"], list) and len(got["body"]) == 2
    # listing pages have no h1 / download links: per-field None / []
    listings = pages.filter(pages.url_norm.contains("?page=")).collect()
    for row in listings:
        got = json.loads(row["extracted_json"])
        assert got["title"] is None and got["documents"] == []
