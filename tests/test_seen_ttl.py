"""TTL'd (windowed) URL-seen membership — the reference's 24h Redis TTL in
round units: expired URLs become crawlable again via re-discovery cycles,
and the distributed engine still matches the simulator exactly."""

from collections import Counter

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=3, hosts_with_robots=0)
TTL = 2
ROUNDS = 10


def test_ttl_recrawl_matches_simulator(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)

    sim = simulate(corpus, robots, seeds, per_host_budget=3,
                   max_rounds=ROUNDS, ttl_rounds=TTL)
    eng = CrawlEngine(spark, str(tmp_path / "ttl"), corpus, robots,
                      per_host_budget=3, ttl_rounds=TTL)
    eng.run(seeds=seeds, max_rounds=ROUNDS)

    assert eng.crawl_order() == sorted(sim.crawl_order)

    # TTL must actually matter: some URL crawled more than once via the
    # prev-link cycle after its seen entry expired
    recrawled = [u for u, n in Counter(u for *_, u in sim.crawl_order).items() if n > 1]
    assert recrawled, "fixture must produce at least one TTL re-crawl"

    # seen table stays bounded to the window (compaction)
    seen = eng.store.read(spark, "seen")
    max_round = max(r for r, *_ in eng.crawl_order())
    assert seen.filter(f"seen_round < {max_round - TTL}").count() == 0


def test_no_ttl_never_recrawls(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    sim = simulate(corpus, robots, seeds, per_host_budget=3, max_rounds=ROUNDS)
    counts = Counter(u for *_, u in sim.crawl_order)
    assert counts and all(n == 1 for n in counts.values())


def test_ttl_recrawl_replaces_page_row_not_duplicates(spark, tmp_path):
    """Q1 latest-crawl-wins MERGE: a TTL-expired URL that is re-crawled must
    REPLACE its page row (ON CONFLICT DO UPDATE, crawled_page.sql:1-37);
    every fetch still appears in the append-only fetch_log."""
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    eng = CrawlEngine(spark, str(tmp_path / "q1"), corpus, robots,
                      per_host_budget=3, ttl_rounds=TTL)
    eng.run(seeds=seeds, max_rounds=ROUNDS)

    order = eng.crawl_order()
    recrawled = [u for u, n in Counter(u for *_, u in order).items() if n > 1]
    assert recrawled, "fixture must produce at least one TTL re-crawl"

    pages = eng.store.read(spark, "pages")
    # one row per (host, url_hash) despite multiple crawls
    dup_keys = (
        pages.groupBy("host", "url_hash").count().filter("count > 1").count()
    )
    assert dup_keys == 0, "pages table must be latest-wins merged"
    # the surviving row is the LATEST crawl
    url = recrawled[0]
    last_round = max(r for r, _, _, u in order if u == url)
    row = pages.filter(pages.url_norm == url).collect()
    assert len(row) == 1 and row[0]["fetched_round"] == last_round
    # fetch_log keeps every attempt
    log = eng.store.read(spark, "fetch_log")
    assert log.filter(log.url_norm == url).count() >= 2
