"""S8 cancellation: the flag stops the loop between rounds, committed state
stays intact, clearing the flag resumes to the same final result."""

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=2, details_per_page=2, hosts_with_robots=0)


def test_cancel_stops_between_rounds_and_resume_completes(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)

    ref = CrawlEngine(spark, str(tmp_path / "ref"), corpus, robots, per_host_budget=3)
    ref.run(seeds=seeds, max_rounds=10)

    eng = CrawlEngine(spark, str(tmp_path / "c"), corpus, robots, per_host_budget=3)
    eng.run(seeds=seeds, max_rounds=1)
    eng.request_cancel()
    out = eng.run(max_rounds=10)
    assert out == [{"round": 1, "cancelled": True}]
    assert eng.store.latest_round() == 0  # nothing ran while cancelled

    eng.clear_cancel()
    eng.run(max_rounds=10)
    assert eng.crawl_order() == ref.crawl_order()
    assert eng.seen_set() == ref.seen_set()
