"""Hot-host salting inside the engine (north rule: explicit skew handling in
the frontier). Salted selection relaxes within-host priority ORDER but must
preserve the politeness budget every round and the final fetched SET over a
drained crawl."""

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=4,
                  hosts_with_robots=0)
BUDGET = 3


def test_salted_engine_same_final_set_and_budget(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)

    plain = CrawlEngine(spark, str(tmp_path / "plain"), corpus, robots,
                        per_host_budget=BUDGET)
    plain.run(seeds=seeds, max_rounds=14)

    salted = CrawlEngine(spark, str(tmp_path / "salted"), corpus, robots,
                         per_host_budget=BUDGET,
                         hot_host_threshold=2, n_salts=3)  # every host is "hot"
    out = salted.run(seeds=seeds, max_rounds=14)

    # politeness: never more than the host budget in any round
    for m in out:
        assert m.get("n_selected", 0) <= BUDGET * SPEC.n_hosts

    # the drained crawl fetches the same URL set (order may differ)
    plain_set = {u for (_, _, _, u) in plain.crawl_order()}
    salted_set = {u for (_, _, _, u) in salted.crawl_order()}
    assert salted_set == plain_set
    assert salted.seen_set() == plain.seen_set()
