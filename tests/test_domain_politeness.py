"""Organization-level politeness: hosts sharing a registrable domain split
one budget (beyond-reference — the reference keys rate limits on raw
hostname, so subdomain mirrors multiply an organization's crawl rate)."""

from __future__ import annotations

from collections import Counter

import pytest

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, seed_urls
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine
from crawler_spark.kernels.urlnorm import registered_domain

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=4,
                  hosts_with_robots=0)
BUDGET = 4
ROUNDS = 6


def _mirrored():
    """portal0.go.id cloned under two mirror subdomains (links rewritten so
    each mirror is self-contained) — three hosts, ONE registrable domain."""
    base = build_corpus(SPEC)
    corpus = dict(base)
    for sub in ("www.portal0.go.id", "arsip.portal0.go.id"):
        for url, (st, body, ra) in base.items():
            if "portal0.go.id" in url:
                corpus[url.replace("portal0.go.id", sub)] = (
                    st, body.replace("portal0.go.id", sub), ra,
                )
    seeds = list(seed_urls(SPEC)) + [
        "https://www.portal0.go.id/putusan?page=1",
        "https://arsip.portal0.go.id/putusan?page=1",
    ]
    return corpus, {}, seeds


@pytest.fixture(scope="module")
def fixture():
    return _mirrored()


@pytest.fixture(scope="module")
def sim(fixture):
    corpus, robots, seeds = fixture
    return simulate(corpus, robots, seeds, per_host_budget=BUDGET,
                    max_rounds=ROUNDS, domain_politeness=True)


@pytest.fixture(scope="module")
def engine(spark, fixture, tmp_path_factory):
    corpus, robots, seeds = fixture
    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("dompol")), corpus,
                      robots, per_host_budget=BUDGET,
                      domain_politeness=True)
    eng.metrics_by_round = eng.run(seeds=seeds, max_rounds=ROUNDS)
    return eng


def test_registered_domain_groups_mirrors():
    assert registered_domain("www.portal0.go.id") == "portal0.go.id"
    assert registered_domain("arsip.portal0.go.id") == "portal0.go.id"
    assert registered_domain("portal1.go.id") == "portal1.go.id"


class TestEquivalence:
    def test_crawl_order_matches_simulator(self, engine, sim):
        assert engine.crawl_order() == sorted(sim.crawl_order)

    def test_seen_set_matches_simulator(self, engine, sim):
        assert engine.seen_set() == sim.seen


class TestBudgetSplit:
    def test_org_fetches_bounded_by_org_budget(self, sim):
        """3 mirrors x split budget: the portal0 org fetches at most BUDGET
        per round (portal1's seed 404s in this corpus, so the org is the
        whole observable crawl)."""
        per = Counter()
        for rnd, host, _order, _url in sim.crawl_order:
            per[(rnd, registered_domain(host))] += 1
        org_rounds = [n for (rnd, rd), n in per.items()
                      if rd == "portal0.go.id"]
        assert org_rounds, "portal0 org must be crawled"
        # live-host count varies per round (1-3 mirrors may have due rows);
        # with nh live hosts each gets max(1, BUDGET // nh), so the org
        # total never exceeds BUDGET while nh <= BUDGET
        assert max(org_rounds) <= BUDGET

    def test_plain_mode_exceeds_org_budget(self, fixture):
        """Without domain grouping the same corpus draws a full budget per
        mirror — the multiplication the feature removes."""
        corpus, robots, seeds = fixture
        plain = simulate(corpus, robots, seeds, per_host_budget=BUDGET,
                         max_rounds=ROUNDS)
        per = Counter()
        for rnd, host, _order, _url in plain.crawl_order:
            per[(rnd, registered_domain(host))] += 1
        org_rounds = [n for (rnd, rd), n in per.items()
                      if rd == "portal0.go.id"]
        assert max(org_rounds) > BUDGET
