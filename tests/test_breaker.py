"""Per-host circuit breaker: engine == simulator under a planted 5xx storm.

Fixture: 2 hosts, one listing page with 6 details each; every detail of
host portal1 is overridden to 503. Round 1 gives portal1 six server errors
(rate 1.0 >= 0.5 over >= 5 attempts) -> tripped; its retries sit out the
3-round cooldown, re-enter (half-open), trip again, and exhaust to the DLQ —
while portal0 drains normally throughout.
"""

from __future__ import annotations

import pytest

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    detail_url,
    host_name,
    listing_html,
    listing_url,
)
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

BREAKER = (0.5, 5, 3)  # err_threshold, min_attempts, cooldown_rounds
SPEC = CorpusSpec(n_hosts=2, listing_pages=1, details_per_page=6,
                  hosts_with_robots=0)


@pytest.fixture(scope="module")
def corpus():
    c = build_corpus(SPEC)
    bad = host_name(1)
    # the sha-derived corpus plants portal1's seed listing as a 429; the
    # storm scenario needs the listing up and every detail melting down
    c[listing_url(bad, 1)] = (200, listing_html(SPEC, bad, 1), None)
    for slot in range(SPEC.details_per_page):
        c[detail_url(bad, 1, slot)] = (503, "", None)
    return c


@pytest.fixture(scope="module")
def seeds():
    return [listing_url(host_name(i), 1) for i in range(SPEC.n_hosts)]


@pytest.fixture(scope="module")
def sim(corpus, seeds):
    return simulate(corpus, {}, seeds, per_host_budget=8, max_rounds=20,
                    breaker=BREAKER)


@pytest.fixture(scope="module")
def engine(spark, corpus, seeds, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("breaker_store"))
    eng = CrawlEngine(spark, root, corpus, {}, per_host_budget=8,
                      breaker=BREAKER)
    eng.init_frontier(seeds)
    eng.metrics_by_round = eng.run(max_rounds=20)
    return eng


class TestBreakerEquivalence:
    def test_crawl_order_matches_simulator(self, engine, sim):
        assert engine.crawl_order() == sim.crawl_order

    def test_seen_set_matches_simulator(self, engine, sim):
        assert engine.seen_set() == sim.seen

    def test_dlq_matches_simulator(self, engine, sim):
        from pyspark.sql import functions as F

        got = {
            (r["url_norm"], r["attempt"])
            for r in engine.store.read(engine.spark, "dlq").collect()
        }
        assert got == set(sim.dlq)

    def test_fetch_attempts_match_simulator(self, engine, sim):
        log = engine.store.read(engine.spark, "fetch_log").collect()
        got = sorted(
            (r["fetched_round"], r["host"], r["url_norm"], r["status_code"])
            for r in log
        )
        assert got == sorted(sim.fetch_attempts)

    def test_breaker_metric_matches_sim_events(self, engine, sim):
        by_round: dict[int, int] = {}
        for rnd, _host in sim.breaker_events:
            by_round[rnd] = by_round.get(rnd, 0) + 1
        for m in engine.metrics_by_round:
            rnd = m["round"]
            assert m.get("n_breaker_hosts", 0) == by_round.get(rnd, 0), rnd


class TestBreakerBehavior:
    def test_storm_host_actually_suppressed(self, sim):
        """The breaker fired, and no fetch hit the tripped host during its
        cooldown rounds."""
        bad = host_name(1)
        trip_rounds = {rnd for rnd, h in sim.breaker_events if h == bad}
        assert trip_rounds, "storm host never tripped"
        for rnd, host, _u, _st in sim.fetch_attempts:
            assert not (host == bad and rnd in trip_rounds)

    def test_half_open_reentry_retrips(self, sim):
        """After the window slides, the host is probed again and re-trips:
        suppression rounds come in >= 2 separated blocks."""
        bad = host_name(1)
        rounds = sorted(rnd for rnd, h in sim.breaker_events if h == bad)
        gaps = [b - a for a, b in zip(rounds, rounds[1:])]
        assert any(g > 1 for g in gaps), rounds

    def test_storm_urls_reach_dlq_eventually(self, sim):
        bad = host_name(1)
        dlq_urls = {u for u, _att in sim.dlq}
        assert {
            detail_url(bad, 1, s) for s in range(SPEC.details_per_page)
        } <= dlq_urls

    def test_healthy_host_unaffected(self, corpus, seeds, sim):
        """portal0's crawl order is identical with and without the breaker."""
        base = simulate(corpus, {}, seeds, per_host_budget=8, max_rounds=20)
        h0 = host_name(0)
        assert [e for e in sim.crawl_order if e[1] == h0] == [
            e for e in base.crawl_order if e[1] == h0
        ]

    def test_breaker_defers_storm_host_vs_no_breaker(self, corpus, seeds, sim):
        """Without the breaker the storm host burns all MAX_ATTEMPTS early;
        with it, attempts stretch across cooldown windows."""
        base = simulate(corpus, {}, seeds, per_host_budget=8, max_rounds=20)
        bad = host_name(1)
        last_attempt = max(r for r, h, _u, _s in sim.fetch_attempts if h == bad)
        last_base = max(r for r, h, _u, _s in base.fetch_attempts if h == bad)
        assert last_attempt > last_base
