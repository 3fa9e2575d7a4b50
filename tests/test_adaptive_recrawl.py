"""Adaptive re-crawl cadence (engine): change-rate-driven deferral on top of
conditional re-crawl.

A standing change_stats table accumulates (obs, changed) per re-fetch; a
re-discovered candidate is dropped at extraction until its integer interval
min(adaptive_ttl, max(1, (2n+1) div (2X+1))) has elapsed since its last
observation. Static pages back off toward adaptive_ttl; churning pages keep
the ttl cadence. Gated engine==simulator (order, seen window, deferral
counts, final stats) on both a static corpus and a churning one.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.corpus import (
    CorpusSpec, build_corpus, detail_url, robots_map, seed_urls,
)
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=3,
                  hosts_with_robots=0)
TTL = 2
ADAPT = 6
ROUNDS = 14


@pytest.fixture(scope="module")
def fixture():
    return build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)


@pytest.fixture(scope="module")
def sim(fixture):
    corpus, robots, seeds = fixture
    return simulate(corpus, robots, seeds, per_host_budget=3,
                    max_rounds=ROUNDS, ttl_rounds=TTL,
                    conditional_recrawl=True, adaptive_ttl=ADAPT)


@pytest.fixture(scope="module")
def engine(spark, fixture, tmp_path_factory):
    corpus, robots, seeds = fixture
    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("adapt")), corpus,
                      robots, per_host_budget=3, ttl_rounds=TTL,
                      conditional_recrawl=True, adaptive_ttl=ADAPT)
    eng.metrics_by_round = eng.run(seeds=seeds, max_rounds=ROUNDS)
    return eng


def test_requires_conditional(spark, tmp_path):
    with pytest.raises(ValueError, match="conditional_recrawl"):
        CrawlEngine(spark, str(tmp_path), {}, {}, ttl_rounds=2,
                    adaptive_ttl=4)
    with pytest.raises(ValueError, match="conditional_recrawl"):
        simulate({}, {}, [], ttl_rounds=2, adaptive_ttl=4)
    with pytest.raises(ValueError, match=">= 1"):
        CrawlEngine(spark, str(tmp_path), {}, {}, ttl_rounds=2,
                    conditional_recrawl=True, adaptive_ttl=0)


class TestStaticEquivalence:
    def test_crawl_order_matches_simulator(self, engine, sim):
        assert engine.crawl_order() == sorted(sim.crawl_order)

    def test_deferral_metric_matches_simulator(self, engine, sim):
        by_round = Counter(rnd for rnd, _h in sim.adaptive_deferrals)
        saw = 0
        for m in engine.metrics_by_round:
            if "n_adaptive_deferred" in m:
                assert m["n_adaptive_deferred"] == by_round.get(m["round"], 0), m
                saw += m["n_adaptive_deferred"]
        assert saw == len(sim.adaptive_deferrals)
        assert saw > 0, "fixture must actually defer some candidates"

    def test_change_stats_table_matches_simulator(self, engine, sim):
        cs = engine.store.read(engine.spark, "change_stats")
        assert cs is not None
        got = {
            r["url_hash"]: (r["n"], r["x"], r["last"])
            for r in cs.groupBy("url_hash").agg(
                F.sum("obs").alias("n"), F.sum("changed").alias("x"),
                F.max("round").alias("last"),
            ).collect()
        }
        assert got == sim.change_stats

    def test_seen_table_matches_simulator_active_window(self, engine, sim):
        rows = (
            engine.store.read(engine.spark, "seen")
            .select("url_hash", "seen_round").collect()
        )
        got = {(r["url_hash"], r["seen_round"]) for r in rows}
        cutoff = (sim.rounds - 1) - TTL
        want = {(h, r) for h, r in sim.seen_rounds.items() if r >= cutoff}
        assert got == want

    def test_chain_stays_bounded(self, engine):
        assert (
            engine.store.chain_length("change_stats")
            <= CrawlEngine.REBUILD_EVERY
        )


class TestAdaptiveEconomy:
    def test_static_pages_fetched_less_than_fixed_cadence(self, fixture, sim):
        """Same corpus, same rounds, conditional-only vs adaptive: the
        static corpus means every revisit observes 'unchanged', so intervals
        grow (3, 5, 7... rounds) and total fetch volume drops below the
        fixed-TTL cadence."""
        corpus, robots, seeds = fixture
        fixed = simulate(corpus, robots, seeds, per_host_budget=3,
                         max_rounds=ROUNDS, ttl_rounds=TTL,
                         conditional_recrawl=True)
        assert len(sim.crawl_order) < len(fixed.crawl_order)
        # and the deferred URLs are exactly why: every deferral names a URL
        # the fixed run re-fetched at least once more
        assert sim.adaptive_deferrals

    def test_intervals_grow_for_static_urls(self, sim):
        """For URLs fetched 3+ times, successive fetch gaps must be
        non-decreasing (X=0 backoff: interval 2n+1 grows with each obs)."""
        rounds_by_url: dict[str, list[int]] = {}
        for rnd, _host, _order, url in sorted(sim.crawl_order):
            rounds_by_url.setdefault(url, []).append(rnd)
        multi = {u: rs for u, rs in rounds_by_url.items() if len(rs) >= 3}
        assert multi, "need URLs with 3+ fetches to observe backoff"
        for u, rs in multi.items():
            gaps = [b - a for a, b in zip(rs, rs[1:])]
            assert all(g2 >= g1 for g1, g2 in zip(gaps, gaps[1:])), (u, rs)


class TestChurnEquivalence:
    """Corpus churn at a round boundary: the engine (driven one round at a
    time with the corpus mutated between runs) must stay bit-identical to
    the simulator given the same corpus_updates schedule — and changed
    pages must come back on a SHORTER cadence than static ones."""

    CHURN_ROUND = 6

    @pytest.fixture(scope="class")
    def churn(self, fixture):
        corpus, robots, seeds = fixture
        h0 = "portal0.go.id"
        upd = {}
        for page in range(1, SPEC.listing_pages + 1):
            for slot in range(SPEC.details_per_page):
                u = detail_url(h0, page, slot)
                st, body, ra = corpus[u]
                if st == 200:
                    upd[u] = (st, body.replace(
                        "</body>", "<p>revisi baru</p></body>"), ra)
        assert upd
        return {self.CHURN_ROUND: upd}

    @pytest.fixture(scope="class")
    def churn_sim(self, fixture, churn):
        corpus, robots, seeds = fixture
        return simulate(corpus, robots, seeds, per_host_budget=3,
                        max_rounds=ROUNDS, ttl_rounds=TTL,
                        conditional_recrawl=True, adaptive_ttl=ADAPT,
                        corpus_updates=churn)

    @pytest.fixture(scope="class")
    def churn_engine(self, spark, fixture, churn, tmp_path_factory):
        corpus, robots, seeds = fixture
        eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("churn")),
                          dict(corpus), robots, per_host_budget=3,
                          ttl_rounds=TTL, conditional_recrawl=True,
                          adaptive_ttl=ADAPT)
        metrics = []
        for rnd in range(ROUNDS):
            if rnd in churn:
                eng.corpus.update(churn[rnd])
            out = eng.run(seeds=seeds if rnd == 0 else None, max_rounds=1)
            metrics.extend(out)
            if out and out[-1].get("done"):
                break
        eng.metrics_by_round = metrics
        return eng

    def test_crawl_order_matches_simulator(self, churn_engine, churn_sim):
        assert churn_engine.crawl_order() == sorted(churn_sim.crawl_order)

    def test_changed_observations_recorded(self, churn_engine, churn_sim):
        cs = churn_engine.store.read(churn_engine.spark, "change_stats")
        got = {
            r["url_hash"]: (r["n"], r["x"], r["last"])
            for r in cs.groupBy("url_hash").agg(
                F.sum("obs").alias("n"), F.sum("changed").alias("x"),
                F.max("round").alias("last"),
            ).collect()
        }
        assert got == churn_sim.change_stats
        assert any(x > 0 for _n, x, _l in got.values()), (
            "churn must produce changed observations"
        )

    def test_deferral_metric_matches_simulator(self, churn_engine, churn_sim):
        by_round = Counter(rnd for rnd, _h in churn_sim.adaptive_deferrals)
        for m in churn_engine.metrics_by_round:
            if "n_adaptive_deferred" in m:
                assert m["n_adaptive_deferred"] == by_round.get(m["round"], 0), m
