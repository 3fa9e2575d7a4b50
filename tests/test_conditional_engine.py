"""Conditional re-crawl (ETag/304) on the TTL path: equivalence + economy.

The corpus is static, so with conditional_recrawl=True EVERY TTL re-crawl
is a 304: it stays in crawl order and the fetch_log, but skips parse, link
re-extraction, and the page MERGE — the stored page row keeps its ORIGINAL
fetched_round (write amplification follows the change rate: zero here).
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=3,
                  hosts_with_robots=0)
TTL = 2
ROUNDS = 10


@pytest.fixture(scope="module")
def fixture():
    return build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)


@pytest.fixture(scope="module")
def sim(fixture):
    corpus, robots, seeds = fixture
    return simulate(corpus, robots, seeds, per_host_budget=3,
                    max_rounds=ROUNDS, ttl_rounds=TTL,
                    conditional_recrawl=True)


@pytest.fixture(scope="module")
def engine(spark, fixture, tmp_path_factory):
    corpus, robots, seeds = fixture
    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("cond")), corpus,
                      robots, per_host_budget=3, ttl_rounds=TTL,
                      conditional_recrawl=True)
    eng.metrics_by_round = eng.run(seeds=seeds, max_rounds=ROUNDS)
    return eng


class TestConditionalEquivalence:
    def test_crawl_order_matches_simulator(self, engine, sim):
        assert engine.crawl_order() == sorted(sim.crawl_order)

    def test_seen_table_matches_simulator_active_window(self, engine, sim):
        """Under TTL the engine's seen table is compacted to the active
        window at the last table-writing round; sim.seen is cumulative, so
        compare (hash, seen_round) pairs against the windowed dict."""
        rows = (
            engine.store.read(engine.spark, "seen")
            .select("url_hash", "seen_round")
            .collect()
        )
        got = {(r["url_hash"], r["seen_round"]) for r in rows}
        cutoff = (sim.rounds - 1) - TTL
        want = {
            (h, r) for h, r in sim.seen_rounds.items() if r >= cutoff
        }
        assert got == want
        # and cumulative membership still agrees with everything the engine
        # ever enqueued (engine seen ⊆ sim ever-seen)
        assert {h for h, _r in got} <= sim.seen

    def test_not_modified_metric_matches_simulator(self, engine, sim):
        by_round = Counter(rnd for rnd, _u in sim.not_modified)
        for m in engine.metrics_by_round:
            if "n_not_modified" in m:
                assert m["n_not_modified"] == by_round.get(m["round"], 0), m


class TestConditionalEconomy:
    def test_conditional_preserves_crawl_dynamics_exactly(self, fixture, sim):
        """The 304 path recirculates the STORED link set, so conditional
        mode changes NOTHING about what gets crawled when — only what gets
        parsed and written. (Without stored-link recirculation, a 304'd hub
        page would stop re-enqueueing its outlinks and TTL re-discovery
        would starve — found by review.)"""
        corpus, robots, seeds = fixture
        base = simulate(corpus, robots, seeds, per_host_budget=3,
                        max_rounds=ROUNDS, ttl_rounds=TTL)
        assert sim.crawl_order == base.crawl_order
        assert sim.seen == base.seen

    def test_recrawls_happen_and_are_all_304(self, sim):
        """Static corpus: every repeat fetch of a URL is a 304."""
        counts = Counter(u for *_, u in sim.crawl_order)
        recrawled = {u for u, n in counts.items() if n > 1}
        assert recrawled, "fixture must produce TTL re-crawls"
        assert recrawled == {u for _r, u in sim.not_modified}

    def test_page_rows_keep_original_fetched_round(self, engine, sim):
        """The 304 skipped the merge: the stored row's fetched_round is the
        FIRST crawl, strictly older than the last fetch in the log."""
        counts = Counter(u for *_, u in sim.crawl_order)
        url = sorted(u for u, n in counts.items() if n > 1)[0]
        first = min(r for r, _h, _o, u in sim.crawl_order if u == url)
        last = max(r for r, _h, _o, u in sim.crawl_order if u == url)
        assert last > first
        row = (
            engine.store.read(engine.spark, "pages")
            .filter(F.col("url_norm") == url)
            .select("fetched_round")
            .collect()
        )
        assert [r["fetched_round"] for r in row] == [first]

    def test_fetch_log_still_records_every_attempt(self, engine, sim):
        """304s are real fetches: the append-only log and the crawl-order
        invariant are untouched by the parse/merge skip."""
        counts = Counter(u for *_, u in sim.crawl_order)
        url = sorted(u for u, n in counts.items() if n > 1)[0]
        log = engine.store.read(engine.spark, "fetch_log")
        assert log.filter(
            (F.col("url_norm") == url) & (F.col("status_code") == 200)
        ).count() == counts[url]

    def test_unconditional_run_rewrites_pages(self, spark, fixture, tmp_path):
        """Control: without the flag the same crawl bumps fetched_round —
        the economy claim is the DIFFERENCE."""
        corpus, robots, seeds = fixture
        eng = CrawlEngine(spark, str(tmp_path / "uncond"), corpus, robots,
                          per_host_budget=3, ttl_rounds=TTL)
        eng.run(seeds=seeds, max_rounds=ROUNDS)
        order = eng.crawl_order()
        counts = Counter(u for *_, u in order)
        url = sorted(u for u, n in counts.items() if n > 1)[0]
        last = max(r for r, _h, _o, u in order if u == url)
        row = (
            eng.store.read(spark, "pages")
            .filter(F.col("url_norm") == url)
            .select("fetched_round")
            .collect()
        )
        assert [r["fetched_round"] for r in row] == [last]
