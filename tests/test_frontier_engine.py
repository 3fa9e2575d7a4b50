"""Engine-level gates (north rule): scheduler equivalence vs the pure-Python
simulator (crawl order == and URL-seen set ==), robots exclusion, duplicate
suppression, retry/DLQ routing, and resume-from-checkpoint identity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    robots_map,
    seed_urls,
)
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=4, listing_pages=4, details_per_page=5, hosts_with_robots=2)
BUDGET = 6
MAX_ROUNDS = 14


@pytest.fixture(scope="module")
def corpus():
    return build_corpus(SPEC)


@pytest.fixture(scope="module")
def robots():
    return robots_map(SPEC)


@pytest.fixture(scope="module")
def sim(corpus, robots):
    return simulate(corpus, robots, seed_urls(SPEC), per_host_budget=BUDGET,
                    max_rounds=MAX_ROUNDS)


@pytest.fixture(scope="module")
def engine(spark, corpus, robots, tmp_path_factory):
    eng = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("store")), corpus, robots,
        per_host_budget=BUDGET,
    )
    eng.run(seeds=seed_urls(SPEC), max_rounds=MAX_ROUNDS)
    return eng


class TestSchedulerEquivalence:
    def test_crawl_order_matches_simulator(self, engine, sim):
        assert engine.crawl_order() == sorted(sim.crawl_order)

    def test_seen_set_matches_simulator(self, engine, sim):
        assert engine.seen_set() == sim.seen

    def test_dlq_matches_simulator(self, engine, sim):
        dlq = engine.store.read(engine.spark, "dlq")
        got = sorted((r.url_norm, r.attempt) for r in dlq.collect())
        assert got == sorted(sim.dlq)

    def test_simulator_covered_everything(self, sim):
        # sanity on the fixture: pages were crawled, failures happened,
        # robots excluded something — the gates above aren't vacuous
        assert len(sim.crawl_order) > 20
        assert len(sim.robots_excluded) > 0
        assert len(sim.seen) > len(sim.crawl_order)


class TestEngineInvariants:
    def test_robots_never_fetched(self, engine, sim):
        fetched = {u for (_, _, _, u) in engine.crawl_order()}
        for u in sim.robots_excluded:
            assert u not in fetched

    def test_no_url_fetched_twice(self, engine):
        order = engine.crawl_order()
        urls = [u for (_, _, _, u) in order]
        assert len(urls) == len(set(urls))

    def test_pages_have_spans_and_hashes(self, engine):
        pages = engine.store.read(engine.spark, "pages")
        n = pages.count()
        assert n > 0
        with_spans = pages.filter(F.size("spans") > 0).count()
        assert with_spans == n
        assert pages.filter(F.col("content_sha256").isNull()).count() == 0

    def test_duplicate_suppression_on_pages(self, engine):
        """Planted duplicate bodies (det % 7 == 3) collapse under the exact
        dedup operator: every dup group has exactly one canonical page."""
        from crawler_spark.operators.dedup import mark_exact_duplicates

        pages = engine.store.read(engine.spark, "pages").select(
            F.col("url_hash").alias("page_id"),
            "content_sha256",
            F.col("fetched_round").cast("long").alias("crawled_at"),
        )
        marked = mark_exact_duplicates(pages)
        dups = marked.filter(F.col("is_duplicate")).count()
        assert dups > 0, "fixture must plant duplicates"
        canon = marked.filter(~F.col("is_duplicate")).groupBy("content_sha256").count()
        assert canon.filter(F.col("count") > 1).count() == 0

    def test_crawl_delay_budget_enforced(self, engine, robots):
        """host0 has Crawl-delay: 2 -> per-round budget halves to BUDGET/2."""
        order = engine.crawl_order()
        from collections import Counter

        per_round = Counter((rnd, host) for (rnd, host, _, _) in order)
        host0 = "portal0.go.id"
        for (rnd, host), n in per_round.items():
            if host == host0:
                assert n <= BUDGET // 2

    def test_metrics_lineage_recorded(self, engine):
        man = engine.store.manifest()
        rounds = [r for r in man["rounds"] if r["round"] >= 0]
        assert rounds
        for r in rounds:
            if "n_fetched" in r["metrics"]:
                for t in ("frontier", "seen", "pages"):
                    assert t in r["tables"]
                    assert "lineage" in r["tables"][t]
                    assert r["tables"][t]["rows"] == sum(
                        p["rows"] for p in r["tables"][t]["lineage"]
                    )


class TestRetryHistoryAndSeedOutcomes:
    """R5 per-attempt audit + P5 per-seed outcome enum, gated against the
    pure-Python simulator (independent recomputation, not construction)."""

    def test_fetch_log_matches_sim_attempts(self, engine, sim):
        log = engine.store.read(engine.spark, "fetch_log")
        got = sorted(
            (r.fetched_round, r.host, r.url_norm, r.status_code)
            for r in log.collect()
        )
        assert got == sorted(sim.fetch_attempts)

    def test_retry_history_matches_simulator(self, engine, sim):
        hist = engine.retry_history()
        got = sorted(
            (r.url_norm, r.attempt_number)
            for r in hist.filter(F.col("action") == "retry").collect()
        )
        assert len(got) > 0, "fixture must recirculate retries"
        assert got == sorted(sim.retries)

    def test_retry_history_dlq_rows_match_dlq_table(self, engine, sim):
        hist = engine.retry_history()
        got = sorted(
            (r.url_norm, r.attempt_number)
            for r in hist.filter(F.col("action") == "dlq").collect()
        )
        assert got == sorted(sim.dlq)

    def test_retry_history_counts_match_round_metrics(self, engine):
        """history rows == recirculated attempts, round by round."""
        per_round = {
            r.decided_round: (r.n_retry, r.n_dlq)
            for r in engine.retry_history()
            .groupBy("decided_round")
            .agg(
                F.count(F.when(F.col("action") == "retry", 1)).alias("n_retry"),
                F.count(F.when(F.col("action") == "dlq", 1)).alias("n_dlq"),
            )
            .collect()
        }
        for m in engine.store.round_metrics():
            if "n_retry" in m:
                want = (m["n_retry"], m["n_dlq"])
                assert per_round.get(m["round"], (0, 0)) == want

    def test_retry_history_backoff_matches_frontier_recirculation(self, engine):
        """A retry row's not_before must equal decided_round + delay — the
        exact value the recirculated frontier row carries (R3 precedence:
        Retry-After overrides attempt backoff)."""
        rows = engine.retry_history().filter(F.col("action") == "retry").collect()
        for r in rows:
            assert r.not_before == r.decided_round + r.retry_delay_rounds
            assert r.retry_delay_rounds > 0

    def test_seed_outcomes_match_simulator(self, engine, sim):
        from collections import defaultdict

        first: dict[str, int] = {}
        pc: dict[str, int] = defaultdict(int)
        nf: dict[str, int] = defaultdict(int)
        det: dict[str, set] = defaultdict(set)
        for rnd, host, url, status in sim.fetch_attempts:
            if host not in first:
                first[host] = status
            if status == 200:
                pc[host] += 1
            else:
                nf[host] += 1
            if "?page=" not in url:
                det[host].add(url)
        want = {}
        for host, st in first.items():
            if st == 404:
                o = "seed_url_404"
            elif st != 200:
                o = "seed_url_error"
            elif not det[host]:
                o = "success_no_urls"
            elif nf[host]:
                o = "partial_success"
            else:
                o = "success"
            want[host] = (o, pc[host], len(det[host]))

        got = {
            r.seed_host: (r.outcome, r.pages_crawled, r.urls_extracted)
            for r in engine.seed_outcomes().collect()
        }
        assert got == want
        assert len({o for (o, _, _) in got.values()}) > 1, (
            "fixture must exercise more than one outcome class"
        )


class TestResume:
    def test_resume_identical_to_oneshot(self, spark, corpus, robots, tmp_path_factory):
        spec = CorpusSpec(n_hosts=2, listing_pages=2, details_per_page=3,
                          hosts_with_robots=1)
        c = build_corpus(spec)
        rb = robots_map(spec)
        seeds = seed_urls(spec)

        oneshot = CrawlEngine(spark, str(tmp_path_factory.mktemp("one")), c, rb,
                              per_host_budget=4)
        oneshot.run(seeds=seeds, max_rounds=10)

        root = str(tmp_path_factory.mktemp("resumed"))
        first = CrawlEngine(spark, root, c, rb, per_host_budget=4)
        first.run(seeds=seeds, max_rounds=2)  # "crash" after round 1
        second = CrawlEngine(spark, root, c, rb, per_host_budget=4)  # fresh process
        second.run(max_rounds=10)

        assert second.crawl_order() == oneshot.crawl_order()
        assert second.seen_set() == oneshot.seen_set()
        p1 = oneshot.store.read(spark, "pages")
        p2 = second.store.read(spark, "pages")
        cols = ["url_hash", "content_sha256", "fetched_round", "fetch_order"]
        assert sorted(map(tuple, p1.select(cols).collect())) == sorted(
            map(tuple, p2.select(cols).collect())
        )
