"""Crawl-trap cutoff in the engine: equivalence + suppression behavior.

Fixture: 2 hosts x 5 listing pages x 5 details. The detail template
`/putusan/detail/{N}` accumulates 5 URLs per host per round; with
trap_max_urls=12 it crosses the cap after round 3 (15 > 12), so the details
discovered from listing page 5 onward are dropped at extraction — while the
listing chain itself (a different template) keeps crawling to its natural
stop. The standing `url_templates` table carries the counts across rounds
as O(delta) appends.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    host_name,
    listing_html,
    listing_url,
)
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

TRAP_CAP = 12
SPEC = CorpusSpec(n_hosts=2, listing_pages=5, details_per_page=5,
                  hosts_with_robots=0)
DETAIL_TMPL = "/putusan/detail/{N}"


@pytest.fixture(scope="module")
def corpus():
    c = build_corpus(SPEC)
    # the sha-derived corpus plants 404/429s on some listing pages, cutting
    # the chains before the detail template can cross the cap — pin every
    # listing to 200 so the trap dynamics (not chain stops) drive the test
    for i in range(SPEC.n_hosts):
        h = host_name(i)
        for p in range(1, SPEC.listing_pages + 1):
            c[listing_url(h, p)] = (200, listing_html(SPEC, h, p), None)
    return c


@pytest.fixture(scope="module")
def seeds():
    return [listing_url(host_name(i), 1) for i in range(SPEC.n_hosts)]


@pytest.fixture(scope="module")
def sim(corpus, seeds):
    return simulate(corpus, {}, seeds, per_host_budget=8, max_rounds=20,
                    trap_max_urls=TRAP_CAP)


@pytest.fixture(scope="module")
def engine(spark, corpus, seeds, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("trap_store"))
    eng = CrawlEngine(spark, root, corpus, {}, per_host_budget=8,
                      trap_max_urls=TRAP_CAP)
    eng.init_frontier(seeds)
    eng.metrics_by_round = eng.run(max_rounds=20)
    return eng


class TestTrapEquivalence:
    def test_crawl_order_matches_simulator(self, engine, sim):
        assert engine.crawl_order() == sim.crawl_order

    def test_seen_set_matches_simulator(self, engine, sim):
        assert engine.seen_set() == sim.seen

    def test_trap_metric_matches_sim_flags(self, engine, sim):
        for m in engine.metrics_by_round:
            rnd = m["round"]
            if "n_trap_templates" in m:
                assert m["n_trap_templates"] == len(
                    sim.trap_flags_by_round.get(rnd, set())
                ), rnd

    def test_url_templates_table_matches_sim_counts(self, engine, sim):
        rows = (
            engine.store.read(engine.spark, "url_templates")
            .groupBy("host", "path_template")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        got = {(r["host"], r["path_template"]): r["n"] for r in rows}
        assert got == sim.template_counts


class TestTrapBehavior:
    def test_detail_template_flagged(self, sim):
        flagged = set().union(*sim.trap_flags_by_round.values())
        assert (host_name(0), DETAIL_TMPL) in flagged
        assert (host_name(1), DETAIL_TMPL) in flagged

    def test_trap_caps_frontier_growth(self, corpus, seeds, sim):
        """With the cap, fewer URLs enter the seen set; the suppressed ones
        are exactly detail URLs discovered after the flag."""
        base = simulate(corpus, {}, seeds, per_host_budget=8, max_rounds=20)
        assert sim.seen < base.seen
        # listing chain unaffected: same listing URLs crawled in both runs
        assert {u for _r, _h, _o, u in sim.crawl_order if "?page=" in u} == {
            u for _r, _h, _o, u in base.crawl_order if "?page=" in u
        }

    def test_counts_stop_growing_after_flag(self, sim):
        """Once flagged, a template's standing count freezes (candidates are
        dropped before the seen set, so they never increment it)."""
        cap_host = host_name(0)
        first_flag = min(
            rnd
            for rnd, flags in sim.trap_flags_by_round.items()
            if (cap_host, DETAIL_TMPL) in flags
        )
        # every detail enqueue event for this host happened before the flag
        n = sim.template_counts[(cap_host, DETAIL_TMPL)]
        assert n > TRAP_CAP  # crossed the cap...
        assert n <= TRAP_CAP + SPEC.details_per_page  # ...by at most one round's batch
        assert first_flag < sim.rounds


class TestTrapIngestionPaths:
    """Review finding: enqueue_seeds/enqueue_sitemaps must honor AND feed
    the trap table — a sitemap advertising a trap family must not bypass
    the cap that extraction candidates honor."""

    def test_enqueue_feeds_counts_and_is_then_suppressed(self, spark, corpus,
                                                         tmp_path):
        from pyspark.sql import functions as F

        eng = CrawlEngine(spark, str(tmp_path / "enq"), corpus, {},
                          per_host_budget=8, trap_max_urls=TRAP_CAP)
        h = host_name(0)
        # 20 distinct URLs of one template: over the cap in one batch
        urls = [f"https://{h}/putusan/archive/{i}" for i in range(20)]
        m1 = eng.enqueue_seeds(
            spark.createDataFrame([(u,) for u in urls], "url string")
        )
        assert m1["n_enqueued"] == 20
        tbl = (
            eng.store.read(spark, "url_templates")
            .groupBy("host", "path_template")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        counts = {(r["host"], r["path_template"]): r["n"] for r in tbl}
        assert counts[(h, "/putusan/archive/{N}")] == 20
        # a later enqueue of MORE urls from the now-flagged family drops
        # them all; a sibling template still enqueues
        more = [f"https://{h}/putusan/archive/{i}" for i in range(20, 30)]
        m2 = eng.enqueue_seeds(
            spark.createDataFrame([(u,) for u in more], "url string")
        )
        assert m2["n_enqueued"] == 0
        ok = eng.enqueue_seeds(
            spark.createDataFrame(
                [(f"https://{h}/putusan/other/1",)], "url string"
            )
        )
        assert ok["n_enqueued"] == 1

    def test_template_chain_stays_bounded(self, spark, corpus, seeds,
                                          tmp_path):
        """Review finding: the fold must fire on compaction rounds even when
        they discover no fresh URLs — the chain is bounded like every other
        table's."""
        eng = CrawlEngine(spark, str(tmp_path / "bound"), corpus, {},
                          per_host_budget=8, trap_max_urls=TRAP_CAP)
        eng.REBUILD_EVERY = 3
        eng.init_frontier(seeds)
        eng.run(max_rounds=20)
        # staggered rotation: 7 tables in rotation (url_templates included),
        # so the bound is max(REBUILD_EVERY, len(rotation)+1) = 8
        assert eng.store.chain_length("url_templates") <= 8


def test_conditional_without_ttl_is_rejected(spark, tmp_path):
    """Review finding: conditional_recrawl without ttl_rounds was a silent
    no-op; now it raises."""
    with pytest.raises(ValueError, match="conditional_recrawl"):
        CrawlEngine(spark, str(tmp_path / "x"), {}, {},
                    conditional_recrawl=True)


class TestTrapWAPInteraction:
    """The standing template table participates in write-audit-publish like
    every chain table: a vetoed round leaves no template delta behind, a
    published one carries its counts."""

    def test_vetoed_round_leaves_template_table_untouched(self, spark,
                                                          corpus, seeds,
                                                          tmp_path):
        from pyspark.sql import functions as F

        eng = CrawlEngine(spark, str(tmp_path / "wap"), corpus, {},
                          per_host_budget=8, trap_max_urls=TRAP_CAP)
        eng.init_frontier(seeds)
        m0 = eng.run_round_audited(0, lambda e, r: True)  # publish
        assert m0.get("published") is True
        tbl = eng.store.read(spark, "url_templates")
        before = {
            (r["host"], r["path_template"]): r["n"]
            for r in tbl.groupBy("host", "path_template")
            .agg(F.sum("n").alias("n")).collect()
        }
        assert before, "published round must have committed template counts"
        m1 = eng.run_round_audited(1, lambda e, r: False)  # veto
        assert m1.get("published") is False
        tbl2 = eng.store.read(spark, "url_templates")
        after = {
            (r["host"], r["path_template"]): r["n"]
            for r in tbl2.groupBy("host", "path_template")
            .agg(F.sum("n").alias("n")).collect()
        }
        assert after == before
        # re-run of the vetoed round publishes and ADDS its delta
        m2 = eng.run_round_audited(1, lambda e, r: True)
        assert m2.get("published") is True
        tbl3 = eng.store.read(spark, "url_templates")
        final = {
            (r["host"], r["path_template"]): r["n"]
            for r in tbl3.groupBy("host", "path_template")
            .agg(F.sum("n").alias("n")).collect()
        }
        assert sum(final.values()) > sum(before.values())
