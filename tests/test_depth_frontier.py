"""Depth-horizon + domain-priority frontier gates (north rule: "depth/
domain-priority frontier").

Every frontier row carries a hop-count `depth` (seeds = 0, links from a
depth-d page enter at d+1). `max_depth` drops over-horizon candidates AT
EXTRACTION — before the seen set, so a shorter path found later can still
enqueue the URL. `domain_priority` overrides the type-based priority per
host (the reference's per-website crawl_job.priority, current_schema.sql:172),
feeding the same S1 score. Both modes are gated by full scheduler
equivalence against the pure-Python simulator — the same bar as the default
engine — plus direct horizon/ordering assertions that don't depend on the
simulator sharing a bug.
"""

from __future__ import annotations

import hashlib

import pytest

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    detail_url,
    host_name,
    listing_url,
    robots_map,
    seed_urls,
)
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

# portal3 is the load-bearing host: its listing chain is all-200 (statuses
# are sha-derived), so it genuinely reaches depth 3+ and the horizon binds;
# portal0/1/2 chains die early (404 / permanent-429) and exercise the
# failure paths under depth config.
SPEC = CorpusSpec(n_hosts=4, listing_pages=4, details_per_page=4, hosts_with_robots=1)
BUDGET = 5
MAX_ROUNDS = 12
MAX_DEPTH = 2
# portal1 outranks everything; portal2 is demoted below the detail default —
# within each host the override flattens listing-vs-detail ordering, which
# reshuffles expansion (the equivalence gate proves the engine tracks it)
DOMAIN_PRIORITY = {host_name(1): 9, host_name(2): 2}


@pytest.fixture(scope="module")
def corpus():
    return build_corpus(SPEC)


@pytest.fixture(scope="module")
def robots():
    return robots_map(SPEC)


@pytest.fixture(scope="module")
def sim_depth(corpus, robots):
    return simulate(
        corpus, robots, seed_urls(SPEC), per_host_budget=BUDGET,
        max_rounds=MAX_ROUNDS, max_depth=MAX_DEPTH,
        domain_priority=DOMAIN_PRIORITY,
    )


@pytest.fixture(scope="module")
def engine_depth(spark, corpus, robots, tmp_path_factory):
    eng = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("depth-store")), corpus, robots,
        per_host_budget=BUDGET, max_depth=MAX_DEPTH,
        domain_priority=DOMAIN_PRIORITY,
    )
    eng.run(seeds=seed_urls(SPEC), max_rounds=MAX_ROUNDS)
    return eng


def _sha(u: str) -> str:
    return hashlib.sha256(u.encode()).hexdigest()


class TestDepthDomainEquivalence:
    """The north-rule gate, under depth+domain configuration."""

    def test_crawl_order_matches_simulator(self, engine_depth, sim_depth):
        assert engine_depth.crawl_order() == sorted(sim_depth.crawl_order)

    def test_seen_set_matches_simulator(self, engine_depth, sim_depth):
        assert engine_depth.seen_set() == sim_depth.seen

    def test_config_actually_changes_the_crawl(self, corpus, robots, sim_depth):
        """Non-vacuity: the depth+priority config must produce a different
        schedule than the defaults, or the equivalence above proves nothing
        new."""
        base = simulate(corpus, robots, seed_urls(SPEC), per_host_budget=BUDGET,
                        max_rounds=MAX_ROUNDS)
        assert sorted(base.crawl_order) != sorted(sim_depth.crawl_order)
        assert base.seen > sim_depth.seen  # horizon strictly shrinks the crawl


class TestDepthHorizon:
    """Direct BFS-depth assertions, independent of the simulator."""

    def test_over_horizon_urls_never_seen(self, engine_depth):
        """Listing page p sits at depth p-1; its details at depth p. With
        max_depth=2: listing page 4 (depth 3) and page-3 details (depth 3)
        must never enter the seen set; page-3 listings (depth 2) and page-2
        details (depth 2) may."""
        seen = engine_depth.seen_set()
        for hi in range(SPEC.n_hosts):
            host = host_name(hi)
            assert _sha(listing_url(host, 4)) not in seen
            for slot in range(SPEC.details_per_page):
                assert _sha(detail_url(host, 3, slot)) not in seen

    def test_within_horizon_frontier_expands(self, engine_depth):
        """The horizon must not under-crawl: depth-2 URLs (page-2 details)
        ARE reached on at least one host (not every one — failures/robots
        can prune a whole page chain on some hosts)."""
        seen = engine_depth.seen_set()
        hit = [
            _sha(detail_url(host_name(hi), 2, slot)) in seen
            for hi in range(SPEC.n_hosts)
            for slot in range(SPEC.details_per_page)
        ]
        assert any(hit)

    def test_frontier_rows_carry_depth(self, engine_depth, spark):
        """Every frontier row ever committed stays within the horizon, and
        seeds carry depth 0 (round -1 snapshot)."""
        st = engine_depth.store
        f0 = st.read_at(spark, "frontier", -1)
        assert {r.depth for r in f0.collect()} == {0}
        last = st.read(spark, "frontier")
        assert last.filter(f"depth > {MAX_DEPTH}").count() == 0


class TestDomainPriority:
    def test_override_flattens_type_order_within_host(self, corpus, robots):
        """On an overridden host every row scores with the same priority, so
        within a round the fetch order falls back to (scheduled_ms,
        url_hash) — listings no longer outrank details. Assert the property
        itself via the simulator schedule (already proven == engine): on
        portal3 (the all-200 chain, so listings and details coexist) the
        BASE schedule fetches listings before details within every round,
        and the OVERRIDE schedule violates that in at least one round."""
        hot = host_name(3)
        # budget 4: rounds 2-3 on portal3 fetch a mix of listings and
        # details, so the flattening is observable (at budget <= 3 each
        # round happens to drain one type only and the property is vacuous)
        sim = simulate(
            corpus, robots, seed_urls(SPEC), per_host_budget=4,
            max_rounds=MAX_ROUNDS, domain_priority={hot: 9},
        )
        base = simulate(
            corpus, robots, seed_urls(SPEC), per_host_budget=4,
            max_rounds=MAX_ROUNDS,
        )

        def detail_before_listing_rounds(result):
            """Rounds on `hot` where some detail was fetched before a
            listing (listing = pagination URL, '?page=' marker)."""
            by_round: dict[int, list[tuple[int, str]]] = {}
            for rnd, h, order, url in result.crawl_order:
                if h == hot:
                    by_round.setdefault(rnd, []).append((order, url))
            bad = set()
            for rnd, rows in by_round.items():
                seen_detail = False
                for _, url in sorted(rows):
                    if "?page=" in url and seen_detail:
                        bad.add(rnd)
                    if "?page=" not in url:
                        seen_detail = True
            return bad

        assert not detail_before_listing_rounds(base), (
            "type priority must order listings first in the default config"
        )
        assert detail_before_listing_rounds(sim), (
            "override must flatten listing-vs-detail ordering somewhere"
        )

    def test_seed_priority_uses_override(self, spark, corpus, robots, tmp_path_factory):
        eng = CrawlEngine(
            spark, str(tmp_path_factory.mktemp("prio-store")), corpus, robots,
            per_host_budget=BUDGET, domain_priority={host_name(0): 3},
        )
        eng.init_frontier(seed_urls(SPEC))
        rows = {r.host: r.priority for r in eng.store.read(spark, "frontier").collect()}
        assert rows[host_name(0)] == 3
        assert rows[host_name(1)] == 7  # PRIORITY_LISTING default


class TestSchemaEvolution:
    def test_pre_depth_store_resumes_with_default(self, spark, corpus, robots, tmp_path):
        """A store committed BEFORE the depth column existed must resume
        (Iceberg add-column evolution: missing column reads as the default,
        depth 0). Simulated by rewriting the frontier's live parquet without
        the column mid-crawl, then resuming with a fresh engine."""
        import pyspark.sql.functions as F

        root = str(tmp_path / "old-store")
        eng = CrawlEngine(spark, root, corpus, robots, per_host_budget=BUDGET)
        eng.run(seeds=seed_urls(SPEC), max_rounds=2)

        # strip depth from every live frontier file (pre-upgrade layout)
        paths = eng.store.table_paths("frontier")
        for p in paths:
            old = spark.read.parquet(p).drop("depth").collect()
            schema = spark.read.parquet(p).drop("depth").schema
            spark.createDataFrame(old, schema).write.mode("overwrite").parquet(p)
        assert "depth" not in spark.read.parquet(*paths).columns

        resumed = CrawlEngine(spark, root, corpus, robots, per_host_budget=BUDGET)
        resumed.run(max_rounds=3)  # must not raise column-resolution errors
        # the engine read boundary coalesces mixed-schema chains to the
        # default depth — that resolved view is what every round consumes
        final = resumed._read_frontier(spark)
        assert "depth" in final.columns
        assert final.filter(F.col("depth").isNull()).count() == 0
        # and the gate must have TEETH against a mergeSchema regression:
        # the RAW chain (old depth-less base + post-upgrade delta files)
        # must still surface the persisted non-zero hop counts — if the
        # reader dropped the column (picking one file's schema), every row
        # would coalesce to depth 0 and the horizon logic would break while
        # the resolved-view assertions above stayed green by construction
        raw = resumed.store.read(spark, "frontier", resolve=False)
        assert "depth" in raw.columns
        assert raw.filter(F.col("depth") > 0).count() > 0, (
            "post-upgrade delta files must carry real persisted hop counts"
        )
