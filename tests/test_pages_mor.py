"""TTL-mode pages merge-on-read: version-append deltas + latest-wins read
policy (the corpus-sized table no longer pays a full rewrite every round).

Gates: (1) TTL rounds commit pages as O(new pages) deltas, folding only on
the staggered rotation slot; (2) the policy read resolves exactly one
latest row per key, equal to the eager merge_latest_wins result; (3) the
unpruned policy read never shuffles the base element (per-element
broadcast anti-joins — the frontier_dels plan shape applied to pages);
(4) the pruned point-lookup path stays correct (returns the latest
version) and refuses non-key prunes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=3, hosts_with_robots=0)
TTL = 2
ROUNDS = 10


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("pmor")), build_corpus(SPEC),
        robots_map(SPEC), per_host_budget=3, ttl_rounds=TTL,
        file_index={"pages": ["url_hash"]},
    )
    eng.run(seeds=seed_urls(SPEC), max_rounds=ROUNDS)
    return eng


def test_ttl_pages_commit_deltas(engine):
    """Most TTL rounds commit pages as a delta sized to the round's
    successful fetches; only rotation-fold rounds write full."""
    rounds = [r for r in engine.store.manifest()["rounds"]
              if "n_fetched" in r["metrics"] and "pages" in r["tables"]]
    modes = [r["tables"]["pages"]["mode"] for r in rounds]
    assert modes.count("delta") > modes.count("full"), modes
    for r in rounds:
        if r["tables"]["pages"]["mode"] == "delta":
            assert r["tables"]["pages"]["rows"] == r["metrics"]["n_ok"], (
                r["round"]
            )


def test_policy_read_is_latest_wins(engine, spark):
    """One row per (host, url_hash); the surviving row is the LATEST crawl
    — byte-equal to eagerly merging every fetch_log-ordered version."""
    pages = engine.store.read(spark, "pages")
    dups = pages.groupBy("host", "url_hash").count().filter("count > 1")
    assert dups.count() == 0
    # cross-check every key's surviving fetched_round against the
    # append-only fetch_log (successful fetches only)
    log = engine.store.read(spark, "fetch_log").filter(
        F.col("status_code") == 200
    )
    want = {
        (r["host"], r["url_hash"]): r["mx"]
        for r in log.groupBy("host", "url_hash")
        .agg(F.max("fetched_round").alias("mx")).collect()
    }
    got = {
        (r["host"], r["url_hash"]): r["fetched_round"]
        for r in pages.collect()
    }
    assert got == want
    # the fixture must actually exercise replacement (a TTL re-crawl)
    assert log.groupBy("host", "url_hash").count().filter("count > 1").count() > 0


def test_policy_read_never_shuffles_base(engine, spark):
    """Plan gate: the unpruned pages read resolves per-element — broadcast
    anti-joins on the claimed-key side, NO Exchange hashpartitioning of the
    corpus-sized base (the exact plan contract the frontier resolution
    carries)."""
    man = engine.store.manifest()
    chain = engine.store._live_chain(man["rounds"], "pages")
    assert len(chain) > 1, "fixture must leave pages mid-chain"
    plan = (
        engine.store.read(spark, "pages")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:1500]
    # windows (and their exchanges) run over DELTA elements only — each
    # delta subtree evaluates at most twice (once as output rows, once as
    # the claimed-key broadcast build side), so the exchange count is
    # bounded by the delta count, never by the base. The base element must
    # appear exclusively under the anti-join's streamed (build-free) side:
    # verify no Exchange sits between the base scan and the join by
    # asserting every window exchange partitions a delta path.
    n_deltas = sum(
        1 for _, info in chain if info.get("mode", "full") == "delta"
    )
    assert plan.count("Exchange hashpartitioning") <= 3 * n_deltas, plan[:2000]
    # the base (terminal snap) scan must never feed a Sort/Window — its
    # rows go straight into the anti-join projection
    base_path = chain[-1][1]["path"]
    for section in plan.split("BroadcastHashJoin"):
        if base_path in section and "Exchange hashpartitioning" in section:
            before = section.index(base_path)
            assert "Exchange hashpartitioning" not in section[:before] or \
                "delta-" in section[:before], (
                "base element appears below an exchange:\n" + section[:1200]
            )


def test_point_lookup_returns_latest_version(engine, spark):
    """The bloom-pruned point lookup resolves versions too: a re-crawled
    URL's lookup returns exactly one row, the latest."""
    log = engine.store.read(spark, "fetch_log").filter(
        F.col("status_code") == 200
    )
    re_crawled = (
        log.groupBy("host", "url_hash")
        .agg(F.count("*").alias("n"), F.max("fetched_round").alias("mx"))
        .filter("n > 1")
        .limit(1)
        .collect()
    )
    assert re_crawled, "fixture must produce a re-crawl"
    key = re_crawled[0]
    rows = engine.page_lookup(key["url_hash"]).collect()
    assert len(rows) == 1
    assert rows[0]["fetched_round"] == key["mx"]


def test_non_key_prune_refused_for_policy_table(engine, spark):
    with pytest.raises(ValueError, match="unsafe for latest-wins"):
        engine.store.read(
            spark, "pages", prune=[("fetched_round", ">=", 3)]
        )
