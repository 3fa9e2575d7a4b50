"""Delta-based snapshot commits (Iceberg fast-append semantics): append-only
tables write O(delta) per round, compaction rounds collapse the chain, drain
rounds write nothing, and reads always reconstruct the full live state."""

from __future__ import annotations

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.superstep import CrawlEngine

import pytest

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=4,
                  hosts_with_robots=1)
APPEND_ONLY = ("seen", "pages", "dlq", "fetch_log", "retry_history")


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("delta")), build_corpus(SPEC),
        robots_map(SPEC), per_host_budget=3,
    )
    eng.REBUILD_EVERY = 3  # force a compaction round mid-crawl
    eng.run(seeds=seed_urls(SPEC), max_rounds=12)
    return eng


def _rounds(engine):
    return engine.store.manifest()["rounds"]


def test_append_only_tables_commit_deltas(engine):
    """Active non-compaction rounds write mode='delta' for EVERY table —
    including the frontier, which commits merge-on-read (adds delta +
    equality-delete keys in frontier_dels) instead of a full rewrite. The
    only full table writes happen on the compaction cadence."""
    active = [r for r in _rounds(engine)
              if r["round"] >= 0 and "n_fetched" in r["metrics"]]
    assert active, "fixture must have active rounds"
    non_compaction = [r for r in active
                      if r["round"] % engine.REBUILD_EVERY != engine.REBUILD_EVERY - 1]
    assert non_compaction
    first_dels = min(
        r["round"] for r in active if "frontier_dels" in r["tables"]
    )
    for r in non_compaction:
        assert r["tables"]["frontier"]["mode"] == "delta", r["round"]
        # the very first dels commit on a store may be the chain's full base
        if r["round"] > first_dels:
            assert r["tables"]["frontier_dels"]["mode"] == "delta", r["round"]
        for t in APPEND_ONLY:
            assert r["tables"][t]["mode"] == "delta", (t, r["round"])


def test_delta_rows_equal_round_increment(engine):
    """Per-round IO is O(delta): the seen delta carries exactly the round's
    n_new_urls rows, the fetch_log delta exactly n_fetched rows, the
    frontier delta exactly the recirculated + fresh rows, the delete keys
    exactly the consumed rows — never the accumulated table."""
    for r in _rounds(engine):
        m = r["metrics"]
        if "n_fetched" not in m:
            continue
        if r["tables"]["seen"]["mode"] == "delta":
            assert r["tables"]["seen"]["rows"] == m["n_new_urls"]
        if r["tables"]["fetch_log"]["mode"] == "delta":
            assert r["tables"]["fetch_log"]["rows"] == m["n_fetched"]
        if r["tables"]["dlq"]["mode"] == "delta":
            assert r["tables"]["dlq"]["rows"] == m["n_dlq"]
        if r["tables"]["frontier"]["mode"] == "delta":
            assert r["tables"]["frontier"]["rows"] == (
                m["n_retry"] + m["n_new_urls"]
            )
            assert r["tables"]["frontier_dels"]["rows"] == (
                m["n_selected"] + m["n_robots_excluded"]
            )


def test_compaction_round_writes_full(engine):
    comp = [r for r in _rounds(engine)
            if r["round"] >= 0 and "n_fetched" in r["metrics"]
            and r["round"] % engine.REBUILD_EVERY == engine.REBUILD_EVERY - 1]
    assert comp, "fixture must hit a compaction round"
    for r in comp:
        for t in APPEND_ONLY + ("frontier", "frontier_dels"):
            assert r["tables"][t]["mode"] == "full", (t, r["round"])
        # compaction resolves the merge-on-read chain: dels reset to empty
        assert r["tables"]["frontier_dels"]["rows"] == 0


def test_resolved_frontier_excludes_deleted_rows(engine, spark):
    """The merge-on-read read path: resolved frontier == adds minus delete
    keys, and every fetched URL's consumed row is invisible (a fetched URL
    can re-enter only as a NEW row — retry or TTL re-discovery)."""
    resolved = engine._read_frontier(spark)
    adds = engine.store.read(spark, "frontier")
    dels = engine.store.read(spark, "frontier_dels")
    assert resolved.count() == adds.count() - dels.count()
    joined = resolved.join(
        dels, ["url_hash", "attempt", "scheduled_ms", "not_before"], "inner"
    )
    assert joined.count() == 0


def test_resolved_frontier_plans_broadcast_anti_join(engine, spark):
    """The merge-on-read resolution must cost ZERO exchange on the adds
    side: the delete-key set is budget-bounded (<= REBUILD_EVERY rounds of
    selected+excluded rows), so the anti-join plans as a broadcast hash
    join with the dels side built — at 10^10 frontier rows the resolution
    stays a map-side filter over the adds scan."""
    plan = engine._read_frontier(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:1500]
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
        plan[:1500]
    )


def test_drain_rounds_write_no_tables(engine):
    drains = [r for r in _rounds(engine) if r["metrics"].get("n_due") == 0]
    assert drains, "fixture must end with drain rounds"
    for r in drains:
        assert r["tables"] == {}


def test_read_reconstructs_accumulated_state(engine, spark):
    """read() unions the live chain: total fetch_log rows == sum of every
    active round's n_fetched (nothing lost, nothing duplicated across the
    full->delta->full chain)."""
    want = sum(r["metrics"].get("n_fetched", 0) for r in _rounds(engine))
    got = engine.store.read(spark, "fetch_log").count()
    assert got == want

    want_seen = sum(r["metrics"].get("n_new_urls", 0) for r in _rounds(engine))
    want_seen += next(r["metrics"]["n_seeds"] for r in _rounds(engine)
                      if r["metrics"].get("phase") == "init")
    assert engine.store.read(spark, "seen").count() == want_seen


def test_table_paths_chain_shape(engine):
    """The live chain is newest-full (or base) + subsequent deltas, bounded
    by the compaction cadence."""
    paths = engine.store.table_paths("fetch_log")
    assert paths, "chain must be non-empty"
    # oldest entry is a full snapshot (snap-), later ones deltas (delta-)
    assert "snap-" in paths[0]
    for p in paths[1:]:
        assert "delta-" in p
    assert len(paths) <= engine.REBUILD_EVERY + 1


def test_expiry_preserves_chain_state(engine, spark):
    """Expiring to a window that slices through a delta chain folds the
    below-window chain into the kept manifest; live state is unchanged."""
    before = sorted(
        map(tuple, engine.store.read(spark, "fetch_log").collect())
    )
    stats = engine.store.expire_snapshots(keep_last=2)
    assert stats["kept_rounds"] == 2
    after = sorted(
        map(tuple, engine.store.read(spark, "fetch_log").collect())
    )
    assert after == before
    # and every other table survives too
    for t in ("frontier", "seen", "pages", "dlq", "retry_history"):
        assert engine.store.read(spark, t) is not None


def test_reporting_guard_refuses_in_round(engine):
    """crawl_order()/seen_set() are driver-collect reporting paths; the
    engine must refuse them inside a superstep."""
    engine._in_round = True
    try:
        with pytest.raises(RuntimeError, match="reporting path"):
            engine.crawl_order()
        with pytest.raises(RuntimeError, match="reporting path"):
            engine.seen_set()
    finally:
        engine._in_round = False
