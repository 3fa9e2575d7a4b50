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


def test_staggered_folds_one_table_per_round(engine):
    """STAGGERED compaction: every table defaults to mode='delta' (the
    frontier merge-on-read: adds delta + equality-delete keys) and each
    active round folds AT MOST ONE table chain — the O(store) all-tables
    modulo-round spike is gone. frontier+frontier_dels fold together as
    one unit."""
    active = [r for r in _rounds(engine)
              if r["round"] >= 0 and "n_fetched" in r["metrics"]]
    assert active, "fixture must have active rounds"
    first_dels = min(
        r["round"] for r in active if "frontier_dels" in r["tables"]
    )
    for r in active:
        fulls = {
            t for t, info in r["tables"].items() if info["mode"] == "full"
        }
        fulls.discard("frontier_dels")  # rides with frontier
        # the very first dels commit on a store is the chain's full base
        if r["round"] == first_dels:
            fulls.discard("frontier")
        assert len(fulls) <= 1, (r["round"], sorted(fulls))
    # and most rounds are delta for every append-only table
    for t in APPEND_ONLY:
        modes = [r["tables"][t]["mode"] for r in active if t in r["tables"]]
        assert modes.count("delta") > modes.count("full"), t


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


def test_rotation_folds_and_dels_reset(engine):
    """The longest-chain-first rotation actually folds chains (a fixture
    this short can legitimately drain before the LAST table's turn — what
    matters is that folding is spread over rounds and chains stay bounded,
    which test_chain_length_bounded_every_round pins), and a frontier fold
    resets the merge-on-read delete keys to empty (rewrite_data_files +
    delete-file compaction)."""
    active = [r for r in _rounds(engine)
              if r["round"] >= 0 and "n_fetched" in r["metrics"]]
    folded = {
        t for t in APPEND_ONLY + ("frontier",)
        if any(r["tables"].get(t, {}).get("mode") == "full" for r in active)
    }
    assert len(folded) >= 4, f"rotation barely folded anything: {folded}"
    assert "frontier" in folded
    for r in active:
        if r["tables"]["frontier"]["mode"] == "full":
            assert r["tables"]["frontier_dels"]["mode"] == "full"
            assert r["tables"]["frontier_dels"]["rows"] == 0


def test_chain_length_bounded_every_round(engine):
    """The load-bearing bound: at no point in history did ANY table's live
    chain exceed the staggered fold bound — max(REBUILD_EVERY,
    len(rotation)+1): the one-table-per-round rotation cycles chains
    through 1..len(rotation), and the forced backstop catches quiet-round
    starvation."""
    rounds = _rounds(engine)
    n_rotation = 6  # frontier, seen, pages, fetch_log, dlq, retry_history
    bound = max(engine.REBUILD_EVERY, n_rotation + 1) + 1
    for upto in range(len(rounds)):
        prefix = rounds[: upto + 1]
        for t in APPEND_ONLY + ("frontier", "frontier_dels"):
            chain = engine.store._live_chain(prefix, t)
            assert len(chain) <= bound, (
                t, prefix[-1]["round"], len(chain)
            )


def test_resolved_frontier_excludes_deleted_rows(engine, spark):
    """The merge-on-read read path: resolved frontier == adds minus delete
    keys, and every fetched URL's consumed row is invisible (a fetched URL
    can re-enter only as a NEW row — retry or TTL re-discovery)."""
    resolved = engine._read_frontier(spark)
    adds = engine.store.read(spark, "frontier", resolve=False)
    dels = engine.store.read(spark, "frontier_dels")
    assert resolved.count() == adds.count() - dels.count()
    joined = resolved.join(
        dels, ["url_hash", "attempt", "scheduled_ms", "not_before"], "inner"
    )
    assert joined.count() == 0


def test_resolved_frontier_plans_broadcast_anti_join(small_engine, spark):
    """The merge-on-read resolution must cost ZERO exchange on the adds
    side: the delete-key set is budget-bounded (<= REBUILD_EVERY rounds of
    selected+excluded rows), so the anti-join plans as a broadcast hash
    join with the dels side built — EXPLICITLY hinted, because at 10^10
    frontier rows dels stats can exceed autoBroadcastJoinThreshold and a
    stats-driven planner would shuffle the entire adds chain. (Uses the
    mid-chain fixture: a compacted store has no dels and skips the join.)"""
    assert small_engine.store.read(spark, "frontier_dels").count() > 0
    plan = (
        small_engine._read_frontier(spark)
        ._jdf.queryExecution().executedPlan().toString()
    )
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
    assert len(paths) <= max(engine.REBUILD_EVERY, 7) + 1  # staggered bound


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


@pytest.fixture()
def small_engine(spark, tmp_path):
    """Function-scoped engine mid-chain (no compaction yet): dels non-empty."""
    eng = CrawlEngine(
        spark, str(tmp_path / "mor"), build_corpus(SPEC),
        robots_map(SPEC), per_host_budget=3,
    )
    eng.REBUILD_EVERY = 16  # keep the whole run on the delta chain
    eng.run(seeds=seed_urls(SPEC), max_rounds=3)
    return eng


def test_store_read_resolves_for_every_reader(small_engine, spark):
    """Resolution lives in SnapshotStore.read, not the engine: a plain
    store.read('frontier') — what tests, reporting, and external consumers
    call — must already exclude consumed rows (Iceberg applies delete files
    inside the table scan)."""
    store = small_engine.store
    dels = store.read(spark, "frontier_dels")
    assert dels.count() > 0, "fixture must have outstanding delete keys"
    resolved = store.read(spark, "frontier")
    key = ["url_hash", "attempt", "scheduled_ms", "not_before"]
    assert resolved.join(dels, key, "inner").count() == 0
    raw = store.read(spark, "frontier", resolve=False)
    assert raw.count() == resolved.count() + dels.count()


def test_read_at_resolves_historical_rounds(small_engine, spark):
    """Time travel applies the delete keys AS OF the requested round."""
    store = small_engine.store
    key = ["url_hash", "attempt", "scheduled_ms", "not_before"]
    for r in (1, 2):
        dels = store.read_at(spark, "frontier_dels", r, resolve=False)
        frontier = store.read_at(spark, "frontier", r)
        if dels is None:
            continue
        assert frontier.join(dels, key, "inner").count() == 0


def test_full_snapshot_commit_resets_delete_keys(small_engine, spark):
    """Iceberg rewrite_data_files drops applied delete files: a FULL
    frontier commit without an explicit dels table must reset the dels
    chain in the same commit — otherwise stale delete keys would delete
    rows of the NEW snapshot (or, worse, rewritten rows whose keys no
    longer match their delete keys would be resurrected)."""
    store = small_engine.store
    assert store.read(spark, "frontier_dels").count() > 0
    live = store.read(spark, "frontier")
    live_rows = live.collect()
    frontier = spark.createDataFrame(live_rows, live.schema)
    r = store.latest_round() + 1
    store.commit_round(r, {"frontier": frontier}, metrics={"phase": "rewrite"})
    entry = store.manifest()["rounds"][-1]
    assert entry["tables"]["frontier_dels"]["mode"] == "full"
    assert entry["tables"]["frontier_dels"]["rows"] == 0
    after = store.read(spark, "frontier")
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, live_rows))


def test_enqueue_only_workload_bounds_chain(spark, tmp_path):
    """N enqueue_seeds calls between crawls (the streaming entry point)
    must not grow the frontier delta chain without bound: the chain-length
    backstop compacts on the same cadence _run_round uses."""
    eng = CrawlEngine(
        spark, str(tmp_path / "enq"), build_corpus(SPEC),
        robots_map(SPEC), per_host_budget=3,
    )
    eng.REBUILD_EVERY = 4
    eng.run(seeds=seed_urls(SPEC), max_rounds=2)
    n_urls = 0
    for i in range(10):
        eng.add_seeds([f"https://bulk-{i}.example.id/putusan/x{j}"
                       for j in range(3)])
        n_urls += 3
        assert eng.store.chain_length("frontier") <= eng.REBUILD_EVERY, (
            f"chain unbounded after enqueue {i}"
        )
    # compaction must not have lost any enqueued row
    resolved = eng._read_frontier(spark)
    got = resolved.filter(resolved.host.startswith("bulk-")).count()
    assert got == n_urls
