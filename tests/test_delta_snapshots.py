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
    """Active non-compaction rounds write mode='delta' for every append-only
    table and mode='full' only for the frontier."""
    active = [r for r in _rounds(engine)
              if r["round"] >= 0 and "n_fetched" in r["metrics"]]
    assert active, "fixture must have active rounds"
    non_compaction = [r for r in active
                      if r["round"] % engine.REBUILD_EVERY != engine.REBUILD_EVERY - 1]
    assert non_compaction
    for r in non_compaction:
        assert r["tables"]["frontier"]["mode"] == "full"
        for t in APPEND_ONLY:
            assert r["tables"][t]["mode"] == "delta", (t, r["round"])


def test_delta_rows_equal_round_increment(engine):
    """Per-round IO is O(delta): the seen delta carries exactly the round's
    n_new_urls rows, the fetch_log delta exactly n_fetched rows — never the
    accumulated table."""
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


def test_compaction_round_writes_full(engine):
    comp = [r for r in _rounds(engine)
            if r["round"] >= 0 and "n_fetched" in r["metrics"]
            and r["round"] % engine.REBUILD_EVERY == engine.REBUILD_EVERY - 1]
    assert comp, "fixture must hit a compaction round"
    for r in comp:
        for t in APPEND_ONLY:
            assert r["tables"][t]["mode"] == "full", (t, r["round"])


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
