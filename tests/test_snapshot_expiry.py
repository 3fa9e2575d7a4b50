"""Snapshot expiry (Q7 operational parity): old snapshots are physically
removed, the live state of every table survives, and the engine resumes."""

import os

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=1, listing_pages=2, details_per_page=3,
                  hosts_with_robots=0)


def _table_rows(spark, store, table):
    df = store.read(spark, table)
    return sorted(map(tuple, df.select(sorted(df.columns)).collect()))


def test_expire_keeps_live_state_and_resume(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    eng = CrawlEngine(spark, str(tmp_path / "x"), corpus, robots, per_host_budget=3)
    # merge-on-read property: dirs referenced by a kept round's live chain
    # (tables AND filter blobs) cannot be reclaimed — only dirs superseded
    # by a compaction can. A fast compaction cadence guarantees the 4-round
    # crawl crosses one, so expiry has something physical to remove.
    eng.REBUILD_EVERY = 2
    eng.run(seeds=seeds, max_rounds=4)

    before = {t: _table_rows(spark, eng.store, t)
              for t in ("frontier", "seen", "pages", "dlq", "fetch_log")}
    rows_meta_before = {t: eng.store.table_rows(t) for t in before}
    n_rounds_before = len(eng.store.manifest()["rounds"])
    assert n_rounds_before > 2

    stats = eng.store.expire_snapshots(keep_last=2)
    assert stats["removed_dirs"] > 0 and stats["kept_rounds"] == 2

    # live state identical after expiry
    for t, rows in before.items():
        assert _table_rows(spark, eng.store, t) == rows, f"{t} changed"
    # metadata row counts survive the fold (base_rows carry-forward)
    for t, n in rows_meta_before.items():
        assert eng.store.table_rows(t) == n, f"{t} metadata rows changed"
    # expired snap dirs actually gone
    snap0 = os.path.join(eng.store.root, "pages", "snap-00000")
    # (round 0 wrote pages; only relevant if it is outside the kept window)
    if n_rounds_before - 2 > 1:
        assert not os.path.isdir(snap0)

    # the engine resumes and completes on the expired store
    out = eng.run(max_rounds=6)
    assert out, "resume after expiry must run"


def test_expire_reclaims_chain_dirs_after_compaction(spark, tmp_path):
    """Blob dirs referenced only via a dropped round's blob_chain must be
    rmtree'd once no kept round reads through them. The leak shape: expiry
    keeps round R whose chain is [b0, d1, d2] (so those dirs survive with
    their writer rounds already dropped); after a compaction resets the
    chain to [b7], a second expiry drops R — b0/d1/d2 then have no manifest
    entry anywhere, and only the chain-aware removal loop reclaims them.
    Leaking the previous full base each compaction cycle = unbounded disk."""
    # corpus big enough to discover fresh URLs EVERY round through round 8
    # (an early drain stops blob-state evolution and the second chain never
    # supersedes the first): rounds 0-4 give chain [b2, d3, d4] after the
    # round-2 compaction
    spec = CorpusSpec(n_hosts=8, listing_pages=10, details_per_page=4,
                      hosts_with_robots=0)
    corpus, robots, seeds = build_corpus(spec), robots_map(spec), seed_urls(spec)
    eng = CrawlEngine(spark, str(tmp_path / "z"), corpus, robots, per_host_budget=3)
    eng.REBUILD_EVERY = 3  # compactions at rounds 2, 5, ...; deltas between
    eng.run(seeds=seeds, max_rounds=5)

    # first expiry: keep a small window; chains referenced by kept rounds
    # must survive on disk even when their writer rounds dropped
    eng.store.expire_snapshots(keep_last=2)
    chain1 = eng.store.latest_blob_chain()
    assert chain1 is not None
    for d in chain1:
        assert os.path.isdir(d)

    # crawl on: round 5's compaction supersedes chain1 with a fresh base
    eng.run(max_rounds=3)
    chain2 = eng.store.latest_blob_chain()
    assert chain2 is not None and chain2 != chain1

    # second expiry: every dir of chain1 that chain2 doesn't reuse must be
    # physically reclaimed (no manifest entry references it anymore)
    eng.store.expire_snapshots(keep_last=1)
    leaked = [d for d in chain1 if d not in set(chain2) and os.path.isdir(d)]
    assert leaked == [], f"blob chain dirs leaked after expiry: {leaked}"
    # and the surviving chain still serves the full seen set
    from crawler_spark.engine.superstep import N_SHARDS
    from crawler_spark.operators.seenset import probe_seen_files

    seen = eng.store.read(spark, "seen")
    chain_live = eng.store.latest_blob_chain()
    probed = probe_seen_files(seen, chain_live, n_shards=N_SHARDS, layer="bloom")
    assert probed.filter("maybe_seen").count() == seen.count()


def test_expire_to_drain_only_window_keeps_blob_dir_reference(spark, tmp_path):
    """Drain-only rounds commit no blob_dir. Expiring so the kept window is
    all drain rounds must fold the newest blob_dir into the kept manifest —
    otherwise latest_blob_dir() returns None and the next active round's
    incremental shard update would commit filters built from its fresh keys
    alone (previously-seen URLs would probe maybe_seen=false and re-enqueue)."""
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    eng = CrawlEngine(spark, str(tmp_path / "y"), corpus, robots, per_host_budget=3)
    # run to full drain: trailing rounds are drain-only (no blob_dir entry)
    eng.run(seeds=seeds, max_rounds=12)
    rounds = eng.store.manifest()["rounds"]
    n_drain = sum(1 for r in reversed(rounds) if "blob_dir" not in r)
    assert n_drain >= 1, "fixture must end with at least one drain-only round"

    blob_before = eng.store.latest_blob_chain()
    assert blob_before is not None
    eng.store.expire_snapshots(keep_last=max(1, n_drain))
    # the reference survives the expiry, pointing at the same still-on-disk
    # chain (fold into the kept manifest)
    assert eng.store.latest_blob_chain() == blob_before
    for d in blob_before:
        assert os.path.isdir(d)

    # and the seen invariant holds end-to-end: every URL in the seen table
    # still probes maybe_seen=true through the surviving shard filters (a
    # lost blob_chain reference is exactly what would break this)
    from crawler_spark.engine.superstep import N_SHARDS
    from crawler_spark.operators.seenset import probe_seen_files

    seen = eng.store.read(spark, "seen")
    probed = probe_seen_files(
        seen, eng.store.latest_blob_chain(), n_shards=N_SHARDS, layer="bloom"
    )
    n_seen = seen.count()
    assert n_seen > 0
    assert probed.filter("maybe_seen").count() == n_seen


def test_remove_orphans_reclaims_only_unreferenced_dirs(spark, tmp_path):
    """Iceberg remove_orphan_files semantics: crash-stranded snap/delta/blob
    dirs go, every manifest-referenced dir (committed, base_paths fold,
    blob chain, staged branch) and the engine-owned log feeds stay, and the
    grace window protects in-flight writes."""
    import time

    from crawler_spark.engine.snapshots import SnapshotStore

    store = SnapshotStore(str(tmp_path / "s"))
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    store.commit_round(0, {"t": df})
    store.commit_round(1, {}, delta_tables={"t": df})
    store.commit_round(2, {"t": df}, branch="audit")
    before_t = sorted(map(tuple, store.read(spark, "t").collect()))
    before_staged = sorted(map(tuple, store.read_staged(spark, "t").collect()))

    # strand orphans the way a crash does: fully-written dirs, no manifest
    old = time.time() - 7200
    orphans = [
        os.path.join(store.root, "t", "snap-00099"),
        os.path.join(store.root, "t", "delta-00098"),
        os.path.join(store.root, "_blobs", "snap-00097"),
    ]
    for p in orphans:
        os.makedirs(p)
        with open(os.path.join(p, "part-0.parquet"), "wb") as fh:
            fh.write(b"x")
        os.utime(p, (old, old))
    young = os.path.join(store.root, "t", "snap-00096")
    os.makedirs(young)
    feed = os.path.join(store.root, "_logfeed", "feed-00000")
    os.makedirs(feed)

    out = store.remove_orphans(grace_seconds=3600)
    assert out["removed_dirs"] == 3
    assert out["skipped_young"] == 1
    assert not any(os.path.isdir(p) for p in orphans)
    assert os.path.isdir(young) and os.path.isdir(feed)
    # referenced dirs untouched: committed chain and staged branch both read
    assert sorted(map(tuple, store.read(spark, "t").collect())) == before_t
    assert (
        sorted(map(tuple, store.read_staged(spark, "t").collect()))
        == before_staged
    )
    # second pass after the window: the young orphan goes too
    os.utime(young, (old, old))
    assert store.remove_orphans(grace_seconds=3600)["removed_dirs"] == 1
    store.drop_branch()


def test_remove_orphans_is_root_spelling_insensitive(spark, tmp_path):
    """Liveness must compare NORMALIZED paths: a maintenance session that
    spells the same root differently ('store/.' vs 'store') must not see
    every committed dir as an orphan and delete live data."""
    import time

    from crawler_spark.engine.snapshots import SnapshotStore

    root = str(tmp_path / "s")
    store = SnapshotStore(root)
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    store.commit_round(0, {"t": df})
    # age the committed dir past any grace window
    snap = store.manifest()["rounds"][0]["tables"]["t"]["path"]
    old = time.time() - 7200
    os.utime(snap, (old, old))

    reopened = SnapshotStore(os.path.join(root, "."))
    out = reopened.remove_orphans(grace_seconds=3600)
    assert out["removed_dirs"] == 0
    assert sorted(map(tuple, reopened.read(spark, "t").collect())) == [(1, "a")]
