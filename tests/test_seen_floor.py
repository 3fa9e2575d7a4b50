"""Round-partitioned TTL seen-table expiry via the manifest expiry floor.

TTL mode used to rewrite the seen table in FULL every round (the last
per-round write proportional to standing state — O(window), ~10^8-10^9 rows
at a 24 h window on the north-rule frontier). Now each round commits only
its fresh cohort as a delta (the table is effectively partitioned by
seen_round — each delta element IS a round partition) and expiry is an
advancing manifest floor: reads prune aged round-partitions at the manifest
level and cut stragglers row-level, the Iceberg drop-partition analogue.
Aged partitions physically leave disk when the compaction rotation reaches
seen's slot (full fold of the surviving window).

Gates: (1) per-round seen table writes are O(delta) — delta mode, rows ==
the round's fresh cohort; (2) the floored read equals the window the old
full rewrite materialized, at every round (read_at); (3) the floor survives
expire_snapshots; (4) engine==sim equivalence is already re-asserted by
test_seen_ttl.py / test_frontier_engine.py over the same commit path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

TTL = 2
ROUNDS = 10


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from crawler_spark.engine.corpus import (
        CorpusSpec, build_corpus, robots_map, seed_urls,
    )
    from crawler_spark.engine.superstep import CrawlEngine

    spec = CorpusSpec(
        n_hosts=2, listing_pages=3, details_per_page=3, hosts_with_robots=0
    )
    eng = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("seenfloor")),
        build_corpus(spec), robots_map(spec), per_host_budget=3,
        ttl_rounds=TTL,
    )
    eng.run(seeds=seed_urls(spec), max_rounds=ROUNDS)
    return eng


def test_ttl_seen_commits_are_delta_sized(engine):
    """The write gate: active TTL rounds commit seen as a DELTA holding
    exactly the round's fresh cohort — never a full window rewrite outside
    the rotation's fold slot."""
    rounds = engine.store.manifest()["rounds"]
    n_delta = n_full = 0
    for r in rounds:
        info = r["tables"].get("seen")
        m = r.get("metrics", {})
        if info is None:
            # quiet round: no fresh URLs -> no seen write at all (expiry is
            # the floor advance, metadata-only)
            assert m.get("n_new_urls", m.get("n_enqueued", 0)) in (0, None)
            continue
        if info["mode"] == "delta":
            n_delta += 1
            want = m.get("n_new_urls", m.get("n_enqueued"))
            assert info["rows"] == want, (
                f"round {r['round']}: delta rows {info['rows']} != fresh {want}"
            )
        else:
            n_full += 1
    assert n_delta > 0, "TTL rounds must commit seen deltas"
    # full commits only at the seed round + rotation fold slots — a bounded
    # fraction, not every round (the old behavior was n_full == len(rounds))
    assert n_full < len(rounds) / 2


def test_floor_advances_every_active_round(engine):
    rounds = engine.store.manifest()["rounds"]
    floors = [
        (r["round"], r["floors"]["seen"])
        for r in rounds
        if "floors" in r and "seen" in r["floors"]
    ]
    assert floors, "active TTL rounds must declare the seen floor"
    for rno, (col, val) in floors:
        assert col == "seen_round" and val == rno - TTL


def test_floored_read_equals_window_at_every_round(engine):
    """read()/read_at() must reproduce exactly what the old per-round full
    rewrite materialized: rows with seen_round >= r - TTL as of each round
    that declared a floor."""
    spark = engine.spark
    store = engine.store
    rounds = store.manifest()["rounds"]
    # live read
    live = store.read(spark, "seen")
    latest_floor = max(
        r["floors"]["seen"][1] for r in rounds if "floors" in r
    )
    assert live.filter(F.col("seen_round") < latest_floor).count() == 0
    # raw chain (floor-off read via table_paths) holds MORE than the window
    raw = spark.read.option("mergeSchema", "true").parquet(
        *store.table_paths("seen")
    )
    assert raw.count() >= live.count()
    # time travel: floor as of each round
    checked = 0
    for r in rounds:
        if "floors" not in r or "seen" not in r["floors"]:
            continue
        at = store.read_at(spark, "seen", r["round"])
        floor_then = r["floors"]["seen"][1]
        assert at.filter(F.col("seen_round") < floor_then).count() == 0
        checked += 1
        if checked >= 3:
            break
    assert checked > 0


def test_floor_prunes_chain_files(engine):
    """The floor is a manifest prune, not just a row filter: aged
    round-partition files must be skipped at planning time."""
    store = engine.store
    rounds = store.manifest()["rounds"]
    chain = store._live_chain(rounds, "seen")
    latest_floor = max(
        r["floors"]["seen"][1] for r in rounds if "floors" in r
    )
    kept, io = store._pruned_chain_paths(
        chain, [("seen_round", ">=", latest_floor)]
    )
    # the fixture runs enough rounds past the window that at least one
    # aged delta file is provably below the floor
    assert io["files_kept"] < io["files_total"], (
        f"floor pruned nothing: {io}"
    )


def test_floor_survives_expire_snapshots(engine, spark):
    """expire_snapshots dropping the declaring entries must hoist the
    latest floor to the manifest fallback — expired cohorts must not
    resurface."""
    store = engine.store
    before = store.read(spark, "seen").count()
    floors_before = [
        r["floors"]["seen"][1]
        for r in store.manifest()["rounds"]
        if "floors" in r and "seen" in r["floors"]
    ]
    store.expire_snapshots(keep_last=2)
    man = store.manifest()
    kept_declared = [
        r["floors"]["seen"][1]
        for r in man["rounds"]
        if "floors" in r and "seen" in r["floors"]
    ]
    if not kept_declared:
        assert man.get("floors", {}).get("seen") is not None
        assert man["floors"]["seen"][1] == max(floors_before[:-len(kept_declared) or None])
    after = store.read(spark, "seen")
    assert after.count() == before
    latest_floor = max(floors_before)
    assert after.filter(F.col("seen_round") < latest_floor).count() == 0
