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
    eng.run(seeds=seeds, max_rounds=4)

    before = {t: _table_rows(spark, eng.store, t)
              for t in ("frontier", "seen", "pages", "dlq", "fetch_log")}
    n_rounds_before = len(eng.store.manifest()["rounds"])
    assert n_rounds_before > 2

    stats = eng.store.expire_snapshots(keep_last=2)
    assert stats["removed_dirs"] > 0 and stats["kept_rounds"] == 2

    # live state identical after expiry
    for t, rows in before.items():
        assert _table_rows(spark, eng.store, t) == rows, f"{t} changed"
    # expired snap dirs actually gone
    snap0 = os.path.join(eng.store.root, "pages", "snap-00000")
    # (round 0 wrote pages; only relevant if it is outside the kept window)
    if n_rounds_before - 2 > 1:
        assert not os.path.isdir(snap0)

    # the engine resumes and completes on the expired store
    out = eng.run(max_rounds=6)
    assert out, "resume after expiry must run"
