"""SnapshotStore.rollback — Iceberg's rollback_to_snapshot over the delta/
merge-on-read chain model. Contract: after rollback(k) every table reads
exactly what read_at(k) read before; dropped rounds' dirs (and their log
feeds and staged branches) are reclaimed; the engine's run() then RESUMES
from k+1 and a re-run converges to the same final state as an uninterrupted
crawl (determinism is what makes rollback an operator tool, not data loss)."""

from __future__ import annotations

import os

import pytest

from crawler_spark.engine.corpus import (
    CorpusSpec, build_corpus, robots_map, seed_urls,
)
from crawler_spark.engine.snapshots import SnapshotStore
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=2, details_per_page=3,
                  hosts_with_robots=1)
TABLES = ("seen", "pages", "fetch_log", "dlq", "frontier")


def _mk(spark, r, n=20):
    return spark.createDataFrame(
        [(f"h-{r}-{i}", r) for i in range(n)],
        "url_hash string, round int",
    )


def _table_rows(spark, store, reader):
    out = {}
    for t in TABLES:
        df = reader(t)
        out[t] = sorted(map(tuple, df.collect())) if df is not None else None
    return out


class TestStoreRollback:
    @pytest.fixture()
    def store(self, spark, tmp_path):
        st = SnapshotStore(str(tmp_path / "rb"))
        st.commit_round(0, {"seen": _mk(spark, 0)}, row_hints={"seen": 20})
        for r in (1, 2, 3):
            st.commit_round(
                r, {}, delta_tables={"seen": _mk(spark, r)},
                row_hints={"seen": 20},
            )
        return st

    def test_rollback_equals_time_travel(self, spark, store):
        want = sorted(map(tuple, store.read_at(spark, "seen", 1).collect()))
        res = store.rollback(1)
        assert res["dropped_rounds"] == 2
        assert store.latest_round() == 1
        got = sorted(map(tuple, store.read(spark, "seen").collect()))
        assert got == want and len(got) == 40

    def test_dropped_dirs_reclaimed(self, spark, store):
        paths = [
            r["tables"]["seen"]["path"]
            for r in store.manifest()["rounds"]
            if r["round"] > 1
        ]
        store.rollback(1)
        for p in paths:
            assert not os.path.exists(p)
        # kept rounds' dirs intact
        for r in store.manifest()["rounds"]:
            assert os.path.isdir(r["tables"]["seen"]["path"])

    def test_rollback_to_latest_is_noop(self, store):
        assert store.rollback(3) == {
            "dropped_rounds": 0, "dirs_reclaimed": 0, "feeds": 0,
        }

    def test_rollback_drops_staged_branch(self, spark, store):
        store.commit_round(
            4, {}, delta_tables={"seen": _mk(spark, 4)},
            row_hints={"seen": 20}, branch="audit",
        )
        staged_path = store.staged_entry("audit")["tables"]["seen"]["path"]
        store.rollback(2)
        assert store.staged_entry("audit") is None
        assert not os.path.exists(staged_path)
        assert store.latest_round() == 2

    def test_noop_rollback_keeps_inflight_staged_branch(self, spark, store):
        # rollback-to-latest drops no history, so an in-flight audit's
        # staged commit must survive (review regression: it was destroyed)
        store.commit_round(
            4, {}, delta_tables={"seen": _mk(spark, 4)},
            row_hints={"seen": 20}, branch="audit",
        )
        assert store.rollback(3)["dropped_rounds"] == 0
        assert store.staged_entry("audit") is not None
        store.publish_branch("audit")
        assert store.latest_round() == 4

    def test_rollback_below_retention_raises(self, spark, store):
        store.expire_snapshots(keep_last=2)
        oldest = store.manifest()["rounds"][0]["round"]
        assert oldest > 0
        with pytest.raises(ValueError, match="retention"):
            store.rollback(oldest - 1)
        # rolling back TO the retention floor still works
        store.rollback(oldest)
        assert store.latest_round() == oldest


class TestEngineRollback:
    def test_resume_after_rollback_converges(self, spark, tmp_path):
        """Reference run vs rollback-and-rerun: drain a crawl, then on a
        second store drain it, roll back mid-history, run() again (resumes
        at the rolled-back round + 1) — final tables identical."""
        ref = CrawlEngine(
            spark, str(tmp_path / "ref"), build_corpus(SPEC),
            robots_map(SPEC), per_host_budget=4,
        )
        ref.run(seeds=seed_urls(SPEC), max_rounds=10)

        eng = CrawlEngine(
            spark, str(tmp_path / "rb"), build_corpus(SPEC),
            robots_map(SPEC), per_host_budget=4,
        )
        eng.run(seeds=seed_urls(SPEC), max_rounds=10)
        mid = (eng.store.latest_round() + 1) // 2
        eng.store.rollback(mid)
        assert eng.store.latest_round() == mid
        eng.run(max_rounds=10)  # resumes from mid + 1

        want = _table_rows(spark, ref.store,
                           lambda t: ref.store.read(spark, t))
        got = _table_rows(spark, eng.store,
                          lambda t: eng.store.read(spark, t))
        assert got == want
        assert eng.crawl_order() == ref.crawl_order()

    def test_rollback_removes_dropped_rounds_log_feeds(self, spark, tmp_path):
        eng = CrawlEngine(
            spark, str(tmp_path / "feeds"), build_corpus(SPEC),
            robots_map(SPEC), per_host_budget=4, log_feed=True,
        )
        eng.run(seeds=seed_urls(SPEC), max_rounds=10)
        last = eng.store.latest_round()
        feeds_dir = os.path.join(eng.store.root, "_logfeed")
        before = set(os.listdir(feeds_dir))
        mid = last // 2
        eng.store.rollback(mid)
        after = set(os.listdir(feeds_dir))
        dropped = {
            f"feed-{r:05d}" for r in range(mid + 1, last + 1)
        } & before
        assert dropped and not (dropped & after)
        assert after == before - dropped
