"""Write-audit-publish (WAP) gates: a staged commit is invisible to every
committed reader until published; a dropped audit leaves the store
indistinguishable from one where the round never ran (dirs reclaimed, the
round re-runs cleanly); an audited crawl whose gates all pass is identical
to an unaudited one. The Iceberg `spark.wap.branch` + cherry-pick workflow
over the SnapshotStore's manifest machinery.
"""

from __future__ import annotations

import os

import pytest

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    robots_map,
    seed_urls,
)
from crawler_spark.engine.snapshots import SnapshotStore
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=2, details_per_page=3, hosts_with_robots=1)
BUDGET = 4
MAX_ROUNDS = 10

TABLES = ["frontier", "seen", "pages", "dlq", "fetch_log", "retry_history"]


def rows(df):
    if df is None:
        return []
    return sorted(map(tuple, df.collect()), key=repr)


def final_state(spark, eng):
    return {t: rows(eng.store.read(spark, t)) for t in TABLES}


@pytest.fixture(scope="module")
def corpus():
    return build_corpus(SPEC)


@pytest.fixture(scope="module")
def robots():
    return robots_map(SPEC)


class TestStoreWAP:
    def test_staged_invisible_then_published(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "s"))
        df0 = spark.createDataFrame([(1, "a")], "id int, v string")
        store.commit_round(0, {"t": df0})
        df1 = spark.createDataFrame([(2, "b")], "id int, v string")
        entry = store.commit_round(
            1, {"t": df0.unionByName(df1)}, branch="audit"
        )
        # committed readers: unchanged
        assert store.latest_round() == 0
        assert rows(store.read(spark, "t")) == [(1, "a")]
        # audit reader: sees the staged state
        assert rows(store.read_staged(spark, "t")) == [(1, "a"), (2, "b")]
        assert store.staged_entry()["round"] == 1
        published = store.publish_branch()
        assert published["round"] == entry["round"] == 1
        assert store.latest_round() == 1
        assert rows(store.read(spark, "t")) == [(1, "a"), (2, "b")]
        assert store.staged_entry() is None
        # publish is one manifest flip: history carries the staged entry
        assert [r["round"] for r in store.manifest()["rounds"]] == [0, 1]

    def test_drop_branch_reclaims_dirs_and_restores_manifest(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "s"))
        df0 = spark.createDataFrame([(1, "a")], "id int, v string")
        store.commit_round(0, {"t": df0})
        man_before = store.manifest()
        store.commit_round(1, {"t": df0}, branch="audit")
        own = [
            info["path"] for info in store.staged_entry()["tables"].values()
        ]
        assert all(os.path.isdir(p) for p in own)
        out = store.drop_branch()
        assert out["removed_dirs"] == len(own)
        assert not any(os.path.isdir(p) for p in own)
        # manifest back to the pre-stage state; committed data untouched
        assert store.manifest() == man_before
        assert rows(store.read(spark, "t")) == [(1, "a")]

    def test_restaging_releases_the_superseded_entry(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "s"))
        df0 = spark.createDataFrame([(1, "a")], "id int, v string")
        store.commit_round(0, {"t": df0})
        store.commit_round(1, {"t": df0}, branch="audit")
        p_old = store.staged_entry()["tables"]["t"]["path"]
        # a different round number stages into a different dir — the old
        # staged dir must not leak
        store.commit_round(2, {"t": df0}, branch="audit")
        assert not os.path.isdir(p_old)
        assert store.staged_entry()["round"] == 2
        # same-round restage overwrites the dir in place and must NOT
        # delete what it just wrote
        p_new = store.staged_entry()["tables"]["t"]["path"]
        store.commit_round(2, {"t": df0}, branch="audit")
        assert os.path.isdir(p_new)
        assert rows(store.read_staged(spark, "t")) == [(1, "a")]
        store.drop_branch()

    def test_missing_branch_contract(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "s"))
        with pytest.raises(KeyError):
            store.publish_branch("audit")
        with pytest.raises(KeyError):
            store.drop_branch("audit")
        assert store.drop_branch("audit", missing_ok=True)["removed_dirs"] == 0
        with pytest.raises(KeyError):
            store.read_staged(spark, "t")

    def test_expiry_keeps_staged_dirs_alive(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "s"))
        df = spark.createDataFrame([(1, "a")], "id int, v string")
        for rnd in range(4):
            store.commit_round(rnd, {"t": df})
        store.commit_round(4, {"t": df}, branch="audit")
        own = [
            info["path"] for info in store.staged_entry()["tables"].values()
        ]
        store.expire_snapshots(keep_last=2)
        assert all(os.path.isdir(p) for p in own)
        assert rows(store.read_staged(spark, "t")) == [(1, "a")]
        store.publish_branch()
        assert store.latest_round() == 4


class _FakeEngine:
    """Gates only touch engine.spark and engine.store."""

    def __init__(self, spark, store):
        self.spark = spark
        self.store = store


class TestAuditGates:
    def test_duplicate_rate_gate_thresholds(self, spark, tmp_path):
        from crawler_spark.engine.audits import duplicate_rate_gate

        store = SnapshotStore(str(tmp_path / "s"))
        store.commit_round(0, {"pages": spark.createDataFrame(
            [], "url_hash string, content_sha256 string, fetched_round int")})
        # round 1: 4 pages, 2 distinct hashes -> dup ratio 0.5
        staged = spark.createDataFrame(
            [("u1", "h1", 1), ("u2", "h1", 1), ("u3", "h2", 1), ("u4", "h2", 1)],
            "url_hash string, content_sha256 string, fetched_round int",
        )
        store.commit_round(1, {"pages": staged}, branch="audit")
        eng = _FakeEngine(spark, store)
        assert duplicate_rate_gate(0.5)(eng, 1) is True
        assert duplicate_rate_gate(0.49)(eng, 1) is False
        # other rounds' rows never count against this round
        assert duplicate_rate_gate(0.0)(eng, 2) is True
        store.drop_branch()

    def test_monotonic_tables_gate(self, spark, tmp_path):
        from crawler_spark.engine.audits import monotonic_tables_gate

        store = SnapshotStore(str(tmp_path / "s"))
        df3 = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "url_hash string")
        store.commit_round(0, {"seen": df3})
        eng = _FakeEngine(spark, store)
        # a full staged snapshot that LOST rows is vetoed
        store.commit_round(
            1, {"seen": df3.limit(1)}, branch="audit")
        assert monotonic_tables_gate()(eng, 1) is False
        # a growing full snapshot passes; a delta always passes
        store.commit_round(
            1, {"seen": df3.unionByName(
                spark.createDataFrame([("d",)], "url_hash string"))},
            branch="audit")
        assert monotonic_tables_gate()(eng, 1) is True
        store.commit_round(
            1, {}, delta_tables={"seen": df3.limit(1)}, branch="audit")
        assert monotonic_tables_gate()(eng, 1) is True
        store.drop_branch()

    def test_span_sample_gate(self, spark, tmp_path):
        from crawler_spark.engine.audits import span_sample_gate
        from crawler_spark.kernels.htmlparse import extract_page

        html = "<html><title>t</title><body><p>hello world</p>" \
               "<img src='x.png'><p>bye</p></body></html>"
        good = extract_page(html)["spans"]
        bad = [(k, t + "!corrupt" if k == "text" and t else t, m, o)
               for (k, t, m, o) in good]
        schema = (
            "url_hash string, raw_html string,"
            " spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
            " fetched_round int"
        )
        store = SnapshotStore(str(tmp_path / "s"))
        store.commit_round(0, {"pages": spark.createDataFrame([], schema)})
        eng = _FakeEngine(spark, store)
        store.commit_round(
            1, {"pages": spark.createDataFrame([("u1", html, good, 1)], schema)},
            branch="audit")
        assert span_sample_gate()(eng, 1) is True
        store.commit_round(
            1, {"pages": spark.createDataFrame([("u1", html, bad, 1)], schema)},
            branch="audit")
        assert span_sample_gate()(eng, 1) is False
        store.drop_branch()

    def test_standard_gates_pass_on_a_real_round(
        self, spark, corpus, robots, tmp_path
    ):
        from crawler_spark.engine.audits import (
            all_of,
            duplicate_rate_gate,
            monotonic_tables_gate,
            span_sample_gate,
        )

        eng = CrawlEngine(
            spark, str(tmp_path / "gated"), corpus, robots,
            per_host_budget=BUDGET,
        )
        eng.init_frontier(seed_urls(SPEC))
        gate = all_of(
            monotonic_tables_gate(), duplicate_rate_gate(1.0), span_sample_gate()
        )
        m0 = eng.run_round_audited(0, gate)
        m1 = eng.run_round_audited(1, gate)
        assert m0["published"] and m1["published"]
        assert eng.store.latest_round() == 1


class TestEngineWAP:
    def test_audited_crawl_equals_unaudited(self, spark, corpus, robots, tmp_path):
        ctrl = CrawlEngine(
            spark, str(tmp_path / "ctrl"), corpus, robots, per_host_budget=BUDGET
        )
        ctrl.run(seeds=seed_urls(SPEC), max_rounds=MAX_ROUNDS)

        aud = CrawlEngine(
            spark, str(tmp_path / "aud"), corpus, robots, per_host_budget=BUDGET
        )
        aud.init_frontier(seed_urls(SPEC))
        audits = 0

        def gate(engine, rnd):
            nonlocal audits
            audits += 1
            # the audit half must see the STAGED state: the append-only
            # fetch_log as-if-published is a superset of the committed one
            staged = engine.store.read_staged(engine.spark, "fetch_log")
            committed = engine.store.read(engine.spark, "fetch_log")
            n_staged = staged.count() if staged is not None else 0
            n_committed = committed.count() if committed is not None else 0
            assert n_staged >= n_committed
            return True

        for rnd in range(MAX_ROUNDS):
            m = aud.run_round_audited(rnd, gate)
            assert m["published"] is True
            if m.get("done"):
                break
        assert audits > 0
        assert final_state(spark, ctrl) == final_state(spark, aud)
        assert ctrl.crawl_order() == aud.crawl_order()
        assert ctrl.seen_set() == aud.seen_set()

    def test_failed_gate_leaves_store_unchanged_and_round_reruns(
        self, spark, corpus, robots, tmp_path
    ):
        eng = CrawlEngine(
            spark, str(tmp_path / "wapfail"), corpus, robots,
            per_host_budget=BUDGET,
        )
        eng.init_frontier(seed_urls(SPEC))
        eng.run_round(0)
        before = final_state(spark, eng)
        latest = eng.store.latest_round()
        blob_before = eng.store.latest_blob_chain()

        m = eng.run_round_audited(1, lambda e, r: False)
        assert m["published"] is False
        # the store is byte-identical to the pre-round state
        assert eng.store.latest_round() == latest
        assert eng.store.staged_entry() is None
        assert final_state(spark, eng) == before
        assert eng.store.latest_blob_chain() == blob_before

        # after the (hypothetical) fix, the SAME round re-runs and publishes
        m2 = eng.run_round_audited(1, lambda e, r: True)
        assert m2["published"] is True
        assert eng.store.latest_round() == 1
        # and the crawl continues to drain normally afterwards
        out = eng.run(max_rounds=MAX_ROUNDS)
        assert out[-1].get("done")

    def test_run_loop_stops_on_veto_and_resumes(
        self, spark, corpus, robots, tmp_path
    ):
        eng = CrawlEngine(
            spark, str(tmp_path / "waploop"), corpus, robots,
            per_host_budget=BUDGET,
        )
        veto_round = 1

        def gate(engine, rnd):
            return rnd != veto_round

        out = eng.run(
            seeds=seed_urls(SPEC), max_rounds=MAX_ROUNDS, audit_gate=gate
        )
        # the loop stopped AT the vetoed round, which was rolled back
        assert out[-1]["published"] is False
        assert out[-1]["round"] == veto_round
        assert eng.store.latest_round() == veto_round - 1
        # a later gated run resumes at the vetoed round and drains
        out2 = eng.run(max_rounds=MAX_ROUNDS, audit_gate=lambda e, r: True)
        assert out2[0]["round"] == veto_round
        assert all(m["published"] for m in out2)
        assert out2[-1].get("done")


class TestWAPRegressions:
    """Round-3 review fixes: staging must never clobber committed rounds, the
    monotonic gate must not dead-lock TTL crawls, and a vetoed round must not
    leak fetch events to the streaming log feed."""

    def test_staging_a_committed_round_is_rejected(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "s"))
        df = spark.createDataFrame([(1, "a")], "id int, v string")
        store.commit_round(0, {"t": df})
        store.commit_round(1, {"t": df})
        p = store.manifest()["rounds"][-1]["tables"]["t"]["path"]
        # data paths are keyed by round number only: staging round 1 again
        # would overwrite the COMMITTED round-1 dirs before any gate runs
        with pytest.raises(ValueError):
            store.commit_round(1, {"t": df.limit(0)}, branch="audit")
        assert store.staged_entry() is None
        assert os.path.isdir(p)
        assert rows(store.read(spark, "t")) == [(1, "a")]

    def test_monotonic_gate_allows_ttl_seen_shrink(self, spark, tmp_path):
        from crawler_spark.engine.audits import monotonic_tables_gate

        store = SnapshotStore(str(tmp_path / "s"))
        df3 = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "url_hash string")
        log3 = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "url_hash string")
        store.commit_round(0, {"seen": df3, "fetch_log": log3})
        eng = _FakeEngine(spark, store)
        # a shrinking 'seen' under TTL is cohort retirement, not data loss
        store.commit_round(
            1, {"seen": df3.limit(1), "fetch_log": log3}, branch="audit")
        assert monotonic_tables_gate()(eng, 1) is False  # no TTL -> veto
        eng.ttl_rounds = 2
        assert monotonic_tables_gate()(eng, 1) is True  # TTL -> by design
        # the append-only tables stay enforced even under TTL
        store.commit_round(
            1, {"seen": df3, "fetch_log": log3.limit(1)}, branch="audit")
        assert monotonic_tables_gate()(eng, 1) is False
        store.drop_branch()

    def test_vetoed_round_publishes_no_log_feed(
        self, spark, corpus, robots, tmp_path
    ):
        eng = CrawlEngine(
            spark, str(tmp_path / "feedwap"), corpus, robots,
            per_host_budget=BUDGET, log_feed=True,
        )
        eng.init_frontier(seed_urls(SPEC))
        m = eng.run_round_audited(0, lambda e, r: False)
        assert m["published"] is False
        assert m["n_fetched"] > 0
        feed = os.path.join(eng.store.root, "_logfeed", "feed-00000")
        staged = os.path.join(eng.store.root, "_logfeed_staging", "feed-00000")
        # nothing for the streaming consumer, and no staging residue either
        assert not os.path.isdir(feed)
        assert not os.path.isdir(staged)
        # the re-run publishes the feed exactly once, with the round's rows
        m2 = eng.run_round_audited(0, lambda e, r: True)
        assert m2["published"] is True
        assert not os.path.isdir(staged)
        assert spark.read.parquet(feed).count() == m2["n_fetched"]

    def test_audited_rerun_of_committed_round_refused_before_any_io(
        self, spark, corpus, robots, tmp_path
    ):
        eng = CrawlEngine(
            spark, str(tmp_path / "rerun"), corpus, robots,
            per_host_budget=BUDGET,
        )
        eng.init_frontier(seed_urls(SPEC))
        eng.run_round(0)
        before = final_state(spark, eng)
        blob_before = eng.store.latest_blob_chain()
        # round 0 is committed: the audited path must refuse up front —
        # _run_round writes blob shards to blob_dir_for(0) BEFORE the staged
        # commit, so a late (commit-time) guard would already have clobbered
        # the committed round's filter state
        with pytest.raises(ValueError):
            eng.run_round_audited(0, lambda e, r: True)
        assert final_state(spark, eng) == before
        assert eng.store.latest_blob_chain() == blob_before
        assert eng.store.staged_entry() is None

    def test_orphaned_staged_feeds_are_reconciled(
        self, spark, corpus, robots, tmp_path
    ):
        import shutil

        eng = CrawlEngine(
            spark, str(tmp_path / "reconcile"), corpus, robots,
            per_host_budget=BUDGET, log_feed=True,
        )
        eng.init_frontier(seed_urls(SPEC))
        eng.run_round_audited(0, lambda e, r: True)
        staging = os.path.join(eng.store.root, "_logfeed_staging")
        feeds = os.path.join(eng.store.root, "_logfeed")
        # simulate a crash between publish_branch and the feed promotion:
        # round 0 is committed but its feed still sits in staging
        shutil.move(os.path.join(feeds, "feed-00000"),
                    os.path.join(staging, "feed-00000"))
        # and a crash between a veto's manifest flip and its cleanup: a
        # staged feed for a round that was never committed
        shutil.copytree(os.path.join(staging, "feed-00000"),
                        os.path.join(staging, "feed-00099"))
        eng.run_round_audited(1, lambda e, r: True)
        # committed round's feed was promoted, the vetoed residue deleted
        assert os.path.isdir(os.path.join(feeds, "feed-00000"))
        assert not os.path.isdir(os.path.join(staging, "feed-00000"))
        assert not os.path.isdir(os.path.join(staging, "feed-00099"))
