"""Merge-on-read tombstone deltas for the TTL-mode filter blob store.

TTL retirement used to rewrite every shard's full filter in place each round
(the one remaining per-round write that scaled with the active window). Now a
TTL round appends an immutable delta element — this round's fresh keys as
bloom/cuckoo/exact files plus the expiring cohort as `tomb-<s>` tombstone
pair files — and the probe walks the chain newest-first, first event wins.
Gates here: (1) probe semantics over an add/tombstone/re-add chain, (2) the
byte gate — a TTL delta dir's exact bytes == 16 B x fresh keys and tombstone
bytes == 16 B x expiring cohort, never the window, (3) the engine's TTL
rounds commit chains whose per-round write is cohort-sized while remaining
bit-identical to the simulator (covered by test_seen_ttl.py, re-asserted
here on chain shape).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.seenset import (
    probe_seen_files,
    update_seen_shards,
)

N = 4  # shards


def _df(spark, ids, tag="t"):
    return spark.createDataFrame(
        [(f"h{i % 5}.{tag}.go.id", f"{i:064x}") for i in ids],
        "host string, url_hash string",
    )


class TestTombstoneProbe:
    @pytest.fixture(scope="class")
    def ttl_chain(self, spark, tmp_path_factory):
        """base: keys 0-99; delta1: adds 100-119, tombstones 0-9;
        delta2: re-adds 0-4 (expired keys rediscovered), tombstones 50-59."""
        root = tmp_path_factory.mktemp("ttlchain")
        base = str(root / "base")
        update_seen_shards(
            _df(spark, range(100)), blob_dir=None, n_shards=N,
            out_dir=base, with_exact=True,
        ).collect()
        d1 = str(root / "d1")
        update_seen_shards(
            _df(spark, range(100, 120)), blob_dir=None,
            deletes=_df(spark, range(10)), n_shards=N, out_dir=d1,
            with_exact=True, delta_build=True,
        ).collect()
        d2 = str(root / "d2")
        update_seen_shards(
            _df(spark, range(5)), blob_dir=None,
            deletes=_df(spark, range(50, 60)), n_shards=N, out_dir=d2,
            with_exact=True, delta_build=True,
        ).collect()
        return [base, d1, d2]

    def _probe(self, spark, chain, ids):
        probed = probe_seen_files(
            _df(spark, ids), chain, n_shards=N, exact=True
        )
        return {r.url_hash: r.maybe_seen for r in probed.collect()}

    def test_newest_event_wins(self, spark, ttl_chain):
        got = self._probe(spark, ttl_chain, range(130))
        for i in range(130):
            h = f"{i:064x}"
            if i < 5:
                # tombstoned in d1, re-added in d2 -> newest event is an add
                assert got[h], f"re-added key {i} must probe seen"
            elif i < 10:
                # tombstoned in d1, never re-added
                assert not got[h], f"expired key {i} must probe unseen"
            elif 50 <= i < 60:
                # tombstoned in d2 (the newest element)
                assert not got[h], f"expired key {i} must probe unseen"
            elif i < 120:
                assert got[h], f"live key {i} must probe seen"
            else:
                assert not got[h], f"never-added key {i} must probe unseen"

    def test_tombstones_only_affect_exact_mode(self, spark, ttl_chain):
        """Non-exact probes ignore tombstones (they need the pair identity);
        an expired key may probe maybe_seen=True, which the non-exact
        pipeline resolves via its anti-join against the active seen table —
        conservative, never a false negative."""
        probed = probe_seen_files(
            _df(spark, range(10)), ttl_chain, n_shards=N, layer="bloom"
        )
        # every one of these keys is in the base bloom, so the filter-only
        # verdict is (correctly, conservatively) all-True
        assert all(r.maybe_seen for r in probed.collect())

    def test_tombstone_requires_exact(self, spark, tmp_path):
        with pytest.raises(ValueError, match="requires with_exact"):
            update_seen_shards(
                _df(spark, range(5)), blob_dir=None,
                deletes=_df(spark, range(5, 8)), n_shards=N,
                out_dir=str(tmp_path / "x"), with_exact=False,
                delta_build=True,
            )

    def test_delta_build_refuses_blob_dir(self, spark, ttl_chain, tmp_path):
        with pytest.raises(ValueError, match="immutable"):
            update_seen_shards(
                _df(spark, range(5)), blob_dir=ttl_chain[0],
                deletes=_df(spark, range(5, 8)), n_shards=N,
                out_dir=str(tmp_path / "x"), with_exact=True,
                delta_build=True,
            )


class TestTTLByteGate:
    TTL = 2
    ROUNDS = 10

    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        from crawler_spark.engine.corpus import (
            CorpusSpec,
            build_corpus,
            robots_map,
            seed_urls,
        )
        from crawler_spark.engine.superstep import CrawlEngine

        spec = CorpusSpec(
            n_hosts=2, listing_pages=3, details_per_page=3, hosts_with_robots=0
        )
        eng = CrawlEngine(
            spark, str(tmp_path_factory.mktemp("ttlbytes")),
            build_corpus(spec), robots_map(spec), per_host_budget=3,
            ttl_rounds=self.TTL,
        )
        eng.run(seeds=seed_urls(spec), max_rounds=self.ROUNDS)
        return eng

    def test_ttl_rounds_append_chain_elements(self, engine):
        rounds = engine.store.manifest()["rounds"]
        chains = [r["blob_chain"] for r in rounds if r.get("blob_chain")]
        assert chains
        # up to two elements per round (staggered cohort fold + delta),
        # trimmed back to full marker coverage — see test_seen_chain
        assert all(len(c) <= 2 * engine.REBUILD_EVERY for c in chains)
        # TTL delta mode actually exercised (chain grew past the base)
        assert any(len(c) > 1 for c in chains), (
            "TTL rounds must append delta elements, not rewrite in place"
        )

    def test_delta_bytes_are_round_sized_never_window_sized(self, engine):
        """The byte gate: a TTL delta dir's exact pair bytes == 16 B x the
        round's fresh keys and its tombstone bytes == 16 B x the cohort
        that expired that round (== fresh keys of round r - TTL) — the
        old in-place rewrite wrote the FULL window-sized filter + pair
        files every round."""
        rounds = {r["round"]: r for r in engine.store.manifest()["rounds"]}
        checked = 0
        for rno, r in rounds.items():
            chain = r.get("blob_chain") or []
            if len(chain) <= 1 or not r.get("blob_dir"):
                continue  # compaction base or no-write round
            assert r["blob_dir"] == chain[-1]
            add_pairs = tomb_pairs = 0
            for f in os.listdir(r["blob_dir"]):
                p = os.path.join(r["blob_dir"], f)
                if f.startswith("exact-"):
                    add_pairs += (os.path.getsize(p) - 12) // 16
                elif f.startswith("tomb-"):
                    tomb_pairs += (os.path.getsize(p) - 12) // 16
            m = r["metrics"]
            n_new = m.get("n_new_urls", m.get("n_enqueued", 0))
            assert add_pairs == n_new, (
                f"round {rno}: delta exact pairs {add_pairs} != fresh {n_new}"
            )
            prev = rounds.get(rno - self.TTL)
            if prev is not None and "n_new_urls" in prev.get("metrics", {}):
                want = prev["metrics"]["n_new_urls"]
                assert tomb_pairs == want, (
                    f"round {rno}: tombstones {tomb_pairs} != expiring "
                    f"cohort {want} (round {rno - self.TTL} fresh keys)"
                )
            checked += 1
        assert checked > 0, "no TTL delta rounds to check"

    def test_chain_probe_matches_active_window(self, engine):
        """Membership through the tombstone chain == the active seen window,
        exactly — for both present and absent verdicts."""
        from crawler_spark.engine.superstep import N_SHARDS

        spark = engine.spark
        seen = engine.store.read(spark, "seen")
        latest = engine.store.latest_round()
        active = seen.filter(
            F.col("seen_round") >= latest + 1 - self.TTL
        )
        expired = seen.filter(
            F.col("seen_round") < latest + 1 - self.TTL
        )
        chain = engine.store.latest_blob_chain()
        probed = probe_seen_files(
            seen.select("host", "url_hash"), chain, n_shards=N_SHARDS,
            layer="cuckoo", exact=True,
        )
        seen_hashes = {
            r.url_hash
            for r in probed.filter(F.col("maybe_seen")).collect()
        }
        want = {r.url_hash for r in active.collect()}
        # an expired URL re-added later appears in both frames under two
        # seen_round values; membership is decided by the ACTIVE row
        lost = {r.url_hash for r in expired.collect()} - want
        assert seen_hashes == want
        assert not (seen_hashes & lost)
