"""Merge-on-read blob chains for the seen-set filter store.

Permanent-membership rounds append a DELTA blob dir (this round's fresh keys
only) instead of rewriting every shard's full filter — per-round blob IO is
O(delta), matching the parquet tables' fast-append commits. Probe membership
is the OR across chain elements; the REBUILD_EVERY compaction bounds chain
length and probe fan-in. Gates here: chain probe == union membership, the
pipeline over a chain == a plain anti-join, the engine bounds its chains and
writes delta-sized dirs, and snapshot expiry keeps every dir of the newest
chain alive (a partial chain would read as authoritative membership missing
rounds' keys).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.seenset import (
    probe_seen_files,
    seen_filter_pipeline_files,
    update_seen_shards,
)

N = 4  # shards


def _df(spark, lo, hi, tag):
    return spark.createDataFrame(
        [(f"h{i % 5}.{tag}.go.id", f"{i:064x}") for i in range(lo, hi)],
        "host string, url_hash string",
    )


def _dir_bytes(d):
    return sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
    )


@pytest.fixture(scope="module")
def chain_store(spark, tmp_path_factory):
    """Base (500 keys) + two deltas (40, 25 keys), disjoint by construction."""
    root = tmp_path_factory.mktemp("chain")
    dirs = []
    for i, (lo, hi) in enumerate([(0, 500), (500, 540), (540, 565)]):
        d = str(root / f"snap-{i}")
        update_seen_shards(
            _df(spark, lo, hi, "a"), blob_dir=None, n_shards=N,
            out_dir=d, with_exact=True,
        ).collect()
        dirs.append(d)
    return dirs


class TestChainProbe:
    def test_chain_membership_is_union(self, spark, chain_store):
        members = _df(spark, 0, 565, "a")
        outsiders = _df(spark, 565, 700, "a")
        probed = probe_seen_files(
            members.unionByName(outsiders), chain_store, n_shards=N, exact=True
        )
        got = {r.url_hash: r.maybe_seen for r in probed.collect()}
        want = {r.url_hash for r in members.collect()}
        assert {h for h, s in got.items() if s} == want

    def test_single_dir_still_accepted_as_str(self, spark, chain_store):
        base_only = probe_seen_files(
            _df(spark, 500, 540, "a"), chain_store[0], n_shards=N, exact=True
        )
        assert base_only.filter(F.col("maybe_seen")).count() == 0

    def test_pipeline_chain_equals_antijoin(self, spark, chain_store):
        seen = _df(spark, 0, 565, "a")
        cands = _df(spark, 520, 650, "a")
        out = seen_filter_pipeline_files(
            cands, seen, chain_store, n_shards=N,
            seen_unique=True, exact_files=True,
        )
        expect = cands.join(seen.select("url_hash"), "url_hash", "left_anti")
        assert sorted(r.url_hash for r in out.collect()) == sorted(
            r.url_hash for r in expect.collect()
        )

    def test_layer_missing_in_element_raises(self, spark, tmp_path):
        """A chain element lacking the probed layer must fail loudly — a
        silent skip would be a false negative for that element's keys."""
        d0 = str(tmp_path / "full")
        d1 = str(tmp_path / "bloomonly")
        update_seen_shards(
            _df(spark, 0, 50, "b"), blob_dir=None, n_shards=N,
            out_dir=d0, with_cuckoo=True,
        ).collect()
        update_seen_shards(
            _df(spark, 50, 80, "b"), blob_dir=None, n_shards=N,
            out_dir=d1, with_cuckoo=False,
        ).collect()
        with pytest.raises(Exception, match="cuckoo-.*missing"):
            probe_seen_files(
                _df(spark, 0, 80, "b"), [d0, d1], n_shards=N, layer="cuckoo"
            ).collect()


class TestEngineChains:
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
            n_hosts=4, listing_pages=4, details_per_page=5, hosts_with_robots=2
        )
        eng = CrawlEngine(
            spark, str(tmp_path_factory.mktemp("store")),
            build_corpus(spec), robots_map(spec), per_host_budget=6,
        )
        eng.run(seeds=seed_urls(spec), max_rounds=12)
        return eng

    def test_chains_present_and_bounded(self, engine):
        rounds = engine.store.manifest()["rounds"]
        chains = [r["blob_chain"] for r in rounds if r.get("blob_chain")]
        assert chains, "no chain commits recorded"
        # staggered folding appends up to TWO elements per round (cohort
        # fold + delta) and trim_blob_chain keeps elements back to full
        # marker coverage, so the steady-state bound is 2*REBUILD_EVERY —
        # the fan-in the probe-flatness bench measured flat
        assert all(len(c) <= 2 * engine.REBUILD_EVERY for c in chains)
        # delta mode actually exercised (some chain grew past the base)
        assert any(len(c) > 1 for c in chains)
        # the staggered fold actually trims: late chains must not retain
        # the bootstrap base once cohort folds cover every shard
        base = chains[0][0]
        assert any(base not in c for c in chains[-3:]), (
            "trim never dropped the bootstrap base — fold coverage broken"
        )

    def test_delta_dirs_hold_only_the_rounds_fresh_keys(self, engine):
        """Per-round blob bytes scale with the round's fresh keys, not the
        corpus. The bloom/cuckoo layers carry fixture-irrelevant minimum-
        capacity floors, but the exact pair files are floor-free (12-byte
        header + 16 B/key), so a delta dir's exact bytes are an EXACT
        measure of what the round wrote: sum over shards must equal that
        round's n_new_urls — not the corpus size."""
        rounds = engine.store.manifest()["rounds"]
        checked = 0
        for r in rounds:
            chain = r.get("blob_chain") or []
            if len(chain) <= 1 or not r.get("blob_dir"):
                continue  # base/full-rebuild or no-write round
            assert r["blob_dir"] == chain[-1]
            pairs = 0
            for f in os.listdir(r["blob_dir"]):
                if f.startswith("exact-"):
                    pairs += (
                        os.path.getsize(os.path.join(r["blob_dir"], f)) - 12
                    ) // 16
            m = r["metrics"]
            assert pairs == m.get("n_new_urls", m.get("n_enqueued"))
            checked += 1
        assert checked > 0, "no delta-mode rounds to check"

    def test_delta_write_is_corpus_size_independent(self, spark, tmp_path):
        """Direct scale check above the capacity floors: appending 1k keys
        to a 60k-key base writes an order of magnitude fewer bytes than the
        base did — the old in-place rewrite wrote MORE than the base every
        round (full filter + the delta)."""
        base_dir = str(tmp_path / "base")
        delta_dir = str(tmp_path / "delta")
        update_seen_shards(
            _df(spark, 0, 60_000, "c"), blob_dir=None, n_shards=N,
            out_dir=base_dir, with_exact=True,
        ).collect()
        update_seen_shards(
            _df(spark, 60_000, 61_000, "c"), blob_dir=None, n_shards=N,
            out_dir=delta_dir, with_exact=True,
        ).collect()
        assert _dir_bytes(delta_dir) * 10 < _dir_bytes(base_dir)

    def test_chain_probe_equals_seen_table(self, engine):
        from crawler_spark.engine.superstep import N_SHARDS

        seen = engine.store.read(engine.spark, "seen")
        chain = engine.store.latest_blob_chain()
        probed = probe_seen_files(
            seen.select("host", "url_hash"), chain, n_shards=N_SHARDS,
            exact=True,
        )
        assert probed.filter(~F.col("maybe_seen")).count() == 0

    def test_expiry_keeps_latest_chain_alive(self, engine):
        from crawler_spark.engine.superstep import N_SHARDS

        before = engine.store.latest_blob_chain()
        assert before is not None
        engine.store.expire_snapshots(keep_last=2)
        after = engine.store.latest_blob_chain()
        assert after is not None
        for d in after:
            assert os.path.isdir(d), f"expiry removed live chain element {d}"
        # membership still resolves to the full seen table
        seen = engine.store.read(engine.spark, "seen")
        probed = probe_seen_files(
            seen.select("host", "url_hash"), after, n_shards=N_SHARDS,
            exact=True,
        )
        assert probed.filter(~F.col("maybe_seen")).count() == 0
