"""Membership kernels (bloom/cuckoo) + the sharded seen-set pipeline.

Gates: zero false negatives (a lost URL = lost crawl), FP rate within design
bounds, cuckoo delete (TTL expiry), round-trip serialization, and pipeline
equivalence with the plain exact anti-join.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.kernels.membership import BloomFilter, CuckooFilter

RNG = np.random.default_rng(42)


def _keys(n, offset=0):
    return (RNG.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
            + np.uint64(offset))


class TestBloom:
    def test_no_false_negatives(self):
        keys = _keys(50_000)
        f = BloomFilter.for_capacity(len(keys), bits_per_key=12)
        f.add_many(keys)
        assert f.contains_many(keys).all()

    def test_fp_rate_within_bounds(self):
        keys = _keys(50_000)
        f = BloomFilter.for_capacity(len(keys), bits_per_key=12)
        f.add_many(keys)
        probe = _keys(50_000) | np.uint64(1 << 62)  # disjoint-ish fresh keys
        fresh = probe[~np.isin(probe, keys)]
        fp = f.contains_many(fresh).mean()
        assert fp < 0.005, f"bloom FP rate {fp:.4%} exceeds design bound"

    def test_roundtrip(self):
        keys = _keys(1000)
        f = BloomFilter.for_capacity(1000)
        f.add_many(keys)
        g = BloomFilter.from_bytes(f.to_bytes())
        assert g.n_bits == f.n_bits and g.k == f.k and g.n_items == 1000
        assert g.contains_many(keys).all()

    def test_empty(self):
        f = BloomFilter.for_capacity(100)
        assert not f.contains_many(_keys(100)).any()
        assert len(f.contains_many(np.array([], dtype=np.uint64))) == 0


class TestCuckoo:
    def test_no_false_negatives(self):
        keys = _keys(20_000)
        f = CuckooFilter.for_capacity(len(keys))
        assert f.add_many(keys) == len(keys)
        assert f.contains_many(keys).all()

    def test_fp_rate(self):
        keys = _keys(20_000)
        f = CuckooFilter.for_capacity(len(keys))
        f.add_many(keys)
        fresh = _keys(20_000) | np.uint64(1 << 62)
        fresh = fresh[~np.isin(fresh, keys)]
        fp = f.contains_many(fresh).mean()
        assert fp < 0.01, f"cuckoo FP rate {fp:.4%}"

    def test_delete_restores_absence(self):
        keys = _keys(5000)
        f = CuckooFilter.for_capacity(8000)
        f.add_many(keys)
        expired, kept = keys[:2000], keys[2000:]
        assert f.delete_many(expired) == 2000
        assert f.contains_many(kept).all(), "delete must not disturb other keys"
        # expired keys may still FP-collide, but the vast majority are gone
        assert f.contains_many(expired).mean() < 0.02

    def test_roundtrip(self):
        keys = _keys(1000)
        f = CuckooFilter.for_capacity(2000)
        f.add_many(keys)
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert g.contains_many(keys).all()
        assert g.n_items == f.n_items

    def test_overfull_never_loses_inserted_keys(self):
        # ADVICE r01: MAX_KICKS eviction used to drop a previously-inserted
        # victim fingerprint -> false negatives. Now the homeless fp is
        # stashed in the victim slot and further inserts are refused, so a
        # key is either reported-refused or probes True forever.
        keys = _keys(2000)
        f = CuckooFilter(8)  # 32 slots, wildly over-full on purpose
        inserted = np.array(
            [k for k in keys if f.add_many(np.array([k], dtype=np.uint64)) == 1],
            dtype=np.uint64,
        )
        assert 0 < len(inserted) < len(keys)  # some refused, none silently lost
        assert f.contains_many(inserted).all()
        # the victim survives serialization too
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert g.contains_many(inserted).all()

    def test_victim_rehomed_after_delete(self):
        keys = _keys(2000)
        f = CuckooFilter(8)
        inserted = np.array(
            [k for k in keys if f.add_many(np.array([k], dtype=np.uint64)) == 1],
            dtype=np.uint64,
        )
        assert f.victim is not None
        # deleting table entries frees slots; the victim is re-inserted and
        # every remaining key still probes True
        f.delete_many(inserted[:4])
        assert f.contains_many(inserted[4:]).all()


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        (f"host{i % 20}.go.id", f"{i:064x}", i) for i in range(4000)
    ]
    return spark.createDataFrame(rows, "host string, url_hash string, ord long")


class TestSeenSetPipeline:
    def test_pipeline_equals_exact_antijoin(self, spark, frontier):
        from crawler_spark.operators.seenset import (
            build_seen_shards,
            collect_shard_blobs,
            seen_filter_pipeline,
        )

        seen = frontier.filter(F.col("ord") % 3 == 0).select("host", "url_hash")
        shards = build_seen_shards(seen, n_shards=8)
        blobs = collect_shard_blobs(shards, "bloom")
        got = seen_filter_pipeline(frontier, seen, blobs, n_shards=8)
        expect = frontier.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")
        assert sorted(r.url_hash for r in got.collect()) == sorted(
            r.url_hash for r in expect.collect()
        )

    def test_probe_layers_agree(self, spark, frontier):
        from crawler_spark.operators.seenset import (
            build_seen_shards,
            collect_shard_blobs,
            probe_seen,
        )

        seen = frontier.filter(F.col("ord") % 3 == 0)
        shards = build_seen_shards(seen, n_shards=8, with_cuckoo=True)
        for layer in ("bloom", "cuckoo"):
            blobs = collect_shard_blobs(shards, layer)
            probed = probe_seen(frontier, blobs, n_shards=8)
            # every truly-seen row must probe True (no false negatives)
            missed = probed.filter((F.col("ord") % 3 == 0) & ~F.col("maybe_seen")).count()
            assert missed == 0, f"{layer}: {missed} false negatives"

    def test_shard_count_and_sizes(self, spark, frontier):
        from crawler_spark.operators.seenset import build_seen_shards

        shards = build_seen_shards(frontier, n_shards=8).collect()
        assert 0 < len(shards) <= 8
        assert sum(r.n_items for r in shards) == 4000


class TestFileBackedShards:
    """r02 scale path: blobs as store files, shard-local probe, incremental
    maintenance — nothing through the driver (VERDICT r01 scale-killer #2)."""

    def test_build_probe_roundtrip_no_false_negatives(self, spark, tmp_path):
        from crawler_spark.operators.seenset import (
            probe_seen_files, update_seen_shards,
        )
        rows = [(f"h{i % 7}.go.id", f"{i:064x}") for i in range(1000)]
        seen = spark.createDataFrame(rows, "host string, url_hash string")
        d1 = str(tmp_path / "b1")
        stats = update_seen_shards(seen, blob_dir=None, n_shards=8, out_dir=d1).collect()
        # task-side writes: every shard's blob file exists, no blob columns
        # returned to the driver
        import os
        assert sorted(os.listdir(d1)) == sorted(
            [f"bloom-{s}" for s in range(8)] + [f"cuckoo-{s}" for s in range(8)]
        )
        assert all(r["bloom"] is None and r["cuckoo"] is None for r in stats)
        for layer in ("bloom", "cuckoo"):
            fn = (
                probe_seen_files(seen, d1, n_shards=8, layer=layer)
                .filter("NOT maybe_seen").count()
            )
            assert fn == 0, f"{layer} produced false negatives"

    def test_incremental_add_and_ttl_delete(self, spark, tmp_path):
        from crawler_spark.operators.seenset import (
            probe_seen_files, update_seen_shards,
        )
        old = [(f"h{i % 7}.go.id", f"{i:064x}") for i in range(400)]
        new = [(f"h{i % 7}.go.id", f"{i:064x}") for i in range(400, 500)]
        d1, d2 = str(tmp_path / "b1"), str(tmp_path / "b2")
        update_seen_shards(
            spark.createDataFrame(old, "host string, url_hash string"),
            blob_dir=None, n_shards=4, out_dir=d1,
        ).collect()
        update_seen_shards(
            spark.createDataFrame(new, "host string, url_hash string"),
            blob_dir=d1, n_shards=4, out_dir=d2,
            deletes=spark.createDataFrame(old[:100], "host string, url_hash string"),
        ).collect()
        kept = spark.createDataFrame(old[100:] + new, "host string, url_hash string")
        assert (
            probe_seen_files(kept, d2, n_shards=4, layer="cuckoo")
            .filter("NOT maybe_seen").count() == 0
        )
        expired = spark.createDataFrame(old[:100], "host string, url_hash string")
        hits = (
            probe_seen_files(expired, d2, n_shards=4, layer="cuckoo")
            .filter("maybe_seen").count()
        )
        assert hits <= 3, "deleted keys should (almost) all probe False"

    def test_engine_round_never_collects_blobs(self, spark, tmp_path, monkeypatch):
        """The r01 engine collected every shard blob to the driver and
        shipped them in the probe closure; the file-backed path must never
        call those APIs."""
        from crawler_spark.engine.corpus import (
            CorpusSpec, build_corpus, robots_map, seed_urls,
        )
        from crawler_spark.engine.superstep import CrawlEngine
        from crawler_spark.operators import seenset as ss

        def _boom(*a, **k):
            raise AssertionError("driver-side blob path used in engine round")

        monkeypatch.setattr(ss, "collect_shard_blobs", _boom)
        monkeypatch.setattr(ss, "probe_seen", _boom)
        spec = CorpusSpec(n_hosts=1, listing_pages=2, details_per_page=2,
                          hosts_with_robots=0)
        eng = CrawlEngine(
            spark, str(tmp_path / "s"), build_corpus(spec), robots_map(spec),
            per_host_budget=4,
        )
        out = eng.run(seeds=seed_urls(spec), max_rounds=4)
        assert any(m.get("n_ok", 0) > 0 for m in out)


class TestExactFilesPipeline:
    """exact_files mode: the shard files carry the exact (filter_key,
    verify_key) pair layer, the probe task is the final arbiter, and the
    per-round anti-join against the seen table — the last exchange whose
    volume scales with |corpus| — disappears. Must equal the plain exact
    anti-join bit-for-bit, across incremental rounds and deletes."""

    def _frames(self, spark):
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
        seen = docs.filter(F.col("doc_id") % 3 == 0).select(
            host.alias("host"), F.sha2(F.col("text"), 256).alias("url_hash")
        )
        cands = docs.filter(F.col("doc_id") % 2 == 0).select(
            host.alias("host"), F.sha2(F.col("text"), 256).alias("url_hash"),
            "doc_id",
        )
        return docs, seen, cands

    def test_equals_exact_anti_join(self, spark, tmp_path):
        from crawler_spark.operators.seenset import (
            seen_filter_pipeline_files,
            update_seen_shards,
        )

        _docs, seen, cands = self._frames(spark)
        d = str(tmp_path / "b0")
        update_seen_shards(
            seen, blob_dir=None, n_shards=8, out_dir=d, with_exact=True
        ).collect()
        got = seen_filter_pipeline_files(
            cands, seen, d, n_shards=8, exact_files=True
        )
        assert set(got.columns) == {"host", "url_hash", "doc_id"}
        want = cands.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")
        assert {r.doc_id for r in got.collect()} == {
            r.doc_id for r in want.collect()
        }

    def test_incremental_round_with_deletes(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from crawler_spark.operators.seenset import (
            seen_filter_pipeline_files,
            update_seen_shards,
        )

        docs, seen, cands = self._frames(spark)
        d0, d1 = str(tmp_path / "b0"), str(tmp_path / "b1")
        update_seen_shards(
            seen, blob_dir=None, n_shards=8, out_dir=d0, with_exact=True
        ).collect()
        host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
        adds = docs.filter(F.col("doc_id") % 5 == 0).select(
            host.alias("host"),
            F.sha2(F.concat(F.col("text"), F.lit("v2")), 256).alias("url_hash"),
        )
        dels = seen.filter(F.xxhash64("url_hash") % 4 == 0)
        update_seen_shards(
            adds, blob_dir=d0, deletes=dels, n_shards=8, out_dir=d1,
            with_exact=True,
        ).collect()
        seen2 = seen.join(dels, ["host", "url_hash"], "left_anti").unionByName(adds)
        cands2 = cands.unionByName(
            adds.withColumn("doc_id", F.lit(-1)).select("host", "url_hash", "doc_id")
        )
        got = seen_filter_pipeline_files(
            cands2, seen2, d1, n_shards=8, layer="cuckoo", exact_files=True
        )
        want = cands2.join(
            seen2.select("url_hash").distinct(), "url_hash", "left_anti"
        )
        assert sorted((r.host, r.url_hash) for r in got.collect()) == sorted(
            (r.host, r.url_hash) for r in want.collect()
        )

    def test_single_exchange_no_join(self, spark, tmp_path):
        from crawler_spark.plans.audit import count_occurrences, count_shuffles
        from crawler_spark.operators.seenset import (
            seen_filter_pipeline_files,
            update_seen_shards,
        )

        _docs, seen, cands = self._frames(spark)
        d = str(tmp_path / "b0")
        update_seen_shards(
            seen, blob_dir=None, n_shards=8, out_dir=d, with_exact=True
        ).collect()
        plan = seen_filter_pipeline_files(
            cands, seen, d, n_shards=8, exact_files=True
        )
        # one exchange: the candidates' repartition on shard. NO join node —
        # the corpus side contributes zero data movement.
        assert count_shuffles(plan) == 1
        assert count_occurrences(plan, r"Join") == 0


def test_pairs_contains_unit():
    """Direct coverage of the vectorized pair-membership kernel: unit-width
    runs (vectorized path), collision runs (loop path), absent first keys,
    and empty corpus/query edges."""
    import numpy as np

    from crawler_spark.operators.seenset import _pairs_contains

    k1 = np.array([2, 5, 5, 5, 9], dtype="uint64")
    k2 = np.array([7, 1, 2, 3, 0], dtype="uint64")
    q1 = np.array([2, 2, 5, 5, 5, 8, 9], dtype="uint64")
    q2 = np.array([7, 8, 2, 9, 1, 7, 0], dtype="uint64")
    got = _pairs_contains(k1, k2, q1, q2)
    assert got.tolist() == [True, False, True, False, True, False, True]
    empty = np.empty(0, dtype="uint64")
    assert _pairs_contains(empty, empty, q1, q2).tolist() == [False] * 7
    assert _pairs_contains(k1, k2, empty, empty).tolist() == []


class TestReviewRegressions:
    """Round-3 review pass over the seen-set/fetch surface."""

    def test_build_terminates_on_duplicate_multiset_input(self, spark):
        """>= 2*slots+stash copies of one key saturate the same two cuckoo
        buckets at ANY capacity — without the set-dedup before insert the
        capacity-doubling loop never terminates. The public contract is
        multiset input (a TTL-mode seen table straddles cohorts)."""
        from crawler_spark.operators.seenset import (
            build_seen_shards,
            collect_shard_blobs,
            probe_seen,
        )

        rows = [("dup.go.id", "ab" * 32)] * 12 + [
            ("h.go.id", f"{i:064x}") for i in range(50)
        ]
        seen = spark.createDataFrame(rows, "host string, url_hash string")
        shards = build_seen_shards(seen, n_shards=4, with_cuckoo=True)
        blobs = collect_shard_blobs(shards, "cuckoo")
        probed = probe_seen(seen.distinct(), blobs, n_shards=4)
        assert probed.filter(~F.col("maybe_seen")).count() == 0

    def test_incremental_refuses_missing_cuckoo_layer(self, spark, tmp_path):
        """A store maintained with_cuckoo=False must not silently bootstrap
        a delta-only cuckoo filter when later updated with_cuckoo=True —
        that would mark the whole historical corpus definitely-unseen on
        the next TTL-mode probe. Mirror of the missing-exact guard."""
        from crawler_spark.operators.seenset import update_seen_shards

        base = spark.createDataFrame(
            [(f"h{i % 3}.go.id", f"{i:064x}") for i in range(200)],
            "host string, url_hash string",
        )
        d0 = str(tmp_path / "r0")
        update_seen_shards(
            base, blob_dir=None, n_shards=4, out_dir=d0, with_cuckoo=False
        ).collect()
        delta = spark.createDataFrame(
            [("h9.go.id", "ff" * 32)], "host string, url_hash string"
        )
        with pytest.raises(Exception, match="cuckoo-.*missing"):
            update_seen_shards(
                delta, blob_dir=d0, n_shards=4,
                out_dir=str(tmp_path / "r1"), with_cuckoo=True,
            ).collect()

    def test_blob_cache_detects_rewritten_store(self, spark, tmp_path):
        """Blob paths are only unique per store LIFETIME: wiping the store
        root and re-crawling at the same path within one Spark application
        must not serve the old crawl's membership from the executor cache
        (the cache key carries the file signature)."""
        import shutil

        from crawler_spark.operators.seenset import (
            probe_seen_files,
            update_seen_shards,
        )

        root = tmp_path / "store"
        blob_dir = str(root / "snap-0")
        old = spark.createDataFrame(
            [(f"old{i}.go.id", f"{i:064x}") for i in range(100)],
            "host string, url_hash string",
        )
        update_seen_shards(
            old, blob_dir=None, n_shards=2, out_dir=blob_dir,
            with_cuckoo=False, with_exact=True,
        ).collect()
        cands = old.limit(20)
        first = probe_seen_files(
            cands, blob_dir, n_shards=2, exact=True
        ).filter(F.col("maybe_seen")).count()
        assert first == 20
        # wipe and rebuild the SAME path from a disjoint crawl
        shutil.rmtree(root)
        new = spark.createDataFrame(
            [(f"new{i}.go.id", f"{7000 + i:064x}") for i in range(100)],
            "host string, url_hash string",
        )
        update_seen_shards(
            new, blob_dir=None, n_shards=2, out_dir=blob_dir,
            with_cuckoo=False, with_exact=True,
        ).collect()
        again = probe_seen_files(
            cands, blob_dir, n_shards=2, exact=True
        ).filter(F.col("maybe_seen")).count()
        assert again == 0, "stale executor cache served the old store"

    def test_nonexact_pipeline_probes_once(self, spark, tmp_path, frontier):
        """The non-exact pipeline must embed exactly ONE probe stage in the
        plan: the old filter-split-union shape ran the probe UDF once per
        union branch (only the exchange was reused)."""
        from crawler_spark.operators.seenset import (
            seen_filter_pipeline_files,
            update_seen_shards,
        )

        seen = frontier.filter(F.col("ord") % 3 == 0).select("host", "url_hash")
        d = str(tmp_path / "blobs")
        update_seen_shards(
            seen, blob_dir=None, n_shards=8, out_dir=d, with_cuckoo=False
        ).collect()
        out = seen_filter_pipeline_files(
            frontier, seen, d, n_shards=8, seen_unique=True
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_probe = plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas") + plan.count("ArrowEvalPython")
        assert n_probe == 1, plan[:2000]
        expect = frontier.join(seen.select("url_hash"), "url_hash", "left_anti")
        assert sorted(r.url_hash for r in out.collect()) == sorted(
            r.url_hash for r in expect.collect()
        )

    def test_zero_rps_host_schedules_nothing(self, spark):
        """rps<=0 / null encodes a paused host: the scheduler emits no rows
        for it (previously ZeroDivisionError inside the task once demand
        exceeded burst) and other hosts are unaffected."""
        from crawler_spark.sources.fetch import paced_fetch_schedule

        rows = [("paused.go.id", i + 1, 0.0, 1.0) for i in range(5)] + [
            ("live.go.id", i + 1, 2.0, 3.0) for i in range(5)
        ]
        df = spark.createDataFrame(
            rows, "host string, fetch_order int, rps double, burst double"
        )
        out = paced_fetch_schedule(df).collect()
        hosts = {r.host for r in out}
        assert hosts == {"live.go.id"}
        assert len(out) == 5

    def test_fetch_composes_over_schedule_output(self, spark):
        """fetch_against_corpus(paced_fetch_schedule(df)) — the documented
        composition — must not produce a duplicate fetch_at_ms field in the
        output schema."""
        from crawler_spark.sources.fetch import (
            fetch_against_corpus,
            paced_fetch_schedule,
        )

        rows = [
            ("https://a.go.id/p1", "a.go.id", "s1", 1, 2.0, 3.0),
            ("https://a.go.id/p2", "a.go.id", "s1", 2, 2.0, 3.0),
        ]
        df = spark.createDataFrame(
            rows,
            "url_norm string, host string, seed_id string, fetch_order int,"
            " rps double, burst double",
        )
        paced = paced_fetch_schedule(df)
        out = fetch_against_corpus(paced, {"https://a.go.id/p1": (200, "<html/>", None)})
        assert out.columns.count("fetch_at_ms") == 1
        got = out.collect()
        assert len(got) == 2
