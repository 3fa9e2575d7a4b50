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
