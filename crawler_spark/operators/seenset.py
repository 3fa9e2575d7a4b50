"""Partitioned bloom+cuckoo URL-seen set (SURVEY.md §4.3 #1).

Reference: exact Redis keys `url:dedup:<sha256>` with 24h TTL, MGET-batched
(`crawler/services/redis_cache.py:26-251`). At 10^10 URLs the north rule
replaces that with sharded approximate filters in front of the exact table:

  shard = pmod(xxhash64(host), n_shards)       -- host-locality: one host's
                                                  URLs probe ONE shard
  key   = xxhash64(url_hash)  (JVM-computed)   -- uint64 filter key

Build: ONE shuffle on shard (groupBy().applyInPandas), each task builds its
shard's bloom (+ optional cuckoo) blob with vectorized numpy inserts; output
is a tiny (n_shards rows) blob table persisted next to the exact `seen` table
per snapshot.

Probe: blobs are a per-executor closure/broadcast (n_shards * m/8 bytes —
e.g. 1024 shards x 12 bits/key at 10^10 keys ~ 15 GB total cluster-wide, a
few MB per executor when probes are routed shard-locally; in local mode the
whole dict ships once). maybe_seen=false rows are DEFINITELY unseen and skip
the exact anti-join entirely; only maybe_seen=true survivors (true dups +
~0.03% FPs) pay the join. Correctness is never lost to FPs because the final
arbiter is the exact anti-join on the (partition-pruned) survivors.

TTL expiry: the cuckoo layer supports delete_many — expiring day D =
deleting D's key batch per shard, no full rebuild (the bloom layer is
rebuilt lazily per compaction window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from crawler_spark.kernels.membership import BloomFilter, CuckooFilter


def with_shard_and_key(
    df: DataFrame, host_col: str = "host", hash_col: str = "url_hash", n_shards: int = 64
) -> DataFrame:
    """JVM-side shard routing + uint64 filter key (stored signed int64)."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(host_col)), F.lit(n_shards)).cast("int")
    ).withColumn("filter_key", F.xxhash64(F.col(hash_col)))


_BUILD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_items", T.LongType()),
        T.StructField("bloom", T.BinaryType()),
        T.StructField("cuckoo", T.BinaryType()),
    ]
)


def build_seen_shards(
    seen: DataFrame,
    host_col: str = "host",
    hash_col: str = "url_hash",
    n_shards: int = 64,
    bits_per_key: int = 12,
    with_cuckoo: bool = True,
) -> DataFrame:
    """One blob row per shard. The groupBy(shard) shuffle is the only data
    movement; inserts are numpy-vectorized inside each task."""
    routed = with_shard_and_key(seen, host_col, hash_col, n_shards).select(
        "shard", "filter_key"
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["filter_key"].to_numpy(dtype="int64").astype("uint64")
        bloom = BloomFilter.for_capacity(max(len(keys), 1024), bits_per_key)
        bloom.add_many(keys)
        cuckoo_blob = None
        if with_cuckoo:
            ck = CuckooFilter.for_capacity(max(len(keys), 1024))
            inserted = ck.add_many(keys)
            while inserted != len(keys):
                # over-full shard (insert refused once the victim stash is
                # occupied): double capacity and rebuild — a silently-dropped
                # key would turn into a false negative, violating the
                # no-false-negatives invariant this layer is built on.
                ck = CuckooFilter(ck.n_buckets * 2)
                inserted = ck.add_many(keys)
            cuckoo_blob = ck.to_bytes()
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_items": [len(keys)],
                "bloom": [bloom.to_bytes()],
                "cuckoo": [cuckoo_blob],
            }
        )

    return routed.groupBy("shard").applyInPandas(_build, schema=_BUILD_SCHEMA)


def collect_shard_blobs(shards: DataFrame, layer: str = "bloom") -> dict[int, bytes]:
    """Driver-side: blob table -> {shard: blob} for the probe closure. The
    blob table is n_shards rows (tiny); on a cluster you would instead
    broadcast it or route probes shard-locally via the same partitioner."""
    return {r["shard"]: r[layer] for r in shards.select("shard", layer).collect() if r[layer]}


def probe_seen(
    candidates: DataFrame,
    blobs: dict[int, bytes],
    host_col: str = "host",
    hash_col: str = "url_hash",
    n_shards: int = 64,
) -> DataFrame:
    """Adds maybe_seen (bloom or cuckoo probe, auto-detected from magic).
    False == definitely unseen (skip exact join); True == verify exactly."""

    filters: dict[int, object] = {}

    def _get(shard: int):
        if shard not in filters:
            blob = blobs.get(shard)
            if blob is None:
                filters[shard] = None
            elif blob[:4] == BloomFilter.MAGIC:
                filters[shard] = BloomFilter.from_bytes(blob)
            else:
                filters[shard] = CuckooFilter.from_bytes(blob)
        return filters[shard]

    @pandas_udf("boolean")
    def _probe(shard: pd.Series, key: pd.Series) -> pd.Series:
        out = pd.Series(False, index=shard.index)
        keys = key.to_numpy(dtype="int64").astype("uint64")
        for s in shard.unique():
            flt = _get(int(s))
            if flt is None:
                continue  # no filter for shard -> nothing seen there yet
            m = (shard == s).to_numpy()
            out[m] = flt.contains_many(keys[m])
        return out

    routed = with_shard_and_key(candidates, host_col, hash_col, n_shards)
    return routed.withColumn("maybe_seen", _probe(F.col("shard"), F.col("filter_key")))


def seen_filter_pipeline(
    candidates: DataFrame,
    seen: DataFrame,
    blobs: dict[int, bytes],
    host_col: str = "host",
    hash_col: str = "url_hash",
    n_shards: int = 64,
) -> DataFrame:
    """The full two-layer path: bloom prefilter -> exact anti-join for
    survivors only -> union of definite-unseen + verified-unseen. At 100 TB
    the anti-join's build side shrinks from |candidates| to |true dups + FPs|."""
    probed = probe_seen(candidates, blobs, host_col, hash_col, n_shards)
    definitely_new = probed.filter(~F.col("maybe_seen"))
    survivors = probed.filter(F.col("maybe_seen"))
    verified_new = survivors.join(
        seen.select(hash_col).distinct(), hash_col, "left_anti"
    )
    return definitely_new.unionByName(verified_new).drop(
        "maybe_seen", "shard", "filter_key"
    )
