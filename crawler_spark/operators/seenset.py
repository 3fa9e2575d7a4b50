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

import os

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


def verify_key_col(hash_col: str = "url_hash"):
    """Second identity dimension for the SHARD-LOCAL exact layer: the first
    60 bits of the sha256 digest itself (independent of the xxhash64 filter
    key). (filter_key, verify_key) is ~124 bits of identity — collision odds
    across 10^10 keys ~1e-17, below storage-corruption rates; production on
    Iceberg would bucket the full 32-byte digest, same plan shape."""
    return F.conv(F.substring(F.col(hash_col), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------- exact key shards
#
# `exact-<shard>` files next to the bloom/cuckoo blobs: the shard's ACTIVE
# (filter_key, verify_key) pairs, lexsorted, as two uint64 arrays. With these
# the probe task IS the exact arbiter — the per-round anti-join against the
# seen table (the last O(|corpus|) shuffle in the round plan) disappears.
# Under TTL the per-round delete cadence keeps file content == the active
# window of the NEXT round's probe (each commit retires exactly its expiring
# cohort — gated in tests/test_seen_ttl.py), so no per-entry round metadata
# is needed.

_EXACT_MAGIC = b"XACT"


def _exact_to_bytes(k1, k2) -> bytes:
    import numpy as np

    order = np.lexsort((k2, k1))
    k1, k2 = k1[order], k2[order]
    return (
        _EXACT_MAGIC
        + len(k1).to_bytes(8, "little")
        + k1.astype("<u8").tobytes()
        + k2.astype("<u8").tobytes()
    )


def _exact_from_bytes(blob: bytes):
    import numpy as np

    assert blob[:4] == _EXACT_MAGIC
    n = int.from_bytes(blob[4:12], "little")
    k1 = np.frombuffer(blob, dtype="<u8", count=n, offset=12)
    k2 = np.frombuffer(blob, dtype="<u8", count=n, offset=12 + 8 * n)
    return k1, k2


_EXACT_CACHE: dict[str, object] = {}
# byte-based bound: pair arrays are orders of magnitude larger than filter
# blobs (~16 B/key), so an entry-count cap like the filter cache's 64 would
# permit many GB per worker. Shard-routed probes touch ~1 shard per task, so
# a small byte budget keeps the hit rate without the OOM.
_EXACT_CACHE_MAX_BYTES = 512 * 1024 * 1024


def _file_sig(path: str):
    """(mtime_ns, size) identity of a blob file, None if absent. Cache
    entries carry this so a REUSED path (store root wiped and re-crawled at
    the same location within one executor lifetime — blob paths are only
    unique per store lifetime) reloads instead of serving the old store's
    membership. One os.stat per lookup, amortized over the task batch."""
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def _load_exact(path: str):
    sig = _file_sig(path)
    hit = _EXACT_CACHE.get(path)
    if hit is not None and hit[0] == sig:
        return hit[1]
    total = sum(
        v[1][0].nbytes + v[1][1].nbytes
        for v in _EXACT_CACHE.values()
        if v[1] is not None
    )
    if total > _EXACT_CACHE_MAX_BYTES:
        _EXACT_CACHE.clear()
    if sig is None:
        val = None
    else:
        with open(path, "rb") as fh:
            val = _exact_from_bytes(fh.read())
    _EXACT_CACHE[path] = (sig, val)
    return val


def _pairs_contains(k1_sorted, k2_sorted, q1, q2):
    """Vectorized membership of (q1, q2) pairs in the lexsorted pair arrays:
    searchsorted bounds on the first key, then a scan of the (tiny — equal-k1
    runs are hash collisions) second-key range."""
    import numpy as np

    out = np.zeros(len(q1), dtype=bool)
    if len(k1_sorted) == 0 or len(q1) == 0:
        return out
    lo = np.searchsorted(k1_sorted, q1, "left")
    hi = np.searchsorted(k1_sorted, q1, "right")
    width = hi - lo
    # unit-width ranges (the overwhelmingly common case — an equal-k1 run
    # longer than 1 is a 64-bit hash collision within a shard) compare
    # fully vectorized; only collision runs fall to the Python loop. A
    # hit-proportional Python loop here was the probe stage's bottleneck at
    # high dup rates (millions of interpreted iterations per task).
    ones = np.flatnonzero(width == 1)
    out[ones] = k2_sorted[lo[ones]] == q2[ones]
    for i in np.flatnonzero(width > 1):
        if q2[i] in k2_sorted[lo[i]:hi[i]]:
            out[i] = True
    return out


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
        import numpy as np

        # membership is a SET: dedup before insert. The input is legally a
        # multiset (e.g. a TTL-mode seen table straddling cohorts), but
        # duplicate fingerprints all hash to the same two cuckoo buckets —
        # >= 2*slots+stash copies of one key can never fully insert at ANY
        # capacity, so without the dedup the doubling loop below would
        # never terminate.
        keys = np.unique(
            pdf["filter_key"].to_numpy(dtype="int64").astype("uint64")
        )
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


# ------------------------------------------------------------------------
# Scale path (r02): blobs live as per-shard FILES next to the snapshot, the
# probe repartitions candidates by shard and each TASK loads only its own
# shard's blob — nothing rides the driver or the UDF closure. (The closure
# variants above remain for small dims / tests.)
# ------------------------------------------------------------------------

# executor-process blob cache: {path: (file_sig, filter)}; blob paths are
# per-snapshot (a new round writes a new dir), and the file signature in
# the key guards the one case where a path DOES recur — a store root wiped
# and re-crawled at the same location inside one executor lifetime
_FILTER_CACHE: dict[str, object] = {}


def _load_filter(path: str):
    sig = _file_sig(path)
    hit = _FILTER_CACHE.get(path)
    if hit is not None and hit[0] == sig:
        return hit[1]
    if len(_FILTER_CACHE) > 64:  # bound executor memory across rounds
        _FILTER_CACHE.clear()
    if sig is None:
        val = None
    else:
        with open(path, "rb") as fh:
            blob = fh.read()
        val = (
            BloomFilter.from_bytes(blob)
            if blob[:4] == BloomFilter.MAGIC
            else CuckooFilter.from_bytes(blob)
        )
    _FILTER_CACHE[path] = (sig, val)
    return val


def probe_seen_files(
    candidates: DataFrame,
    blob_dir: str | list[str] | tuple[str, ...],
    host_col: str = "host",
    hash_col: str = "url_hash",
    n_shards: int = 64,
    layer: str = "bloom",
    exact: bool = False,
) -> DataFrame:
    """Adds maybe_seen via a shard-local file probe: ONE shuffle routes each
    candidate to its shard's partition; the task reads `<blob_dir>/<layer>-
    <shard>` once (executor-cached) and probes numpy-vectorized. On a cluster
    blob_dir is shared storage (HDFS/S3) — per-task reads are a few MB and
    amortized across the partition; total driver traffic is zero.

    ``blob_dir`` may be a CHAIN (list of dirs, oldest first): a full base
    plus per-round delta blobs, the LSM/Iceberg merge-on-read shape applied
    to the filter store. The walk is NEWEST element first and the key's most
    recent event wins: an exact hit in an element's `tomb-<s>` tombstone pair
    file (TTL expiry — written by delta commits whose cohort retired that
    round) resolves the key DEFINITELY UNSEEN, an exact-verified filter hit
    resolves it SEEN, and an unresolved key falls through to older elements.
    Within one element adds and tombstones are disjoint by construction (a
    key expiring in round R is still seen during R's dedup probe, so it can
    only re-enter as a fresh add in a LATER element), which makes first-
    event-wins well defined. Permanent chains have no tombstones and their
    elements partition keys by first-seen round, so the walk degenerates to
    the plain OR and false negatives remain impossible. Chains let the
    engine write O(delta) blob bytes per round instead of rewriting every
    shard's full filter; the REBUILD_EVERY full rebuild is the compaction
    that bounds chain length (and probe fan-in) and folds tombstones away.

    ``exact=True``: rows the filter flags are then verified IN-TASK against
    the same element's `exact-<s>` pair file (loaded only when the batch has
    filter hits, executor-cached), so `maybe_seen` becomes an EXACT seen
    verdict — the caller needs no anti-join against the seen table at all.
    Tombstone subtraction requires the pair identity, so it only runs under
    ``exact=True``; the non-exact path ignores tombstones, which errs
    conservatively (expired keys may probe maybe_seen=True) and stays
    correct because that path's final arbiter is the caller's anti-join
    against the active seen table."""
    chain = [blob_dir] if isinstance(blob_dir, str) else list(blob_dir)
    routed = with_shard_and_key(candidates, host_col, hash_col, n_shards)
    if exact:
        routed = routed.withColumn("verify_key", verify_key_col(hash_col))
    schema = T.StructType(
        list(routed.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def _probe(batches):
        import numpy as np

        for pdf in batches:
            out = pd.Series(False, index=pdf.index)
            keys = pdf["filter_key"].to_numpy(dtype="int64").astype("uint64")
            for s in pdf["shard"].unique():
                m = (pdf["shard"] == s).to_numpy()
                skeys = keys[m]
                vks = (
                    pdf.loc[m, "verify_key"]
                    .to_numpy(dtype="int64").astype("uint64")
                    if exact
                    else None
                )
                hits = np.zeros(len(skeys), dtype=bool)
                # newest element first, first event wins: resolved tracks
                # rows already decided (seen via an exact-verified add, or
                # definitely-unseen via a tombstone) so older elements never
                # overturn a newer event. In non-exact mode a filter hit is
                # the only resolution (tombstones need the pair identity),
                # which keeps the old early-termination behavior.
                resolved = np.zeros(len(skeys), dtype=bool)
                for d in reversed(chain):
                    todo = ~resolved
                    if not todo.any():
                        break
                    if exact:
                        tomb = _load_exact(os.path.join(d, f"tomb-{int(s)}"))
                        if tomb is not None:
                            dead = _pairs_contains(
                                tomb[0], tomb[1], skeys[todo], vks[todo]
                            )
                            if dead.any():
                                idx = np.flatnonzero(todo)
                                resolved[idx[dead]] = True  # stays unseen
                                todo = ~resolved
                                if not todo.any():
                                    break
                    flt = _load_filter(os.path.join(d, f"{layer}-{int(s)}"))
                    if flt is None:
                        if os.path.exists(os.path.join(d, f"bloom-{int(s)}")):
                            # the element exists but lacks THIS layer: a
                            # silent skip here would be a false negative
                            # (e.g. cuckoo probe over a bloom-only delta)
                            raise RuntimeError(
                                f"{layer}-{int(s)} missing in {d} while the "
                                "bloom layer exists — chain element lacks "
                                f"the {layer} layer; rebuild shards first"
                            )
                        continue  # shard never built in this element
                    sub = flt.contains_many(skeys[todo])
                    if exact and sub.any():
                        pairs = _load_exact(os.path.join(d, f"exact-{int(s)}"))
                        if pairs is None:
                            raise RuntimeError(
                                f"exact-{int(s)} missing in {d} — store "
                                "built without with_exact; rebuild shards first"
                            )
                        verified = np.zeros(len(sub), dtype=bool)
                        verified[sub] = _pairs_contains(
                            pairs[0], pairs[1],
                            skeys[todo][sub], vks[todo][sub],
                        )
                        sub = verified
                    idx = np.flatnonzero(todo)
                    hits[idx[sub]] = True
                    resolved[idx[sub]] = True
                    if os.path.exists(os.path.join(d, f"full-{int(s)}")):
                        # this element is AUTHORITATIVE for shard s (full
                        # rebuild or staggered cohort fold): older elements
                        # hold only superseded copies — stop; still-
                        # unresolved keys are definitely unseen
                        break
                out[m] = hits
            pdf = pdf.copy()
            pdf["maybe_seen"] = out
            yield pdf

    return routed.repartition(n_shards, "shard").mapInPandas(_probe, schema)


def trim_blob_chain(chain: list[str], n_shards: int = 64) -> list[str]:
    """Drop chain elements older than full-marker coverage: walking newest
    to oldest, once every shard has seen a ``full-<s>`` marker the probe can
    never consult anything older (the marker stops its walk), so those
    elements are dead weight — trimming them is what keeps the staggered
    per-cohort fold's chain bounded without a global compaction round."""
    covered: set[int] = set()
    kept: list[str] = []
    for d in reversed(chain):
        kept.append(d)
        try:
            names = os.listdir(d)
        except OSError:
            names = []
        covered.update(
            int(f[5:]) for f in names if f.startswith("full-")
        )
        if len(covered) >= n_shards:
            break
    return list(reversed(kept))


def update_seen_shards(
    adds: DataFrame,
    blob_dir: str | None,
    deletes: DataFrame | None = None,
    host_col: str = "host",
    hash_col: str = "url_hash",
    n_shards: int = 64,
    bits_per_key: int = 12,
    with_cuckoo: bool = True,
    out_dir: str | None = None,
    with_exact: bool = False,
    delta_build: bool = False,
    full_markers: bool = False,
    shards: list[int] | None = None,
) -> DataFrame:
    """INCREMENTAL shard maintenance: per shard, load the previous round's
    blobs from ``blob_dir`` (None == build fresh), add the new keys, delete
    the TTL-expired ones (cuckoo only — bloom is an insert-only superset,
    recompacted by the periodic full rebuild), and emit the new blob row.
    ONE shuffle on shard; per-round work is O(delta), not O(|seen|).

    ``with_exact=True`` (requires ``out_dir``) additionally maintains the
    shard's `exact-<s>` pair file — the shard-local EXACT membership layer
    that lets the probe task be the final arbiter, deleting the per-round
    anti-join shuffle against the seen table. Deletes remove pairs, so
    under TTL the file tracks the active window on the same cadence as the
    cuckoo layer.

    ``full_markers=True`` additionally writes an empty ``full-<s>`` MARKER
    file per emitted shard, declaring this element AUTHORITATIVE for that
    shard: the chain probe stops its newest-first walk at the marker (an
    unresolved key is then definitely unseen for that shard). Full rebuilds
    mark every shard; the staggered per-cohort fold elements
    (``shards=[...]`` restricts the build to the cohort — carrier rows and
    all) mark only their cohort, which is what lets compaction spread
    1/REBUILD_EVERY of the store per round instead of spiking all of it on
    the modulo round.

    ``delta_build=True`` with ``deletes`` is the TTL merge-on-read shape:
    instead of mutating any previous blob (there is none — ``blob_dir`` must
    be None in delta mode), the expiring cohort's (filter_key, verify_key)
    pairs are written as an immutable `tomb-<s>` TOMBSTONE pair file next to
    the delta's add filters; the chain probe resolves a tombstoned key as
    definitely-unseen from that element forward (newest-first walk). Requires
    ``with_exact`` — tombstone subtraction needs the exact pair identity.
    Per-round blob bytes are then O(adds + expiring cohort), never O(window).

    With ``out_dir`` set, each TASK writes its shard's blob files directly to
    the (shared) store directory and only a tiny (shard, n_items) stat row
    returns — blobs never transit the driver. Blob files land before the
    manifest flips, so a crash leaves orphans, never a half-commit (same
    contract as the parquet snapshots).

    ``with_exact`` requires ``out_dir`` (exact arrays never transit the
    driver by design).

    Every shard emits a row even with an empty delta (a synthetic carrier row
    per shard keeps the groupBy total), so the new snapshot's blob dir is
    always complete. Raises on cuckoo overflow instead of dropping keys."""
    if with_exact and out_dir is None:
        raise ValueError("with_exact=True requires out_dir (task-side writes)")
    if delta_build and deletes is not None:
        if not with_exact:
            raise ValueError(
                "delta_build with deletes (tombstones) requires with_exact "
                "— tombstone subtraction needs the exact pair identity"
            )
        if blob_dir is not None:
            raise ValueError(
                "delta_build writes immutable elements; blob_dir must be None"
            )
    spark = adds.sparkSession

    def _routed(df: DataFrame, op: int) -> DataFrame:
        out = with_shard_and_key(df, host_col, hash_col, n_shards)
        if with_exact:  # don't compute/shuffle the extra column otherwise
            out = out.withColumn("verify_key", verify_key_col(hash_col))
            out = out.select("shard", "filter_key", "verify_key")
        else:
            out = out.select("shard", "filter_key")
        return out.withColumn("op", F.lit(op))

    parts = [_routed(adds, 1)]
    if deletes is not None:
        parts.append(_routed(deletes, -1))
    # carrier rows: every shard (or every shard of the restricted cohort)
    # appears even with no delta this round. filter_key is 0, NOT NULL — a
    # null would make Arrow hand pandas a float64 column and silently
    # corrupt full-range 64-bit keys (> 2^53).
    carrier_cols = [
        F.col("id").cast("int").alias("shard"),
        F.lit(0).cast("long").alias("filter_key"),
    ]
    if with_exact:
        carrier_cols.append(F.lit(0).cast("long").alias("verify_key"))
    carrier_src = (
        spark.range(n_shards)
        if shards is None
        else spark.createDataFrame([(int(s),) for s in shards], "id long")
    )
    parts.append(carrier_src.select(*carrier_cols, F.lit(0).alias("op")))
    routed = parts[0]
    for p in parts[1:]:
        routed = routed.unionByName(p)

    shard_set = frozenset(int(s) for s in shards) if shards is not None else None

    def _update(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        shard = int(pdf["shard"].iloc[0])
        if shard_set is not None and shard not in shard_set:
            # a row routed outside the declared cohort means the caller's
            # source filter and the shard routing disagree — failing loudly
            # beats silently committing an unmarked partial shard
            raise RuntimeError(
                f"shard {shard} outside the declared cohort {sorted(shard_set)}"
            )
        real = pdf[pdf["op"] != 0]
        add_keys = (
            real.loc[real["op"] == 1, "filter_key"]
            .to_numpy(dtype="int64").astype("uint64")
        )
        del_keys = (
            real.loc[real["op"] == -1, "filter_key"]
            .to_numpy(dtype="int64").astype("uint64")
        )
        if with_exact:
            add_vk = (
                real.loc[real["op"] == 1, "verify_key"]
                .to_numpy(dtype="int64").astype("uint64")
            )
            del_vk = (
                real.loc[real["op"] == -1, "verify_key"]
                .to_numpy(dtype="int64").astype("uint64")
            )
            k1 = np.empty(0, dtype="uint64")
            k2 = np.empty(0, dtype="uint64")
            if blob_dir is not None:
                xp = os.path.join(blob_dir, f"exact-{shard}")
                if os.path.exists(xp):
                    with open(xp, "rb") as fh:
                        k1, k2 = _exact_from_bytes(fh.read())
                    k1, k2 = k1.copy(), k2.copy()
                elif os.path.exists(os.path.join(blob_dir, f"bloom-{shard}")):
                    # filter blobs exist but the exact layer doesn't: the
                    # store predates with_exact. Starting from empty would
                    # commit a DELTA-ONLY exact file as authoritative — the
                    # next probe would then re-admit every previously-seen
                    # URL. Same contract as the probe guard: fail loudly.
                    raise RuntimeError(
                        f"exact-{shard} missing in {blob_dir} while filter "
                        "blobs exist — store predates the exact layer; run "
                        "a full rebuild (blob_dir=None) first"
                    )
            tomb_blob = None
            if len(del_keys) and delta_build:
                # tombstone mode: deletes become an immutable pair file, not
                # a mutation — the chain probe subtracts them newest-first
                tomb_blob = _exact_to_bytes(del_keys, del_vk)
            elif len(del_keys):
                order = np.lexsort((del_vk, del_keys))
                drop = _pairs_contains(
                    del_keys[order], del_vk[order], k1, k2
                )
                k1, k2 = k1[~drop], k2[~drop]
            k1 = np.concatenate([k1, add_keys])
            k2 = np.concatenate([k2, add_vk])
            # defensive pair-dedup (engine adds are fresh-only by invariant)
            order = np.lexsort((k2, k1))
            k1, k2 = k1[order], k2[order]
            if len(k1):
                keep = np.concatenate(
                    [[True], (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])]
                )
                k1, k2 = k1[keep], k2[keep]
            exact_blob = _exact_to_bytes(k1, k2)
        bloom = cuckoo = None
        if blob_dir is not None:
            b = os.path.join(blob_dir, f"bloom-{shard}")
            if os.path.exists(b):
                with open(b, "rb") as fh:
                    bloom = BloomFilter.from_bytes(fh.read())
            c = os.path.join(blob_dir, f"cuckoo-{shard}")
            if with_cuckoo and os.path.exists(c):
                with open(c, "rb") as fh:
                    cuckoo = CuckooFilter.from_bytes(fh.read())
            elif with_cuckoo and os.path.exists(b):
                # bloom blobs exist but the cuckoo layer doesn't: the store
                # was maintained with with_cuckoo=False. Starting from an
                # EMPTY cuckoo here would commit a delta-only filter as
                # authoritative — the next TTL-mode probe (layer='cuckoo')
                # would see every historical URL as definitely-unseen and
                # re-crawl the corpus. Same contract as the missing-exact
                # guard above: fail loudly, demand a full rebuild.
                raise RuntimeError(
                    f"cuckoo-{shard} missing in {blob_dir} while bloom "
                    "blobs exist — store was built without the cuckoo "
                    "layer; run a full rebuild (blob_dir=None) first"
                )
        if bloom is None:
            # fresh filters for a store that keeps growing IN PLACE get 4x
            # headroom + a 4096-key floor (later incremental rounds add_many
            # into the same bitmap; undersizing would inflate the FP rate).
            # A delta_build element is IMMUTABLE once written — the next
            # round appends a NEW chain dir — so it is sized to its actual
            # keys: per-round blob bytes stay O(delta), no fixed floor.
            cap = (
                max(len(add_keys), 64)
                if delta_build
                else max(4 * len(add_keys), 4096)
            )
            bloom = BloomFilter.for_capacity(cap, bits_per_key)
        if with_cuckoo and cuckoo is None:
            cuckoo = CuckooFilter.for_capacity(
                max(len(add_keys), 64)
                if delta_build
                else max(4 * len(add_keys), 4096)
            )
        bloom.add_many(add_keys)
        cuckoo_blob = None
        if with_cuckoo:
            if not delta_build:
                # tombstoned deletes never touch the filters: deleting keys
                # absent from this fresh delta's cuckoo could evict a
                # colliding fingerprint of an ADDED key (false negative)
                cuckoo.delete_many(del_keys)
            inserted = cuckoo.add_many(add_keys)
            if inserted != len(add_keys):
                # incremental rebuild is impossible (fingerprints are lossy);
                # fail loudly — the engine's periodic full rebuild re-sizes
                raise RuntimeError(
                    f"cuckoo shard {shard} over-full: {inserted}/{len(add_keys)}"
                    " inserted; increase capacity or rebuild from the exact table"
                )
            cuckoo_blob = cuckoo.to_bytes()
        bloom_blob = bloom.to_bytes()
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, f"bloom-{shard}"), "wb") as fh:
                fh.write(bloom_blob)
            if cuckoo_blob is not None:
                with open(os.path.join(out_dir, f"cuckoo-{shard}"), "wb") as fh:
                    fh.write(cuckoo_blob)
            if with_exact:
                with open(os.path.join(out_dir, f"exact-{shard}"), "wb") as fh:
                    fh.write(exact_blob)
                if tomb_blob is not None:
                    # only shards whose cohort actually expired get a file;
                    # the probe treats a missing tomb-<s> as empty
                    with open(
                        os.path.join(out_dir, f"tomb-{shard}"), "wb"
                    ) as fh:
                        fh.write(tomb_blob)
            if full_markers:
                # authoritative-for-this-shard marker: the probe's chain
                # walk stops here for shard s (see probe_seen_files)
                with open(os.path.join(out_dir, f"full-{shard}"), "wb"):
                    pass
            bloom_blob = cuckoo_blob = None  # stats only back to the driver
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_items": [int(bloom.n_items)],
                "bloom": [bloom_blob],
                "cuckoo": [cuckoo_blob],
            }
        )

    return routed.groupBy("shard").applyInPandas(_update, schema=_BUILD_SCHEMA)


def seen_filter_pipeline_files(
    candidates: DataFrame,
    seen: DataFrame,
    blob_dir: str | list[str] | None,
    host_col: str = "host",
    hash_col: str = "url_hash",
    n_shards: int = 64,
    layer: str = "bloom",
    seen_unique: bool = False,
    exact_files: bool = False,
) -> DataFrame:
    """Two-layer seen dedup with the file-backed shard probe: definitely-new
    rows skip the exact anti-join entirely; only maybe_seen survivors (true
    dups + ~0.03% FPs) pay the join.

    ``seen_unique=True`` skips the distinct() on the seen side — the engine's
    seen table has one row per hash by construction (fresh keys are deduped
    against seen before insert), and an anti-join is semantically dedup-free
    anyway; the distinct was a full extra aggregation over |seen| per round.

    ``exact_files=True``: the shard files carry the exact pair layer
    (update_seen_shards with_exact), so the probe task is the final arbiter
    and the anti-join against `seen` disappears — the ONLY data movement is
    the candidates' repartition on shard. This removes the last per-round
    exchange whose volume scales with |corpus| rather than |delta| (the
    anti-join shuffled the full seen hash column every round). `seen` is
    then only used for the no-filters bootstrap path.

    ``blob_dir`` accepts a chain (list of dirs, oldest first) — see
    probe_seen_files; an empty list means no filters (bootstrap path)."""
    if not blob_dir:
        blob_dir = None
    if blob_dir is not None and exact_files:
        probed = probe_seen_files(
            candidates, blob_dir, host_col, hash_col, n_shards, layer, exact=True
        )
        return probed.filter(~F.col("maybe_seen")).drop(
            "maybe_seen", "shard", "filter_key", "verify_key"
        )
    build = seen.select(hash_col) if seen_unique else seen.select(hash_col).distinct()
    if blob_dir is None:  # no filters built yet -> plain exact anti-join
        return candidates.join(build, hash_col, "left_anti")
    probed = probe_seen_files(candidates, blob_dir, host_col, hash_col, n_shards, layer)
    return _split_free_antijoin(probed, build, hash_col).drop(
        "maybe_seen", "shard", "filter_key"
    )


def _split_free_antijoin(
    probed: DataFrame, build: DataFrame, hash_col: str
) -> DataFrame:
    """Anti-join whose condition includes maybe_seen: definitely-new rows
    (which CANNOT be in seen — the filter has no false negatives) survive
    the join vacuously instead of via a separate union branch. The naive
    filter-split-union re-executes the whole probe stage once per branch
    (two filters over one mapInPandas subtree: Spark reuses the exchange
    but runs the UDF twice); this shape probes exactly once. The trade is
    explicit: definitely-new rows now ride the join's candidate-side
    shuffle, which is second-order next to the corpus-side shuffle this
    non-exact path pays anyway (the exact_files path avoids both)."""
    return probed.join(
        build.withColumnRenamed(hash_col, "__seen_hash"),
        (F.col(hash_col) == F.col("__seen_hash")) & F.col("maybe_seen"),
        "left_anti",
    )


def seen_filter_pipeline(
    candidates: DataFrame,
    seen: DataFrame,
    blobs: dict[int, bytes],
    host_col: str = "host",
    hash_col: str = "url_hash",
    n_shards: int = 64,
) -> DataFrame:
    """The full two-layer path: bloom prefilter -> exact anti-join gated on
    maybe_seen (single probe pass). At 100 TB the join's effective probe-key
    population shrinks from |candidates| to |true dups + FPs|."""
    probed = probe_seen(candidates, blobs, host_col, hash_col, n_shards)
    return _split_free_antijoin(
        probed, seen.select(hash_col).distinct(), hash_col
    ).drop("maybe_seen", "shard", "filter_key")
