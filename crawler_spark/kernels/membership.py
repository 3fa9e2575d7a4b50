"""Approximate-membership kernels: bloom filter + cuckoo filter (numpy).

North-rule component with NO reference analogue: the reference keeps an exact
URL-seen set in Redis (`crawler/services/redis_cache.py:26-251`, one key per
sha256 + 24h TTL). At 10^10 URLs exact keys don't fit; the rule mandates a
partitioned cuckoo+bloom seen set sharded by canonical-host hash.

Design (SURVEY.md §4.3):
  * bloom = cheap first layer (8-64 bits/key, no deletes) — probe drops the
    overwhelmingly-unseen candidates without touching the exact table;
  * cuckoo = windowed layer supporting DELETE, for the 24h-TTL semantics
    (expiring a day's URLs = deleting its fingerprints, no full rebuild);
  * false positives are SAFE (survivors hit the exact anti-join downstream),
    false negatives are impossible by construction for inserted keys.

Both operate on pre-hashed uint64 keys (computed JVM-side via xxhash64), so
the hot path is pure numpy array math — no per-row Python, no string hashing
in Python. Serialization is a plain bytes blob -> one Spark binary column per
shard.

Hash-derivation scheme (shared by build and probe, little-endian):
  bloom:  pos_i = (h1 + i*h2) mod m,  h2 = odd-ized mix of h1  (double hashing)
  cuckoo: fp = 16-bit nonzero from high bits; i1 = h mod nb; i2 = i1 XOR
          (fp * 0x5bd1e995 mod nb)  (partial-key cuckoo, Fan et al. 2014)
"""

from __future__ import annotations

import struct

import numpy as np

_MIX = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix constant


def _mix64(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 — deterministic second hash from the first."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= _MIX
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


class BloomFilter:
    """Fixed-size bloom filter over uint64 keys, double hashing, k probes."""

    MAGIC = b"BLM1"

    def __init__(self, n_bits: int, k: int = 7):
        if n_bits % 64:
            n_bits += 64 - n_bits % 64
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)
        self.n_items = 0

    @classmethod
    def for_capacity(cls, n: int, bits_per_key: int = 12) -> "BloomFilter":
        # k ~= bits_per_key * ln2; 12 bits/key + k=8 -> ~0.03% FP
        k = max(1, int(round(bits_per_key * 0.6931)))
        return cls(max(64, n * bits_per_key), k=k)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing."""
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = _mix64(h1) | np.uint64(1)  # odd -> full-period stride
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return (h1[:, None] + i * h2[:, None]) % np.uint64(self.n_bits)

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(np.asarray(hashes)).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
        self.n_items += len(hashes)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized probe -> bool array (False == definitely not present)."""
        hashes = np.asarray(hashes)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)  # (n, k)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        return ((byte & bit) != 0).all(axis=1)

    def to_bytes(self) -> bytes:
        head = self.MAGIC + struct.pack("<QQQ", self.n_bits, self.k, self.n_items)
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        assert blob[:4] == cls.MAGIC, "not a BLM1 blob"
        n_bits, k, n_items = struct.unpack("<QQQ", blob[4:28])
        f = cls(n_bits, k=k)
        f.bits = np.frombuffer(blob[28:], dtype=np.uint8).copy()
        f.n_items = n_items
        return f


class CuckooFilter:
    """Partial-key cuckoo filter: 4-slot buckets, 16-bit fingerprints,
    supports delete (the TTL-expiry path). ~95% load factor max."""

    MAGIC = b"CKF2"
    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int):
        # power-of-two bucket count -> mask indexing
        n = 1
        while n < n_buckets:
            n <<= 1
        self.n_buckets = n
        self.table = np.zeros((n, self.SLOTS), dtype=np.uint16)  # 0 == empty
        self.n_items = 0
        # Classic one-entry victim stash: the homeless fingerprint after
        # MAX_KICKS is kept here (not dropped), so a previously-inserted key
        # can never probe False. (fp, bucket) or None.
        self.victim: tuple[int, int] | None = None

    @classmethod
    def for_capacity(cls, n: int) -> "CuckooFilter":
        return cls(max(8, int(n / (cls.SLOTS * 0.84)) + 1))

    def _fp_i1(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = np.asarray(hashes, dtype=np.uint64)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty marker
        i1 = (h & np.uint64(self.n_buckets - 1)).astype(np.int64)
        return fp, i1

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            off = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
                self.n_buckets - 1
            )
        return (i.astype(np.uint64) ^ off).astype(np.int64)

    def add_many(self, hashes: np.ndarray) -> int:
        """Insert; returns number successfully inserted (full == kicked out
        after MAX_KICKS — callers treat failure as 'rotate to a new shard')."""
        fp, i1 = self._fp_i1(hashes)
        ok = 0
        for f, b in zip(fp, i1):
            if self._insert_one(int(f), int(b)):
                ok += 1
        return ok

    def _insert_one(self, fp: int, i1: int) -> bool:
        for b in (i1, int(self._alt(np.array([i1]), np.array([fp], dtype=np.uint16))[0])):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.n_items += 1
                return True
        if self.victim is not None:
            return False  # full: refuse up front rather than evict + lose a key
        # evict loop
        b = i1
        rng = np.random.default_rng(fp ^ i1)  # deterministic eviction choice
        for _ in range(self.MAX_KICKS):
            s = int(rng.integers(self.SLOTS))
            fp, self.table[b, s] = int(self.table[b, s]), fp
            b = int(self._alt(np.array([b]), np.array([fp], dtype=np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.n_items += 1
                return True
        # Homeless fingerprint after MAX_KICKS: stash it in the victim slot.
        # The requested key is in the table (swapped in during eviction); the
        # evicted one stays queryable via the stash — no false negatives.
        self.victim = (int(fp), int(b))
        self.n_items += 1
        return True

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_i1(hashes)
        i2 = self._alt(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        hit = in1 | in2
        if self.victim is not None:
            vfp, vb = self.victim
            hit |= (fp == np.uint16(vfp)) & ((i1 == vb) | (i2 == vb))
        return hit

    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove one matching fingerprint per key (TTL expiry); returns the
        number deleted."""
        fp, i1 = self._fp_i1(np.asarray(hashes))
        i2 = self._alt(i1, fp)
        deleted = 0
        for f, b1, b2 in zip(fp, i1, i2):
            done = False
            for b in (b1, b2):
                row = self.table[b]
                hit = np.nonzero(row == f)[0]
                if len(hit):
                    row[hit[0]] = 0
                    self.n_items -= 1
                    deleted += 1
                    done = True
                    break
            if not done and self.victim is not None:
                vfp, vb = self.victim
                if int(f) == vfp and (int(b1) == vb or int(b2) == vb):
                    self.victim = None
                    self.n_items -= 1
                    deleted += 1
        # a table delete freed a slot: try to rehome the stashed victim
        if deleted and self.victim is not None:
            vfp, vb = self.victim
            self.victim = None
            self.n_items -= 1
            self._insert_one(vfp, vb)  # victim slot is free -> always succeeds
        return deleted

    def to_bytes(self) -> bytes:
        vfp, vb = self.victim if self.victim is not None else (0, 0)
        head = self.MAGIC + struct.pack("<QQQQ", self.n_buckets, self.n_items, vfp, vb)
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        assert blob[:4] == cls.MAGIC, "not a CKF2 blob"
        n_buckets, n_items, vfp, vb = struct.unpack("<QQQQ", blob[4:36])
        f = cls(n_buckets)
        f.table = np.frombuffer(blob[36:], dtype=np.uint16).reshape(
            n_buckets, cls.SLOTS
        ).copy()
        f.n_items = n_items
        f.victim = (vfp, vb) if vfp else None
        return f
