"""Simhash kernel (operators C3-C6 in SURVEY.md §2.2), numpy-vectorized.

Behavior-equivalent to ``/root/reference/crawler/utils/simhash.py:59-193``
(tokenize -> md5-per-token -> bitwise ±1 voting -> sign fingerprint; Hamming
distance; similarity %) and the signed<->unsigned int64 mapping in
``/root/reference/crawler/utils/simhash_helpers.py:8-50``. Fresh
implementation: the bit-vote accumulation is a numpy matrix op over unique
tokens weighted by multiplicity (the reference loops per token per bit).

Golden-tested in tests/test_simhash.py against fingerprints minted from the
reference's observed behavior.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np

_PUNCT = re.compile(r"[^\w\s]")  # unicode-aware, same class as the reference
_BITS = np.arange(64, dtype=np.uint64)


def tokenize(text: str) -> list[str]:
    """Lowercase, replace punctuation with spaces, split on whitespace."""
    return _PUNCT.sub(" ", text.lower()).split()


def _token_hash64(token: str) -> int:
    """Low 64 bits of the big-endian md5 integer (masking int(hex,16) to 64b)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[16:], 16)


# Per-worker token-hash memo: natural-language corpora reuse a small
# vocabulary, so md5-per-token amortizes to a dict hit. Bounded by periodic
# reset (executors are long-lived; an unbounded dict over 10^10 pages isn't).
_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_MAX = 1 << 20


def _cached_hash64(token: str) -> int:
    h = _HASH_CACHE.get(token)
    if h is None:
        if len(_HASH_CACHE) >= _HASH_CACHE_MAX:
            _HASH_CACHE.clear()
        h = _HASH_CACHE[token] = _token_hash64(token)
    return h


def simhash64(text: str) -> int | None:
    """Unsigned 64-bit simhash fingerprint; None for empty/token-less text.

    (The reference raises ValueError for empty text; at set scale we map
    that to NULL instead of failing the batch.)
    """
    if not text or not text.strip():
        return None
    tokens = tokenize(text)
    if not tokens:
        return None
    tally = Counter(tokens)
    hashes = np.fromiter(
        (_cached_hash64(t) for t in tally), dtype=np.uint64, count=len(tally)
    )
    counts = np.fromiter(tally.values(), dtype=np.int64, count=len(tally))
    # bit matrix (n_tokens x 64) of {0,1}; votes = sum over tokens of (2b-1)*count
    bits = ((hashes[:, None] >> _BITS) & np.uint64(1)).astype(np.int64)
    votes = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << _BITS).sum(dtype=np.uint64))


def simhash64_signed(text: str) -> int | None:
    """Fingerprint in signed-int64 space (storage form; Spark LongType)."""
    fp = simhash64(text)
    return None if fp is None else to_signed64(fp)


def to_signed64(u: int) -> int:
    """Two's-complement fold of an unsigned 64-bit int into signed int64."""
    return u - (1 << 64) if u >= (1 << 63) else u


def from_signed64(s: int) -> int:
    return s + (1 << 64) if s < 0 else s


def hamming(fp1: int, fp2: int) -> int:
    """Hamming distance between two unsigned (or same-signed) fingerprints."""
    return int(bin((fp1 ^ fp2) & ((1 << 64) - 1)).count("1"))


def similarity_pct(fp1: int, fp2: int, bits: int = 64) -> float:
    return (1 - hamming(fp1, fp2) / bits) * 100.0


def bands(fp_unsigned: int, n_bands: int = 4, bits: int = 64) -> list[int]:
    """Split a fingerprint into n contiguous bands (pigeonhole for the banded
    near-dup join: Hamming <= n_bands-1 implies at least one identical band)."""
    w = bits // n_bands
    mask = (1 << w) - 1
    return [(fp_unsigned >> (i * w)) & mask for i in range(n_bands)]
