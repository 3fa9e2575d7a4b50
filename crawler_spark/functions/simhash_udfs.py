"""Simhash Spark layer (C3-C6): fingerprint pandas UDF + JVM-side distance.

Fingerprinting needs Python (md5 token votes) -> Arrow-batched pandas UDF.
Distance/similarity/banding are pure bit arithmetic -> built-in expressions
inside whole-stage codegen (`bit_count`, xor, shifts) so the O(candidate-pairs)
part of near-dup joins never leaves the JVM.

Fingerprints live in signed-int64 space (two's complement), matching the
reference's Postgres BIGINT storage convention (simhash_helpers.py:8-50).
XOR/bit_count/shift-mask are representation-independent, so banding and
hamming work directly on the signed values.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.kernels import simhash as K


@F.pandas_udf(T.LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: K.simhash64_signed(t) if isinstance(t, str) else None)


def hamming_col(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-int64 fingerprints (JVM-side)."""
    return F.bit_count(a.bitwiseXOR(b))


def similarity_col(a: Column, b: Column, bits: int = 64) -> Column:
    return (F.lit(1.0) - hamming_col(a, b) / F.lit(float(bits))) * 100.0


def band_col(fp: Column, band_idx: int, n_bands: int = 4, bits: int = 64) -> Column:
    """Extract band `band_idx` (contiguous bits) of a fingerprint column."""
    width = bits // n_bands
    mask = (1 << width) - 1
    return F.shiftrightunsigned(fp, band_idx * width).bitwiseAND(F.lit(mask))


def bands_array(fp: Column, n_bands: int = 4, bits: int = 64) -> Column:
    return F.array(*[band_col(fp, i, n_bands, bits) for i in range(n_bands)])
