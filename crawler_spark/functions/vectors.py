"""Vector column expressions for embedding similarity — JVM-side.

Dot products / norms ride `zip_with` + `aggregate` (sequential fold, so the
float addition order is deterministic and matches the DuckDB oracle's
list_cosine_similarity after rounding). For very wide vectors a Pandas UDF
with numpy would win on constant factors; at 128-d these built-ins keep the
whole ANN scan inside whole-stage codegen with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_vec(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    a, b = to_double_vec(a), to_double_vec(b)
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def simhash_plane_col(v: Column, plane_seeds: list[int]) -> Column:
    """Deterministic random-hyperplane LSH bucket for an embedding: bit i =
    sign of <v, plane_i>, planes derived from integer seeds via a hash-based
    pseudo-random ±1 pattern (no RNG state, reproducible across engines)."""
    v = to_double_vec(v)
    bits = []
    for i, seed in enumerate(plane_seeds):
        # ±1 pattern per dimension: parity of xxhash64(seed, dim_index)
        signed = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, j: F.when(F.pmod(F.xxhash64(F.lit(seed), j), F.lit(2)) == 0, x).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(signed > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")
