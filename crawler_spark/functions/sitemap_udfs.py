"""Vectorized sitemap discovery/parsing (Spark surface of kernels/sitemap.py).

Both UDFs are pure per-row maps over Arrow batches — no shuffle, pipeline
with the scan; fan-out happens downstream via `explode`, exactly like the
span/link extraction UDFs (functions/parse_udfs.py). At 100 TB the sitemap
corpus is tiny relative to pages (one robots + a few sitemap files per host),
so these stages are never the bottleneck; they exist to FEED the frontier.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from crawler_spark.kernels.sitemap import parse_sitemap, sitemap_urls

SITEMAP_ENTRY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType(), False),
            T.StructField("loc", T.StringType(), False),
            T.StructField("lastmod", T.StringType(), True),
            T.StructField("changefreq", T.StringType(), True),
            T.StructField("priority", T.DoubleType(), False),
        ]
    )
)


@pandas_udf(returnType=T.ArrayType(T.StringType()))
def sitemap_urls_udf(robots_text: pd.Series) -> pd.Series:
    """robots.txt text -> list of declared Sitemap URLs (file order)."""
    return robots_text.map(lambda t: sitemap_urls(t) if isinstance(t, str) else [])


@pandas_udf(returnType=SITEMAP_ENTRY_TYPE)
def parse_sitemap_udf(xml_text: pd.Series) -> pd.Series:
    """sitemap XML -> array<struct<kind,loc,lastmod,changefreq,priority>>."""

    def one(t):
        if not isinstance(t, str):
            return []
        return [
            {
                "kind": e.kind,
                "loc": e.loc,
                "lastmod": e.lastmod,
                "changefreq": e.changefreq,
                "priority": e.priority,
            }
            for e in parse_sitemap(t)
        ]

    return xml_text.map(one)
