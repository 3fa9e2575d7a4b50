"""Vectorized page-parse UDF (X1-X7, C1-C3): HTML -> struct in one pass.

One Arrow batch in, one struct column out: title, ordered span sequence
(the input_hint shape), extracted links, normalized text, exact content
sha256, simhash fingerprint. The HTML is parsed ONCE per row and every field
is derived from that parse — the reference's "parse once, apply many
selectors" optimization (url_extractor.py:113) at batch granularity.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.kernels import contentnorm, htmlparse, simhash
from crawler_spark.kernels.dom import build_tree

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

LINK_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("anchor", T.StringType()),
            T.StructField("preview", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)

PARSE_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("links", LINK_TYPE),
        T.StructField("norm_text", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _parse_one(html: str | None) -> dict:
    if not html:
        return {
            "title": None, "spans": [], "links": [],
            "norm_text": "", "content_sha256": None, "simhash": None,
        }
    # ONE html.parser lex per page: the dom tree serves both the span/link
    # walk (event replay, no second lex) and the C2 normalize pipeline —
    # lexing was ~55% of this kernel's time when each extractor parsed its
    # own copy. normalize_tree mutates (prunes), so it runs last.
    tree = build_tree(html)
    page = htmlparse.parse_page_tree(tree)
    # full C2 pipeline (boilerplate/ads/comments/main-extract/timestamps):
    # dynamic page chrome must never flip the content hash between crawls
    norm = contentnorm.normalize_tree(tree)
    return {
        "title": page["title"],
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in page["spans"]
        ],
        "links": [
            {"href": h, "anchor": a, "preview": v, "pos": p}
            for (h, a, v, p) in page["links"]
        ],
        "norm_text": norm,
        "content_sha256": hashlib.sha256(norm.encode("utf-8")).hexdigest() if norm else None,
        "simhash": simhash.simhash64_signed(norm),
    }


@F.pandas_udf(PARSE_TYPE)
def parse_page_udf(html: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_parse_one(h) for h in html])
