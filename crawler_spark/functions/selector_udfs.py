"""Vectorized config-driven selector extraction (X5 Spark surface).

The reference runs ``SelectorProcessor.process_selectors({field: selector})``
once per fetched page inside asyncio workers
(`/root/reference/crawler/services/selector_processor.py:34-91`). Here the
same ``{field: selector}`` config is applied to a whole DataFrame of pages
through ONE Arrow-batched pandas UDF returning a typed struct column — one
DOM build per page shared by every field (the reference's parse-once
optimization, `url_extractor.py:113`), no per-row Python round trips.

Scale notes: the selector config is a tiny dict captured in the UDF closure
(ships once per executor, equivalent to a broadcast); the UDF is a pure
per-row map — no shuffle, pipelines with the scan, and parallelism is the
input partitioning. Output schema is derived from the config up front
(string for ``single`` fields, array<string> for ``array`` fields) so
downstream plans stay fully typed.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from crawler_spark.kernels.selectors import build_tree, process_selectors


def _is_array_field(cfg: Any) -> bool:
    return isinstance(cfg, dict) and cfg.get("type") == "array"


def selector_schema(selectors: dict[str, Any]) -> T.StructType:
    """Struct schema for a selector config: single -> string (null on miss /
    error), array -> array<string> (null only on error)."""
    return T.StructType(
        [
            T.StructField(
                name,
                T.ArrayType(T.StringType()) if _is_array_field(cfg) else T.StringType(),
                True,
            )
            for name, cfg in selectors.items()
        ]
    )


def make_selector_udf(selectors: dict[str, Any]):
    """pandas UDF: html string column -> struct of extracted fields."""
    schema = selector_schema(selectors)
    names = list(selectors.keys())
    array_fields = {n for n, c in selectors.items() if _is_array_field(c)}

    @pandas_udf(returnType=schema)
    def _extract(html: pd.Series) -> pd.DataFrame:
        rows = {n: [] for n in names}
        for doc in html:
            tree = build_tree(doc)
            got = process_selectors(tree, selectors)
            for n in names:
                v = got.get(n)
                if n in array_fields and v is not None and not isinstance(v, list):
                    v = [v]
                rows[n].append(v)
        return pd.DataFrame(rows, columns=names)

    return _extract


def extract_with_selectors(
    df: DataFrame, html_col: str | Column, selectors: dict[str, Any],
    out_col: str = "extracted",
) -> DataFrame:
    """Adds ``out_col`` struct with one field per selector entry."""
    udf = make_selector_udf(selectors)
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return df.withColumn(out_col, udf(col))


def extract_json_by_host(
    df: DataFrame,
    html_col: str,
    host_col: str,
    configs: dict[str, dict[str, Any]],
    default: dict[str, Any] | None = None,
    out_col: str = "extracted_json",
) -> DataFrame:
    """Heterogeneous website configs: each host has its own {field: selector}
    map (the reference's per-website JSONB config, executed per page by the
    crawl path — selector_processor callsites in seed_url_crawler). Because
    schemas differ per host, the output is the reference's own shape: the
    `crawled_page.extracted_content` JSON string (current_schema.sql:391-409).

    `configs` is the website dimension table collapsed to a dict — tiny, so
    it rides the UDF closure (broadcast-equivalent); rows from hosts with no
    config get NULL (or `default`'s extraction when provided)."""
    import json

    from crawler_spark.kernels.selectors import build_tree, process_selectors

    @pandas_udf(returnType=T.StringType())
    def _extract(host: pd.Series, html: pd.Series) -> pd.Series:
        out = []
        for h, doc in zip(host, html):
            cfg = configs.get(h, default)
            if not cfg:
                out.append(None)
                continue
            got = process_selectors(build_tree(doc), cfg)
            out.append(json.dumps(got, sort_keys=True, ensure_ascii=False))
        return pd.Series(out)

    return df.withColumn(out_col, _extract(F.col(host_col), F.col(html_col)))


JSONLD_ROW_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("block_idx", T.IntegerType()),
            T.StructField("item_idx", T.IntegerType()),
            T.StructField("item_type", T.StringType()),
            T.StructField("field", T.StringType()),
            T.StructField("idx", T.IntegerType()),
            T.StructField("value", T.StringType()),
        ]
    )
)


def extract_jsonld(df: DataFrame, html_col: str, out_col: str = "jsonld") -> DataFrame:
    """JSON-LD structured-data extraction (kernels/jsonld.py) as a vectorized
    pandas UDF: one DOM build + json parse per page, rows of the flatten
    contract as an array<struct> column. Map-only, no shuffle; explode
    downstream for long-format rows."""

    @pandas_udf(returnType=JSONLD_ROW_TYPE)
    def _extract(html: pd.Series) -> pd.Series:
        from crawler_spark.kernels.jsonld import flatten_jsonld

        return pd.Series([flatten_jsonld(doc) for doc in html])

    return df.withColumn(out_col, _extract(F.col(html_col)))
