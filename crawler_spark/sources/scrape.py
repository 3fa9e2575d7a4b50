"""Scrape-executor batch map (P7 — SURVEY.md §2.3).

The reference's ScrapeExecutor fetches URL batches of 100 with
``asyncio.gather``, tolerates partial failure (per-URL results carry their
own success flag; the step errors only if ALL URLs fail), and emits a
single-URL shape vs an ``items[]`` list shape
(`/root/reference/crawler/step_executors/scrape_executor.py:46,71-259`).

Spark-first shape: the batch IS the Arrow batch — ``mapInPandas`` over the
URL frame, one fetcher call per row, NEVER raising: failures become rows
with success=false + error_category (exceptions-as-data, the engine's R2
convention). Step-level aggregation then applies the all-fail rule. Unlike
sources/fetch.py (the politeness-paced crawl path with per-host ordering and
stop detection), this path is an unordered embarrassingly-parallel map — no
shuffle, no pacing, parallelism = input partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.kernels.classify import classify_http_status

# fetcher: url -> (status_code, content | None); it may raise — the map
# converts exceptions to error rows (executor_retry.py boundary semantics)
Fetcher = Callable[[str], tuple[int, str | None]]

_RESULT_FIELDS = [
    T.StructField("status_code", T.IntegerType()),
    T.StructField("success", T.BooleanType()),
    T.StructField("content", T.StringType()),
    T.StructField("error_category", T.StringType()),
]


def scrape_batch(urls: DataFrame, fetcher: Fetcher, url_col: str = "url") -> DataFrame:
    """Per-row fetch results appended to the input frame; never raises."""
    schema = T.StructType(list(urls.schema.fields) + _RESULT_FIELDS)

    def _run(batches):
        for pdf in batches:
            out = {"status_code": [], "success": [], "content": [], "error_category": []}
            for url in pdf[url_col]:
                try:
                    status, content = fetcher(url)
                    ok = status == 200 and content is not None
                    out["status_code"].append(status)
                    out["success"].append(ok)
                    out["content"].append(content if ok else None)
                    out["error_category"].append(
                        None if ok else classify_http_status(status)
                    )
                except Exception as exc:  # exceptions -> data, never a task fail
                    out["status_code"].append(None)
                    out["success"].append(False)
                    out["content"].append(None)
                    out["error_category"].append(type(exc).__name__)
            pdf = pdf.copy()
            for k, v in out.items():
                pdf[k] = v
            yield pdf

    return urls.mapInPandas(_run, schema)


def batch_outcomes(results: DataFrame, batch_col: str) -> DataFrame:
    """Step-level partial-failure rule: a batch errors only if ALL of its
    URLs failed (scrape_executor.py:214-259); single-URL batches keep the
    single shape flag (vs items[])."""
    return results.groupBy(batch_col).agg(
        F.count("*").alias("n_urls"),
        F.sum(F.col("success").cast("int")).alias("n_success"),
        (F.sum(F.col("success").cast("int")) == 0).alias("batch_error"),
        (F.count("*") == 1).alias("single_shape"),
    )
