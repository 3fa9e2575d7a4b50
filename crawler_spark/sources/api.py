"""API step executor (SURVEY.md §2.3 — the reference's JSON-API step type).

Reference semantics (`/root/reference/crawler/services/step_executors/
api_executor.py:93-199`): request the URL; non-2xx -> error result carrying
the status; 2xx -> parse JSON (parse failure -> error result); then JSON-path
selector extraction per configured field via the selector processor
(`selector_processor.py:34-91,179-226`), each field failing independently to
None. Transport exceptions -> classified error categories
(`retry_policy.py:143-345`).

Spark-first shape: like sources/scrape.py this is an embarrassingly-parallel
``mapInPandas`` over the URL frame — the Arrow batch is the request batch,
exceptions become data, parallelism = input partitioning, zero shuffle. The
extracted fields come back as ONE COLUMN PER FIELD (stringified scalars,
JSON-encoded lists), not a map column, so downstream plans get column
pruning and predicate pushdown on extracted values for free.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from crawler_spark.kernels.classify import classify_error_name, classify_http_status

# fetcher: url -> (status_code, body_text | None); may raise — the map
# converts exceptions into error rows (executor_retry.py boundary semantics)
Fetcher = Callable[[str], tuple[int, str | None]]


def _stringify(value: Any) -> str | None:
    """Stable cell encoding for extracted values: strings pass through,
    everything else (numbers, bools, lists, dicts, None) is JSON-encoded —
    deterministic and replayable from SQL."""
    if value is None:
        return None
    if isinstance(value, str):
        return value
    return json.dumps(value)


def make_api_executor(fetcher: Fetcher):
    """Workflow-orchestrator executor for step type 'api' (W3 dispatch):
    the step config carries the JSON-path ``selectors`` map (and optionally
    ``url_col``); the upstream step supplies the URL frame."""

    def api_step(spark, cfg, inputs):
        (src,) = inputs.values()
        return api_batch(
            src, fetcher, cfg.get("selectors", {}), cfg.get("url_col", "url"),
            retry_config=cfg.get("retry"),
        )

    return api_step


def make_http_executor(fetcher: Fetcher):
    """Workflow-orchestrator executor for step type 'http' (the reference's
    HTTPExecutor, `http_executor.py:68-213`): same request/error dataflow as
    the API step but the 2xx body is extracted directly as HTML via CSS /
    XPath selectors (no JSON parse)."""

    def http_step(spark, cfg, inputs):
        (src,) = inputs.values()
        return http_batch(
            src, fetcher, cfg.get("selectors", {}), cfg.get("url_col", "url"),
            retry_config=cfg.get("retry"),
        )

    return http_step


def api_batch(
    urls: DataFrame,
    fetcher: Fetcher,
    selectors: dict[str, Any],
    url_col: str = "url",
    retry_config: dict[str, Any] | None = None,
    sleep=None,
) -> DataFrame:
    """Per-URL API request + JSON-path extraction appended to the input
    frame; never raises. Output adds (status_code, success, error_category)
    plus one string column per selector field, in selector order. With a
    retry_config, requests retry in-task per executor_retry.py policy and an
    `attempts` column records attempts used (NULL when the final outcome was
    a transport exception)."""
    return _request_batch(
        urls, fetcher, selectors, url_col, json_mode=True,
        retry_config=retry_config, sleep=sleep,
    )


def http_batch(
    urls: DataFrame,
    fetcher: Fetcher,
    selectors: dict[str, Any],
    url_col: str = "url",
    retry_config: dict[str, Any] | None = None,
    sleep=None,
) -> DataFrame:
    """Per-URL page request + CSS/XPath extraction over the HTML body
    (http_executor.py:171-174: one DOM build, per-field extraction with
    independent failures); same error dataflow as api_batch minus the JSON
    parse step."""
    return _request_batch(
        urls, fetcher, selectors, url_col, json_mode=False,
        retry_config=retry_config, sleep=sleep,
    )


def _request_batch(
    urls: DataFrame,
    fetcher: Fetcher,
    selectors: dict[str, Any],
    url_col: str,
    json_mode: bool,
    retry_config: dict[str, Any] | None = None,
    sleep=None,
) -> DataFrame:
    from crawler_spark.kernels.selectors import process_selectors
    from crawler_spark.sources.request_retry import execute_with_retry

    with_attempts = bool(retry_config)
    fields = list(selectors)
    reserved = ["status_code", "success", "error_category"] + (
        ["attempts"] if with_attempts else []
    )
    clash = [f for f in fields if f in reserved or f == url_col]
    if clash:
        # a selector field named like a metadata column would collapse two
        # outputs into one pandas column and desync from the schema — fail
        # loudly at plan time instead of inside the task
        raise ValueError(
            f"selector field names collide with request metadata: {clash}"
        )
    # chained request steps: a prior step's metadata/extraction columns are
    # REPLACED by this step's (the reference's per-step ExecutionResult),
    # so drop same-named input columns instead of emitting duplicates that
    # desync schema from data
    drop = [c for c in urls.columns if c in reserved or c in fields]
    if drop:
        urls = urls.drop(*drop)
    schema = T.StructType(
        list(urls.schema.fields)
        + [
            T.StructField("status_code", T.IntegerType()),
            T.StructField("success", T.BooleanType()),
            T.StructField("error_category", T.StringType()),
        ]
        + ([T.StructField("attempts", T.IntegerType())] if with_attempts else [])
        + [T.StructField(f, T.StringType()) for f in fields]
    )

    def _run(batches):
        import time as _time

        _sleep = sleep if sleep is not None else _time.sleep
        for pdf in batches:
            out: dict[str, list] = {
                "status_code": [], "success": [], "error_category": [],
                **({"attempts": []} if with_attempts else {}),
                **{f: [] for f in fields},
            }
            for url in pdf[url_col]:
                status: int | None = None
                category: str | None = None
                extracted: dict[str, Any] = {}
                ok = False
                attempts: int | None = None
                try:
                    if with_attempts:
                        status, body, attempts = execute_with_retry(
                            lambda u=url: fetcher(u), retry_config, sleep=_sleep
                        )
                    else:
                        status, body = fetcher(url)
                    if 200 <= status < 300:
                        if json_mode:
                            try:
                                data = json.loads(body if body is not None else "")
                            except Exception:
                                data = None
                                category = "parsing_error"
                        else:
                            data = body if body is not None else ""
                        if category is None:
                            # api_executor.py:171-175 — selector misses are
                            # per-field None, never a request failure
                            extracted = process_selectors(data, selectors)
                            ok = True
                    else:
                        category = classify_http_status(status)
                except Exception as exc:  # transport error -> data
                    category = classify_error_name(
                        type(exc).__name__, str(exc), type(exc).__module__
                    )
                out["status_code"].append(status)
                out["success"].append(ok)
                out["error_category"].append(category)
                if with_attempts:
                    out["attempts"].append(attempts)
                for f in fields:
                    out[f].append(_stringify(extracted.get(f)) if ok else None)
            pdf = pdf.copy()
            for k, v in out.items():
                pdf[k] = v
            yield pdf

    return urls.mapInPandas(_run, schema)
