"""Browser step executor (SURVEY.md §2.3 family — the reference's
Playwright/undetected-chrome step type, the last of its five step types).

Reference semantics (`/root/reference/crawler/services/step_executors/
browser_executor.py`):

- Timeout resolution ladder (`_extract_browser_timeouts`, :55-80): GlobalConfig
  dict ``{"page_load": s, "selector_wait": s}`` with defaults 30 / 10 seconds;
  legacy integer ``timeout`` becomes page_load while selector_wait comes from
  ``selector_wait_timeout`` (default 10); output in milliseconds.
- ``wait_until = step_config["wait_for"] or step_config["wait_until"] or
  "load"`` — backward-compat key precedence (:151-152).
- Navigate; a known non-2xx response status is an error result carrying the
  status (:183-189); an *unknown* status (``response is None``) proceeds.
- ``selector_wait``: wait for the selector, but a timeout is TOLERATED — the
  reference logs a warning and continues to content extraction (:192-205).
- Rendered content -> ``SelectorProcessor.process_selectors`` with per-field
  independent failures (:208-215), exactly like the HTTP step.
- The success result carries ``content_length`` and ``final_url`` (``page.url``
  after redirects, :226-232).

Spark-first shape: one ``mapInPandas`` batch map over the URL frame — zero
shuffle, parallelism = input partitioning, exceptions as data (same plan class
as sources/api.py / sources/scrape.py). The browser *rendering* itself
(Playwright, chromium stealth args, :300-340) is infrastructure this sandbox
cannot run: the ``render`` hook is the honest stub boundary. The default
render is the identity (a static page's DOM serialization is the fetched
HTML); pages that require real JavaScript execution need a real browser
behind the same hook. Everything around the render — timeout ladder,
wait_until precedence, status dataflow, tolerated selector-wait, extraction,
content_length/final_url metadata — is real and oracled.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from crawler_spark.kernels.classify import classify_error_name, classify_http_status

# browser fetcher: url -> (status_code | None, body | None, final_url).
# status None mirrors Playwright's `response is None` (e.g. about:blank):
# the reference proceeds to extraction in that case. final_url is page.url
# after redirects. May raise — exceptions become classified error rows.
BrowserFetcher = Callable[[str], tuple[int | None, str | None, str]]

# render hook: (url, fetched_html) -> rendered_html. Identity by default —
# the honest boundary for JS execution (see module docstring).
Render = Callable[[str, str], str]

_DEFAULT_PAGE_LOAD_S = 30
_DEFAULT_SELECTOR_WAIT_S = 10


def resolve_browser_timeouts(step_config: dict[str, Any]) -> tuple[int, int]:
    """browser_executor.py:55-80 ladder, bit-for-bit:

    dict ``timeout`` -> (page_load|30, selector_wait|10); legacy scalar
    ``timeout`` -> (timeout, selector_wait_timeout|10); anything else ->
    (30, 10). Returns milliseconds.
    """
    timeout_config = step_config.get("timeout", {})
    if isinstance(timeout_config, dict):
        page_load_s = timeout_config.get("page_load", _DEFAULT_PAGE_LOAD_S)
        selector_wait_s = timeout_config.get(
            "selector_wait", _DEFAULT_SELECTOR_WAIT_S
        )
    else:
        page_load_s = (
            timeout_config
            if isinstance(timeout_config, (int, float))
            else _DEFAULT_PAGE_LOAD_S
        )
        selector_wait_s = step_config.get(
            "selector_wait_timeout", _DEFAULT_SELECTOR_WAIT_S
        )
    return int(page_load_s * 1000), int(selector_wait_s * 1000)


def resolve_wait_until(step_config: dict[str, Any]) -> str:
    """browser_executor.py:151-152: ``wait_for`` (legacy) takes precedence
    over ``wait_until``; default 'load'."""
    return step_config.get("wait_for") or step_config.get("wait_until", "load")


def make_browser_executor(fetcher: BrowserFetcher, render: Render | None = None):
    """Workflow-orchestrator executor for step type 'browser' (W3 dispatch
    `step_orchestrator.py:583-624`); config carries ``selectors`` plus the
    browser keys (timeout / wait_for / wait_until / selector_wait)."""

    def browser_step(spark, cfg, inputs):
        (src,) = inputs.values()
        return browser_batch(
            src, fetcher, cfg.get("selectors", {}), cfg,
            cfg.get("url_col", "url"), render,
            retry_config=cfg.get("retry"),
        )

    return browser_step


# shared with the api/http executors — the stable cell encoding must stay
# byte-identical across step types (strings pass through, rest JSON)
from crawler_spark.sources.api import _stringify  # noqa: E402


def browser_batch(
    urls: DataFrame,
    fetcher: BrowserFetcher,
    selectors: dict[str, Any],
    step_config: dict[str, Any] | None = None,
    url_col: str = "url",
    render: Render | None = None,
    retry_config: dict[str, Any] | None = None,
    sleep=None,
) -> DataFrame:
    """Per-URL browser navigation + CSS/XPath extraction appended to the
    input frame; never raises. Output adds (status_code, success,
    error_category, page_load_timeout_ms, selector_wait_timeout_ms,
    wait_until, selector_wait_hit, content_length, final_url) plus one
    string column per selector field, in selector order.

    ``selector_wait_hit`` records whether the awaited selector was present
    in the rendered DOM — the batch analogue of ``wait_for_selector``
    succeeding vs timing out (either way the row proceeds, :192-205).

    With a ``retry_config``, navigation retries in-task per
    executor_retry.py policy (the reference wraps browser navigation in
    execute_with_retry, browser_executor.py:95-100) and an ``attempts``
    column records attempts used."""
    step_config = step_config or {}
    page_load_ms, selector_wait_ms = resolve_browser_timeouts(step_config)
    wait_until = resolve_wait_until(step_config)
    selector_wait = step_config.get("selector_wait")
    with_attempts = bool(retry_config)

    fields = list(selectors)
    reserved = [
        "status_code", "success", "error_category", "page_load_timeout_ms",
        "selector_wait_timeout_ms", "wait_until", "selector_wait_hit",
        "content_length", "final_url",
    ] + (["attempts"] if with_attempts else [])
    clash = [f for f in fields if f in reserved or f == url_col]
    if clash:
        # same contract as sources/api.py: a selector field named like a
        # metadata column desyncs schema from data — fail at plan time
        raise ValueError(
            f"selector field names collide with browser metadata: {clash}"
        )
    # chained steps: this step's metadata/extraction REPLACES same-named
    # upstream columns (per-step ExecutionResult semantics)
    drop = [c for c in urls.columns if c in reserved or c in fields]
    if drop:
        urls = urls.drop(*drop)
    schema = T.StructType(
        list(urls.schema.fields)
        + [
            T.StructField("status_code", T.IntegerType()),
            T.StructField("success", T.BooleanType()),
            T.StructField("error_category", T.StringType()),
            T.StructField("page_load_timeout_ms", T.IntegerType()),
            T.StructField("selector_wait_timeout_ms", T.IntegerType()),
            T.StructField("wait_until", T.StringType()),
            T.StructField("selector_wait_hit", T.BooleanType()),
            T.StructField("content_length", T.IntegerType()),
            T.StructField("final_url", T.StringType()),
        ]
        + ([T.StructField("attempts", T.IntegerType())] if with_attempts else [])
        + [T.StructField(f, T.StringType()) for f in fields]
    )

    def _run(batches):
        import time as _time

        from crawler_spark.kernels.dom import build_tree
        from crawler_spark.kernels.selectors import (
            css_select,
            detect_selector_type,
            process_selectors,
            xpath_select,
        )
        from crawler_spark.sources.request_retry import execute_with_retry

        _sleep = sleep if sleep is not None else _time.sleep

        def _wait_hit(tree) -> bool:
            # Playwright's wait_for_selector takes CSS or //-prefixed XPath;
            # same dispatch as the selector processor.
            try:
                if detect_selector_type(selector_wait) == "xpath":
                    return bool(xpath_select(tree, selector_wait))
                return bool(css_select(tree, selector_wait, select_all=False))
            except Exception:
                return False

        for pdf in batches:
            out: dict[str, list] = {
                "status_code": [], "success": [], "error_category": [],
                "selector_wait_hit": [], "content_length": [], "final_url": [],
                **({"attempts": []} if with_attempts else {}),
                **{f: [] for f in fields},
            }
            for url in pdf[url_col]:
                status: int | None = None
                category: str | None = None
                waited: bool | None = None
                length: int | None = None
                final: str | None = None
                extracted: dict[str, Any] = {}
                ok = False
                attempts: int | None = None
                try:
                    if with_attempts:
                        # pack (body, final_url) through the 2-tuple retry
                        # wrapper; retryable statuses/exceptions re-navigate
                        def _nav(u=url):
                            s, b, f = fetcher(u)
                            return s, (b, f)

                        status, packed, attempts = execute_with_retry(
                            _nav, retry_config, sleep=_sleep
                        )
                        body, final_url = (
                            packed if packed is not None else (None, None)
                        )
                    else:
                        status, body, final_url = fetcher(url)
                    if status is not None and not 200 <= status < 300:
                        # :183-189 — known bad status fails before any wait
                        category = classify_http_status(status)
                        final = None
                    else:
                        content = body if body is not None else ""
                        if render is not None:
                            content = render(url, content)
                        tree = build_tree(content)
                        if selector_wait:
                            waited = _wait_hit(tree)
                        extracted = process_selectors(tree, selectors)
                        length = len(content)
                        final = final_url
                        ok = True
                except Exception as exc:  # transport / render error -> data
                    category = classify_error_name(
                        type(exc).__name__, str(exc), type(exc).__module__
                    )
                out["status_code"].append(status)
                out["success"].append(ok)
                out["error_category"].append(category)
                out["selector_wait_hit"].append(waited)
                out["content_length"].append(length)
                out["final_url"].append(final)
                if with_attempts:
                    out["attempts"].append(attempts)
                for f in fields:
                    out[f].append(_stringify(extracted.get(f)) if ok else None)
            pdf = pdf.copy()
            pdf["page_load_timeout_ms"] = page_load_ms
            pdf["selector_wait_timeout_ms"] = selector_wait_ms
            pdf["wait_until"] = wait_until
            for k, v in out.items():
                pdf[k] = v
            yield pdf[[f.name for f in schema.fields]]

    return urls.mapInPandas(_run, schema)
