"""API step executor (sources/api.py) — reference api_executor.py semantics:
2xx -> JSON parse -> per-field JSON-path extraction (independent failures),
non-2xx -> classified error, invalid JSON -> parsing_error, transport
exception -> classified category, all as data (never a task failure).

Fetchers are built inside functions (cloudpickle pickles closures by value;
a module-level function in tests/ would be pickled by reference and fail to
import on executor workers)."""

import json

import pytest

from crawler_spark.sources.api import api_batch, make_api_executor

SELECTORS = {
    "title": "data.title",
    "first": "data.items.0",
    "n": "data.n",
    "items": {"selector": "data.items", "type": "array"},
    "flag": "flag",
    "missing": "data.nope.deep",
}


def _make_fetcher():
    body = json.dumps({"data": {"title": "T", "items": ["a", "b"], "n": 3},
                       "flag": True})

    def fetcher(url):
        if url.endswith("/404"):
            return 404, None
        if url.endswith("/429"):
            return 429, None
        if url.endswith("/badjson"):
            return 200, "{nope"
        if url.endswith("/boom"):
            raise TimeoutError("slow upstream")
        return 200, body

    return fetcher


@pytest.fixture(scope="module")
def result(spark):
    urls = spark.createDataFrame(
        [(u,) for u in ["http://x/ok", "http://x/404", "http://x/429",
                        "http://x/badjson", "http://x/boom"]],
        "url string",
    )
    rows = api_batch(urls, _make_fetcher(), SELECTORS).collect()
    return {r["url"].rsplit("/", 1)[1]: r for r in rows}


def test_success_extraction(result):
    r = result["ok"]
    assert r["success"] and r["status_code"] == 200 and r["error_category"] is None
    assert r["title"] == "T"          # scalar string passes through unquoted
    assert r["first"] == "a"          # numeric list index path
    assert r["n"] == "3"              # non-string scalar -> JSON encoding
    assert r["flag"] == "true"        # bool -> JSON, not Python repr
    assert json.loads(r["items"]) == ["a", "b"]   # array type -> JSON list
    assert r["missing"] is None       # per-field miss -> NULL, not failure


def test_http_error_branches(result):
    assert (result["404"]["status_code"], result["404"]["error_category"]) == \
        (404, "not_found")
    assert (result["429"]["status_code"], result["429"]["error_category"]) == \
        (429, "rate_limit")
    for k in ("404", "429"):
        assert not result[k]["success"] and result[k]["title"] is None


def test_invalid_json_is_parsing_error(result):
    r = result["badjson"]
    assert r["status_code"] == 200 and not r["success"]
    assert r["error_category"] == "parsing_error"


def test_transport_exception_classified(result):
    r = result["boom"]
    assert r["status_code"] is None and not r["success"]
    assert r["error_category"] == "timeout"  # TimeoutError via the R2 ladder


def _make_html_fetcher():
    html = ('<html><body><h1 class="t">T1</h1>'
            '<a class="dl" href="/a.pdf">x</a><a class="dl" href="/b.pdf">y</a>'
            '</body></html>')

    def fetcher(url):
        if url.endswith("/500"):
            return 500, None
        return 200, html

    return fetcher


def test_http_batch_css_xpath_extraction(spark):
    from crawler_spark.sources.api import http_batch

    urls = spark.createDataFrame([("http://x/ok",), ("http://x/500",)], "url string")
    selectors = {
        "title": "h1.t",
        "xtitle": "//h1[@class='t']/text()",
        "links": {"selector": "a.dl", "attribute": "href", "type": "array"},
        "missing": "div.none",
    }
    rows = {r["url"].rsplit("/", 1)[1]: r
            for r in http_batch(urls, _make_html_fetcher(), selectors).collect()}
    ok = rows["ok"]
    assert ok["success"] and ok["title"] == "T1" and ok["xtitle"] == "T1"
    assert json.loads(ok["links"]) == ["/a.pdf", "/b.pdf"]
    assert ok["missing"] is None
    bad = rows["500"]
    assert not bad["success"] and bad["error_category"] == "server_error"
    # no JSON parse step: an HTML body must never yield parsing_error
    assert ok["error_category"] is None


def test_orchestrator_http_step(spark):
    from crawler_spark.engine.orchestrator import WorkflowOrchestrator
    from crawler_spark.sources.api import make_http_executor

    def load(sp, cfg, inputs):
        return sp.createDataFrame([("http://x/ok",)], "url string")

    orch = WorkflowOrchestrator(
        spark, {"load": load, "http": make_http_executor(_make_html_fetcher())}
    )
    res = orch.run([
        {"name": "load", "type": "load"},
        {"name": "fetch", "type": "http", "input_from": "load",
         "config": {"selectors": {"title": "h1.t"}}},
    ])
    assert res["fetch"].status == "completed" and res["fetch"].n_rows == 1


def test_orchestrator_api_step(spark):
    from crawler_spark.engine.orchestrator import WorkflowOrchestrator

    def load(sp, cfg, inputs):
        return sp.createDataFrame([("http://x/ok",), ("http://x/404",)], "url string")

    orch = WorkflowOrchestrator(
        spark, {"load": load, "api": make_api_executor(_make_fetcher())}
    )
    res = orch.run([
        {"name": "load", "type": "load"},
        {"name": "fetch", "type": "api", "input_from": "load",
         "config": {"selectors": {"title": "data.title"}}},
    ])
    assert res["fetch"].status == "completed" and res["fetch"].n_rows == 2


class TestSchemaCollisions:
    """Review findings: chained request steps and reserved-name selector
    fields must not desync the output schema from the data."""

    def test_chained_request_steps_replace_metadata(self, spark):
        """Feeding one request step's output into another (the orchestrator
        chains them wholesale) replaces status_code/success/error_category
        instead of emitting duplicate columns."""
        urls = spark.createDataFrame([("http://x/ok",)], "url string")
        first = api_batch(urls, _make_fetcher(), {"t1": "data.title"})
        second = api_batch(first, _make_fetcher(), {"t2": "data.n"})
        rows = second.collect()
        assert second.columns.count("status_code") == 1
        assert rows[0]["t1"] == "T" and rows[0]["t2"] == "3"
        assert rows[0]["success"] is True

    def test_reserved_selector_name_rejected_at_plan_time(self, spark):
        urls = spark.createDataFrame([("http://x/ok",)], "url string")
        with pytest.raises(ValueError, match="collide"):
            api_batch(urls, _make_fetcher(), {"success": "data.title"})
        with pytest.raises(ValueError, match="collide"):
            api_batch(urls, _make_fetcher(), {"url": "data.title"})
