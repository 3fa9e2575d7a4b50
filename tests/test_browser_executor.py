"""Browser step executor (sources/browser.py) — reference browser_executor.py
semantics: timeout-config ladder, wait_for/wait_until precedence, non-2xx
error short-circuit, TOLERATED selector-wait misses, per-field extraction
over the rendered DOM, content_length/final_url success metadata, and the
render hook as the honest Playwright stub boundary.

Fetchers are built inside functions (cloudpickle closure-by-value; see
test_api_executor.py).
"""

import pytest

from crawler_spark.sources.browser import (
    browser_batch,
    make_browser_executor,
    resolve_browser_timeouts,
    resolve_wait_until,
)

SELECTORS = {
    "title": "h1.t",
    "nomor": {"selector": "#m span.nomor"},
    "link": {"selector": "a.dl", "attribute": "href"},
    "missing": "div.none",
}


# --------------------------------------------------------------- pure ladder

def test_timeout_ladder_globalconfig_dict():
    # browser_executor.py:68-72
    assert resolve_browser_timeouts(
        {"timeout": {"page_load": 20, "selector_wait": 5}}
    ) == (20000, 5000)
    # partial dict falls back per-key
    assert resolve_browser_timeouts({"timeout": {"page_load": 7}}) == (7000, 10000)
    assert resolve_browser_timeouts({"timeout": {}}) == (30000, 10000)


def test_timeout_ladder_legacy_scalar():
    # browser_executor.py:73-77 — scalar timeout is page_load; selector wait
    # comes from selector_wait_timeout (default 10); floats truncate at ms
    assert resolve_browser_timeouts({"timeout": 45}) == (45000, 10000)
    assert resolve_browser_timeouts(
        {"timeout": 45, "selector_wait_timeout": 7}
    ) == (45000, 7000)
    assert resolve_browser_timeouts({"timeout": 1.5}) == (1500, 10000)


def test_timeout_ladder_missing_or_invalid():
    assert resolve_browser_timeouts({}) == (30000, 10000)
    # non-dict non-number timeout -> defaults (isinstance ladder :77)
    assert resolve_browser_timeouts({"timeout": "soon"}) == (30000, 10000)


def test_wait_until_precedence():
    # :151-152 — wait_for (legacy) wins, then wait_until, then 'load'
    assert resolve_wait_until({"wait_for": "domcontentloaded",
                               "wait_until": "networkidle"}) == "domcontentloaded"
    assert resolve_wait_until({"wait_until": "networkidle"}) == "networkidle"
    assert resolve_wait_until({}) == "load"
    # falsy wait_for falls through like `or` in the reference
    assert resolve_wait_until({"wait_for": None,
                               "wait_until": "commit"}) == "commit"


# ------------------------------------------------------------- batch mapping

def _make_fetcher():
    def fetcher(url):
        if url.endswith("/404"):
            return 404, None, url
        if url.endswith("/503"):
            return 503, None, url
        if url.endswith("/none"):
            return None, "<html><body></body></html>", url
        if url.endswith("/boom"):
            raise ConnectionError("refused")
        if url.endswith("/redir"):
            body = '<html><body><h1 class="t">R</h1></body></html>'
            return 200, body, "http://x/final"
        body = ('<html><body><h1 class="t">T1</h1>'
                '<div id="m"><span class="nomor">NO-1</span></div>'
                '<a class="dl" href="/a.pdf">x</a></body></html>')
        return 200, body, url

    return fetcher


@pytest.fixture(scope="module")
def result(spark):
    urls = spark.createDataFrame(
        [(u,) for u in ["http://x/ok", "http://x/404", "http://x/503",
                        "http://x/none", "http://x/boom", "http://x/redir"]],
        "url string",
    )
    cfg = {
        "timeout": {"page_load": 20, "selector_wait": 5},
        "wait_for": "domcontentloaded",
        "selector_wait": "#m span.nomor",
    }
    rows = browser_batch(urls, _make_fetcher(), SELECTORS, cfg).collect()
    return {r["url"].rsplit("/", 1)[1]: r for r in rows}


def test_success_extraction_and_metadata(result):
    r = result["ok"]
    assert r["success"] and r["status_code"] == 200
    assert r["error_category"] is None
    assert r["title"] == "T1" and r["nomor"] == "NO-1" and r["link"] == "/a.pdf"
    assert r["missing"] is None
    assert r["selector_wait_hit"] is True
    assert r["content_length"] and r["final_url"] == "http://x/ok"
    assert (r["page_load_timeout_ms"], r["selector_wait_timeout_ms"]) == (20000, 5000)
    assert r["wait_until"] == "domcontentloaded"


def test_non_2xx_short_circuits_before_wait(result):
    # :183-189 — error result carries the status; no wait, no extraction
    for k, cat in (("404", "not_found"), ("503", "server_error")):
        r = result[k]
        assert not r["success"] and r["error_category"] == cat
        assert r["selector_wait_hit"] is None and r["content_length"] is None
        assert r["final_url"] is None and r["title"] is None


def test_response_none_proceeds(result):
    # Playwright `response is None` -> status unknown, extraction proceeds
    r = result["none"]
    assert r["success"] and r["status_code"] is None
    assert r["selector_wait_hit"] is False  # wait tolerated, row continues
    assert r["title"] is None and r["content_length"] == 26


def test_transport_exception_classified(result):
    r = result["boom"]
    assert not r["success"] and r["status_code"] is None
    assert r["error_category"] == "network_error"


def test_final_url_after_redirect(result):
    assert result["redir"]["final_url"] == "http://x/final"
    assert result["redir"]["selector_wait_hit"] is False  # no span on page


def test_render_hook_is_applied(spark):
    # the honest JS boundary: a fake render injects markup the static body
    # lacks; extraction must see the RENDERED dom, like page.content()
    def fetcher(url):
        return 200, "<html><body><div id='app'></div></body></html>", url

    def render(url, html):
        return html.replace(
            "<div id='app'></div>", '<div id="app"><h1 class="t">JS</h1></div>'
        )

    urls = spark.createDataFrame([("http://x/spa",)], "url string")
    row = browser_batch(urls, fetcher, {"title": "h1.t"}, {}, render=render).head()
    assert row["title"] == "JS" and row["content_length"] == len(
        '<html><body><div id="app"><h1 class="t">JS</h1></div></body></html>'
    )


def test_static_dom_render_end_to_end(spark):
    """The real render layer behind the hook: a refresh-stub page and an
    iframe page both extract fields the RAW fetched DOM does not carry —
    the browser_executor oracle's h=4/h=5 semantics in miniature."""
    from crawler_spark.kernels.render import static_dom_render

    corpus = {
        "http://x/target": (
            '<html><body><h1 class="t">Rendered</h1></body></html>'
        ),
        "http://x/frame": (
            '<html><body><span class="nomor">NO-7</span></body></html>'
        ),
    }

    def fetcher(url):
        if url == "http://x/refresh":
            return 200, (
                '<html><head><meta http-equiv="refresh" content="0; '
                'url=/target"></head><body></body></html>'
            ), url
        return 200, (
            '<html><body><iframe src="/frame"></iframe></body></html>'
        ), url

    urls = spark.createDataFrame(
        [("http://x/refresh",), ("http://x/framed",)], "url string"
    )
    rows = {
        r["url"]: r
        for r in browser_batch(
            urls, fetcher, {"title": "h1.t", "nomor": "span.nomor"}, {},
            render=static_dom_render(corpus.get),
        ).collect()
    }
    assert rows["http://x/refresh"]["title"] == "Rendered"
    assert rows["http://x/refresh"]["nomor"] is None
    assert rows["http://x/framed"]["nomor"] == "NO-7"
    assert rows["http://x/framed"]["title"] is None


def test_xpath_selector_wait(spark):
    urls = spark.createDataFrame([("http://x/ok",)], "url string")
    cfg = {"selector_wait": "//span[@class='nomor']"}
    row = browser_batch(urls, _make_fetcher(), {}, cfg).head()
    assert row["selector_wait_hit"] is True and row["wait_until"] == "load"


def test_orchestrator_browser_step(spark):
    from crawler_spark.engine.orchestrator import WorkflowOrchestrator

    def load(sp, cfg, inputs):
        return sp.createDataFrame([("http://x/ok",), ("http://x/404",)],
                                  "url string")

    orch = WorkflowOrchestrator(
        spark, {"load": load, "browser": make_browser_executor(_make_fetcher())}
    )
    res = orch.run([
        {"name": "load", "type": "load"},
        {"name": "render", "type": "browser", "input_from": "load",
         "config": {"selectors": {"title": "h1.t"},
                    "timeout": {"page_load": 20}}},
    ])
    assert res["render"].status == "completed" and res["render"].n_rows == 2


def test_browser_retry_config_retries_transient(spark):
    """Review finding: the browser step must honor cfg retry like its
    api/http siblings (the reference wraps navigation in execute_with_retry,
    browser_executor.py:95-100). A 503-then-200 fetcher succeeds on attempt
    2 with attempts recorded."""
    def flaky():
        calls = {"n": 0}

        def fetcher(url):
            calls["n"] += 1
            if calls["n"] == 1:
                return 503, None, url
            return 200, "<html><body><h1>ok</h1></body></html>", url

        return fetcher

    urls = spark.createDataFrame([("http://x/a",)], "url string").coalesce(1)
    rows = browser_batch(
        urls, flaky(), {"h": "h1"},
        retry_config={"max_attempts": 3, "initial_delay_seconds": 0,
                      "max_delay_seconds": 0},
        sleep=lambda s: None,
    ).collect()
    assert rows[0]["status_code"] == 200
    assert rows[0]["success"] is True
    assert rows[0]["attempts"] == 2
    assert rows[0]["h"] == "ok"


def test_browser_reserved_selector_rejected(spark):
    urls = spark.createDataFrame([("http://x/a",)], "url string")
    with pytest.raises(ValueError, match="collide"):
        browser_batch(urls, _make_fetcher(), {"final_url": "h1"})
