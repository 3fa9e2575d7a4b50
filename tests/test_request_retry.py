"""In-task request retry (sources/request_retry.py) — mirrors the scenario
set of reference tests/unit/services/test_executor_retry.py, synchronously."""

import pytest

from crawler_spark.sources.request_retry import execute_with_retry

CFG = {
    "max_attempts": 3,
    "initial_delay_seconds": 1,
    "max_delay_seconds": 60,
    "backoff_strategy": "exponential",
    "backoff_multiplier": 2.0,
}


class Recorder:
    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.calls = 0
        self.sleeps = []

    def fn(self):
        out = self.outcomes[min(self.calls, len(self.outcomes) - 1)]
        self.calls += 1
        if isinstance(out, Exception):
            raise out
        return out

    def sleep(self, s):
        self.sleeps.append(s)


def test_no_retry_config_executes_once():
    r = Recorder([(503, None)])
    assert execute_with_retry(r.fn, None, sleep=r.sleep) == (503, None, 1)
    assert r.calls == 1 and r.sleeps == []


def test_max_attempts_one_executes_once():
    r = Recorder([(503, None)])
    cfg = dict(CFG, max_attempts=1)
    assert execute_with_retry(r.fn, cfg, sleep=r.sleep) == (503, None, 1)
    assert r.calls == 1


def test_success_no_retry():
    r = Recorder([(200, "ok")])
    assert execute_with_retry(r.fn, CFG, sleep=r.sleep) == (200, "ok", 1)
    assert r.calls == 1 and r.sleeps == []


def test_retryable_status_retries_and_succeeds():
    r = Recorder([(503, None), (200, "ok")])
    assert execute_with_retry(r.fn, CFG, sleep=r.sleep) == (200, "ok", 2)
    assert r.calls == 2 and len(r.sleeps) == 1


def test_permanent_status_no_retry():
    r = Recorder([(404, None), (200, "never")])
    assert execute_with_retry(r.fn, CFG, sleep=r.sleep) == (404, None, 1)
    assert r.calls == 1


def test_all_retries_exhausted_returns_failure():
    r = Recorder([(429, None)])
    assert execute_with_retry(r.fn, CFG, sleep=r.sleep) == (429, None, 3)
    assert r.calls == 3 and len(r.sleeps) == 2


def test_retryable_exception_retries():
    r = Recorder([TimeoutError("slow"), (200, "ok")])
    assert execute_with_retry(r.fn, CFG, sleep=r.sleep) == (200, "ok", 2)


def test_permanent_exception_raises_immediately():
    r = Recorder([ValueError("bad config"), (200, "never")])
    with pytest.raises(ValueError):
        execute_with_retry(r.fn, CFG, sleep=r.sleep)
    assert r.calls == 1


def test_exception_retries_exhausted_raises():
    r = Recorder([ConnectionError("down")])
    with pytest.raises(ConnectionError):
        execute_with_retry(r.fn, CFG, sleep=r.sleep)
    assert r.calls == 3


def test_backoff_delay_increases():
    import random

    r = Recorder([(503, None)])
    cfg = dict(CFG, max_attempts=4)
    execute_with_retry(r.fn, cfg, sleep=r.sleep, rng=random.Random(7))
    assert len(r.sleeps) == 3
    # exponential base 1,2,4 with +-20% jitter: strictly ordered windows
    assert r.sleeps[0] <= 2 and r.sleeps[1] <= 3 and r.sleeps[2] >= r.sleeps[1]


def test_invalid_backoff_strategy_uses_default():
    r = Recorder([(503, None), (200, "ok")])
    cfg = dict(CFG, backoff_strategy="warp-speed")
    assert execute_with_retry(r.fn, cfg, sleep=r.sleep) == (200, "ok", 2)


def test_request_batch_attempts_column(spark):
    """api_batch with retry_config: flaky URL succeeds on attempt 2, the
    permanent 404 stays at one attempt, exhausted 429 records max attempts."""
    from crawler_spark.sources.api import http_batch

    def make_fetcher():
        calls = {}

        def fetcher(url):
            n = calls[url] = calls.get(url, 0) + 1
            if url.endswith("/flaky"):
                return (503, None) if n == 1 else (200, "<p>ok</p>")
            if url.endswith("/gone"):
                return 404, None
            if url.endswith("/limit"):
                return 429, None
            return 200, "<p>ok</p>"

        return fetcher

    urls = spark.createDataFrame(
        [("http://x/flaky",), ("http://x/gone",), ("http://x/limit",), ("http://x/ok",)],
        "url string",
    ).coalesce(1)  # one task so the closure's call-count dict sees both attempts
    out = http_batch(
        urls, make_fetcher(), {}, retry_config=dict(CFG), sleep=lambda s: None
    )
    rows = {r.url.rsplit("/", 1)[1]: r for r in out.collect()}
    assert rows["flaky"].attempts == 2 and rows["flaky"].success
    assert rows["gone"].attempts == 1 and not rows["gone"].success
    assert rows["limit"].attempts == 3 and rows["limit"].status_code == 429
    assert rows["ok"].attempts == 1 and rows["ok"].success
