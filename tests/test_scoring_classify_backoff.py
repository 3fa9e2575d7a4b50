"""Golden tests for priority scoring (S1), classification (R1-R2), backoff (R3).

Score goldens from the reference's priority_queue.py:114-131 docstring;
backoff goldens from retry_policy.py:602-748 docstrings.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pytest

from crawler_spark.kernels.backoff import (
    backoff_exponential,
    backoff_fixed,
    backoff_linear,
    calculate_backoff,
    parse_retry_after,
)
from crawler_spark.kernels.classify import (
    classify_error_name,
    classify_http_status,
    is_retryable,
)
from crawler_spark.kernels.scoring import priority_score


def ts(y, m, d):
    return datetime(y, m, d, tzinfo=timezone.utc)


def test_priority_score_goldens():
    # Goldens match the reference CODE (priority_queue.py:153), not its
    # docstring examples, which are internally inconsistent with the code
    # (the docstring shows an extra *1000 on the priority component).
    assert priority_score(10, ts(2024, 1, 1)) == 1704067200000
    assert priority_score(5, ts(2024, 1, 1)) == 6704067200000
    assert priority_score(0, ts(2024, 1, 1)) == 11704067200000
    assert priority_score(5, ts(2024, 1, 2)) == 6704153600000


def test_priority_clamp_and_ordering():
    assert priority_score(99, ts(2024, 1, 1)) == priority_score(10, ts(2024, 1, 1))
    assert priority_score(-3, ts(2024, 1, 1)) == priority_score(0, ts(2024, 1, 1))
    # higher priority always drains before lower, regardless of time
    assert priority_score(10, ts(2030, 1, 1)) < priority_score(9, ts(2020, 1, 1))
    # same priority: earlier time first
    assert priority_score(5, ts(2024, 1, 1)) < priority_score(5, ts(2024, 1, 2))


def test_naive_datetime_treated_as_utc():
    assert priority_score(5, datetime(2024, 1, 1)) == 6704067200000


HTTP_CASES = [
    (404, "not_found", False), (401, "auth_error", False), (403, "auth_error", False),
    (429, "rate_limit", True), (408, "timeout", True), (400, "client_error", False),
    (418, "client_error", False), (500, "server_error", True), (503, "server_error", True),
    (599, "server_error", True), (200, "unknown", False), (302, "unknown", False),
]


@pytest.mark.parametrize("code,cat,retryable", HTTP_CASES)
def test_http_classification(code, cat, retryable):
    assert classify_http_status(code) == cat
    assert is_retryable(cat) == retryable


def test_exception_classification():
    assert classify_error_name("TimeoutError") == "timeout"
    assert classify_error_name("ConnectionResetError") == "network_error"
    assert classify_error_name("ValueError") == "validation_error"
    # no message fallback: the reference ladder returns UNKNOWN for names it
    # doesn't recognize regardless of the message (retry_policy.py:328-345)
    assert classify_error_name("SomeWeirdError", "read timeout on socket") == "unknown"
    # ResourceWarning-by-name is NOT resource_error: the reference requires
    # isinstance(exc, OSError), which a ResourceWarning never satisfies
    assert classify_error_name("ResourceWarning") == "unknown"
    assert classify_error_name("SomeWeirdError", "boom") == "unknown"


def test_exponential_backoff_goldens():
    assert backoff_exponential(1, 1, 300, 2.0) == 1
    assert backoff_exponential(2, 1, 300, 2.0) == 2
    assert backoff_exponential(3, 1, 300, 2.0) == 4
    assert backoff_exponential(11, 1, 300, 2.0) == 300


def test_linear_fixed_goldens():
    assert backoff_linear(1, 5, 60, 1.5) == 5
    assert backoff_linear(2, 5, 60, 1.5) == 6
    assert backoff_linear(50, 5, 60, 1.5) == 60
    assert backoff_fixed(10, 60) == 10
    assert backoff_fixed(100, 60) == 60


def test_retry_after():
    assert parse_retry_after("120") == 120
    assert parse_retry_after(None) is None
    assert parse_retry_after("invalid") is None
    now = datetime(2025, 10, 21, 7, 0, 0, tzinfo=timezone.utc)
    assert parse_retry_after("Tue, 21 Oct 2025 07:28:00 GMT", now=now) == 28 * 60
    assert parse_retry_after("Tue, 21 Oct 2025 06:00:00 GMT", now=now) == 0  # past -> 0


def test_calculate_backoff():
    assert calculate_backoff("exponential", 2, 1, 300, 2.0) == 2
    assert calculate_backoff("exponential", 1, 1, 300, 2.0, retry_after="60") == 60
    assert calculate_backoff("exponential", 1, 1, 100, 2.0, retry_after="500") == 100  # capped
    assert calculate_backoff("fixed", 9, 400, 1000, 1.0) == 300  # absolute 300s cap
    with pytest.raises(ValueError):
        calculate_backoff("bogus", 1, 1, 300, 2.0)


def test_jitter_bounds_deterministic():
    rng = random.Random(42)
    for _ in range(50):
        d = calculate_backoff("exponential", 5, 10, 300, 2.0, apply_jitter=True, rng=rng)
        assert 128 <= d <= 192  # 160 ± 20%
