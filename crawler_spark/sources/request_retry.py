"""In-task request retry (the reference's executor_retry.py, synchronous).

The round-level retry path (R4 recirculation through the frontier) costs a
whole superstep per attempt; transient failures are cheaper to absorb INSIDE
the fetch task before the row is emitted. This mirrors
`/root/reference/crawler/services/executor_retry.py:26-245` semantics:

  * no/invalid retry config or max_attempts <= 1 -> single call;
  * a returned non-2xx status is classified (classify_http_status); only
    retryable categories re-attempt, permanent results return as-is;
  * a raised exception is classified (classify_error_name); non-retryable
    re-raises immediately, retryable re-raises once attempts are exhausted;
  * backoff between attempts = calculate_backoff(strategy, attempt, ...)
    with jitter, strategy falling back to exponential when invalid.

Inside a Spark task the sleep blocks one executor thread only; budgets stay
small (max_delay defaults to 60 s, config-capped) so a stuck host degrades
one core, not the stage — the step-level timeout (orchestrator) still bounds
the whole stage wall-clock.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import Any

from crawler_spark.kernels.backoff import calculate_backoff
from crawler_spark.kernels.classify import (
    classify_error_name,
    classify_http_status,
    is_retryable,
)

Response = tuple[int, str | None]

_STRATEGIES = {"exponential", "linear", "fixed"}


def execute_with_retry(
    fn: Callable[[], Response],
    retry_config: dict[str, Any] | None,
    *,
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> tuple[int, str | None, int]:
    """Run a (status, body) request callable under the retry policy.

    Returns (status, body, attempts_used). Raises the last exception when a
    retryable exception exhausts its attempts, and immediately for
    non-retryable exceptions (executor_retry.py:159-216 paths).
    """
    if not retry_config or not isinstance(retry_config, dict):
        status, body = fn()
        return status, body, 1

    max_attempts = retry_config.get("max_attempts", 1)
    initial = retry_config.get("initial_delay_seconds", 1)
    max_delay = retry_config.get("max_delay_seconds", 60)
    strategy = retry_config.get("backoff_strategy", "exponential")
    multiplier = retry_config.get("backoff_multiplier", 2.0)
    if strategy not in _STRATEGIES:  # invalid -> default (executor_retry.py:66-79)
        strategy = "exponential"

    if not isinstance(max_attempts, int) or max_attempts <= 1:
        status, body = fn()
        return status, body, 1

    def _pause(attempt: int) -> None:
        sleep(
            calculate_backoff(
                strategy, attempt, initial, max_delay, multiplier,
                apply_jitter=True, rng=rng,
            )
        )

    for attempt in range(1, max_attempts + 1):
        try:
            status, body = fn()
        except Exception as exc:
            category = classify_error_name(
                type(exc).__name__, str(exc), type(exc).__module__
            )
            if not is_retryable(category) or attempt >= max_attempts:
                raise
            _pause(attempt)
            continue
        if 200 <= status < 300:
            return status, body, attempt
        category = classify_http_status(status)
        if not is_retryable(category) or attempt >= max_attempts:
            return status, body, attempt  # permanent or exhausted: result is data
        _pause(attempt)
    raise RuntimeError("unreachable: retry loop exits via return or raise")
