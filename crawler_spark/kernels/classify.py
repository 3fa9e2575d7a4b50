"""Error classification kernel (operators R1-R2 in SURVEY.md §2.5).

Behavior-equivalent to ``/root/reference/crawler/services/retry_policy.py``:
HTTP-status classification (retry_policy.py:33-140) and exception-name
classification (retry_policy.py:143-345), expressed as data so the Spark
layer can compile the same mapping into a single CASE WHEN column expression.
"""

from __future__ import annotations

# category -> retryable
CATEGORIES: dict[str, bool] = {
    "not_found": False,
    "auth_error": False,
    "rate_limit": True,
    "timeout": True,
    "client_error": False,
    "server_error": True,
    "network_error": True,
    "browser_crash": True,
    "resource_error": True,
    "parsing_error": False,
    "validation_error": False,
    "unknown": False,
}

RETRYABLE = frozenset(k for k, v in CATEGORIES.items() if v)


def classify_http_status(status_code: int) -> str:
    if status_code == 404:
        return "not_found"
    if status_code in (401, 403):
        return "auth_error"
    if status_code == 429:
        return "rate_limit"
    if status_code == 408:
        return "timeout"
    if 400 <= status_code < 500:
        return "client_error"
    if 500 <= status_code < 600:
        return "server_error"
    return "unknown"


# The reference's exception-classification decision ladder
# (retry_policy.py:143-345), checked IN ORDER: explicit timeout names, stdlib
# network names, httpx network names (module-qualified), browser-crash names,
# the timeout name-substring heuristic, validation names, memory, then
# OSError/ResourceWarning (errno 24/28 = fd/disk exhaustion is logged
# specially but both branches classify as resource — retryable either way).
_TIMEOUT_NAMES = ("TimeoutError", "ConnectTimeout", "ReadTimeout")
_NETWORK_NAMES = (
    "ConnectionError", "DNSError", "SSLError",
    "ConnectionRefusedError", "ConnectionResetError",
)
_HTTPX_NETWORK_NAMES = (
    "ConnectError", "ReadError", "WriteError", "PoolTimeout", "ProtocolError",
)
_BROWSER_CRASH_NAMES = (
    "BrowserCrashError", "TargetClosedError",
    "BrowserContextClosedError", "PageClosedError",
)
_VALIDATION_NAMES = ("StepValidationError", "ValidationError", "ValueError")
# The reference guards the resource branch with isinstance(exc, OSError)
# (retry_policy.py:296): a bare ResourceWarning is NOT an OSError, so only
# the literal name "OSError" ever reaches resource_unavailable there — the
# name-tuple here reproduces the observable behavior, not the source text.
_RESOURCE_NAMES = ("MemoryError", "OSError")


def classify_error_name(
    error_name: str,
    message: str = "",
    module: str = "",
    errno: int | None = None,
) -> str:
    if error_name in _TIMEOUT_NAMES:
        return "timeout"
    if error_name in _NETWORK_NAMES:
        return "network_error"
    if module == "httpx" and error_name in _HTTPX_NETWORK_NAMES:
        return "network_error"
    if error_name in _BROWSER_CRASH_NAMES:
        return "browser_crash"
    if "timeout" in error_name.lower() or "TimeoutException" in error_name:
        return "timeout"
    if error_name in _VALIDATION_NAMES:
        return "validation_error"
    if error_name in _RESOURCE_NAMES:
        # errno in (24, 28) == fd/disk exhaustion (reference logs the errno;
        # classification is resource_error either way)
        return "resource_error"
    # no message-substring fallback: the reference returns UNKNOWN
    # (non-retryable) for anything the name ladder misses
    # (retry_policy.py:328-345)
    return "unknown"


def is_retryable(category: str) -> bool:
    return category in RETRYABLE
