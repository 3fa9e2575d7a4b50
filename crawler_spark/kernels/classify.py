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


# exception-class-name -> category (name-based, as the reference's mapping;
# a 'timeout' substring in the message is a fallback heuristic)
EXCEPTION_NAME_MAP: dict[str, str] = {
    "TimeoutError": "timeout",
    "asyncio.TimeoutError": "timeout",
    "ConnectionError": "network_error",
    "ConnectionResetError": "network_error",
    "ConnectionRefusedError": "network_error",
    "ConnectionAbortedError": "network_error",
    "BrokenPipeError": "network_error",
    "OSError": "network_error",
    "ValueError": "validation_error",
    "TypeError": "validation_error",
    "KeyError": "parsing_error",
    "AttributeError": "parsing_error",
}


def classify_error_name(error_name: str, message: str = "") -> str:
    if error_name in EXCEPTION_NAME_MAP:
        return EXCEPTION_NAME_MAP[error_name]
    if "timeout" in (message or "").lower() or "timeout" in error_name.lower():
        return "timeout"
    return "unknown"


def is_retryable(category: str) -> bool:
    return category in RETRYABLE
