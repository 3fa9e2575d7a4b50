"""Frontier scheduling column expressions (S1-S6, R1-R5) — pure Catalyst.

Everything here is built-in expressions: priority score, HTTP/error
classification CASE chains, backoff arithmetic, retry routing predicates.
No Python in the hot path; each compiles into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_spark.kernels.classify import RETRYABLE
from crawler_spark.kernels.scoring import PRIORITY_MAX, PRIORITY_MIN, PRIORITY_MULTIPLIER


def priority_score_col(priority: Column, scheduled_at: Column) -> Column:
    """S1: (10 - clamp(priority,0,10)) * 10^12 + epoch_millis(scheduled_at),
    exact int64 (priority_queue.py:89-155 semantics)."""
    clamped = F.greatest(F.lit(PRIORITY_MIN), F.least(F.lit(PRIORITY_MAX), priority))
    # driver parquet carries TIMESTAMP_NTZ; session tz is UTC so the cast is exact
    ts_ms = F.unix_millis(scheduled_at.cast("timestamp"))
    return (F.lit(PRIORITY_MAX) - clamped).cast("long") * F.lit(PRIORITY_MULTIPLIER) + ts_ms


def classify_http_col(status: Column) -> Column:
    """R1: HTTP status -> error category (retry_policy.py:33-140 semantics)."""
    return (
        F.when(status == 404, "not_found")
        .when(status.isin(401, 403), "auth_error")
        .when(status == 429, "rate_limit")
        .when(status == 408, "timeout")
        .when((status >= 400) & (status < 500), "client_error")
        .when((status >= 500) & (status < 600), "server_error")
        .otherwise("unknown")
    )


def is_retryable_col(category: Column) -> Column:
    return category.isin(*sorted(RETRYABLE))


def classify_error_col(
    name: Column, message: Column, module: Column, errno: Column
) -> Column:
    """R2: exception-name -> category, the reference's decision ladder
    (retry_policy.py:143-345) as one CASE chain — fetch UDFs emit
    (error_name, message, module, errno) as data, never exceptions. Mirrors
    kernels/classify.classify_error_name branch for branch (errno 24/28 is
    fd/disk exhaustion; classification is resource_error for any OSError)."""
    from crawler_spark.kernels.classify import (
        _BROWSER_CRASH_NAMES,
        _HTTPX_NETWORK_NAMES,
        _NETWORK_NAMES,
        _RESOURCE_NAMES,
        _TIMEOUT_NAMES,
        _VALIDATION_NAMES,
    )

    return (
        F.when(name.isin(*_TIMEOUT_NAMES), "timeout")
        .when(name.isin(*_NETWORK_NAMES), "network_error")
        .when((module == "httpx") & name.isin(*_HTTPX_NETWORK_NAMES), "network_error")
        .when(name.isin(*_BROWSER_CRASH_NAMES), "browser_crash")
        .when(
            F.lower(name).contains("timeout") | name.contains("TimeoutException"),
            "timeout",
        )
        .when(name.isin(*_VALIDATION_NAMES), "validation_error")
        .when(name.isin(*_RESOURCE_NAMES), "resource_error")
        .otherwise("unknown")
    )


def backoff_col(
    attempt: Column,
    strategy: str = "exponential",
    initial: int = 1,
    max_delay: int = 300,
    multiplier: float = 2.0,
) -> Column:
    """R3 (jitter-free form): truncate-then-cap, absolute 300 s max.
    Deterministic; the jittered variant adds a seeded rand column."""
    if strategy == "exponential":
        raw = F.lit(initial) * F.pow(F.lit(multiplier), attempt.cast("double") - 1)
    elif strategy == "linear":
        raw = F.lit(initial) + F.lit(multiplier) * (attempt.cast("double") - 1)
    elif strategy == "fixed":
        raw = F.lit(initial).cast("double")
    else:
        raise ValueError(f"Unknown backoff strategy: {strategy}")
    return F.least(F.floor(raw), F.lit(max_delay), F.lit(300)).cast("long")


def backoff_jittered_col(base_delay: Column, seed: int, jitter_pct: float = 0.2) -> Column:
    """R3 with deterministic (seeded) ±jitter_pct jitter."""
    jitter_amount = F.floor(base_delay * F.lit(jitter_pct))
    offset = F.floor(F.rand(seed) * (2 * jitter_amount + 1)) - jitter_amount
    return F.greatest(F.lit(0), base_delay + offset).cast("long")


def salt_col(host: Column, pending_count: Column, hot_threshold: int, n_salts: int, url_hash: Column) -> Column:
    """Hot-host salting: hosts with more pending URLs than `hot_threshold`
    spread over `n_salts` sub-partitions keyed by url_hash; cold hosts keep
    salt 0 so their per-host groups stay intact."""
    return F.when(
        pending_count > hot_threshold,
        F.pmod(F.xxhash64(url_hash), F.lit(n_salts)),
    ).otherwise(F.lit(0)).cast("int")


def registered_domain_col(host: Column) -> Column:
    """Registrable domain (public suffix + one label) as pure Catalyst —
    mirrors kernels/urlnorm.registered_domain. The politeness GROUP key:
    subdomain mirrors (www./m./arsip.) of one organization share one budget.
    Suffix set = the .id registry's second-level zones (PSL slice; swap the
    full PSL in for a world-wide crawl)."""
    from crawler_spark.kernels.urlnorm import ID_SECOND_LEVEL_SUFFIXES

    clean = F.regexp_replace(host, "\\.+$", "")
    labels = F.split(clean, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_ip = F.regexp_replace(clean, "\\.", "").rlike("^[0-9]+$")
    return (
        F.when(is_ip | (n <= 2), clean)
        .when(last2.isin(*sorted(ID_SECOND_LEVEL_SUFFIXES)), last3)
        .otherwise(last2)
    )
