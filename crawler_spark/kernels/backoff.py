"""Retry backoff kernel (operator R3 in SURVEY.md §2.5).

Behavior-equivalent to ``/root/reference/crawler/services/retry_policy.py:519-748``:
exponential / linear / fixed strategies, truncation-then-cap, ±jitter, and a
Retry-After override (delay-seconds or HTTP-date) that still respects the cap.
All caps also respect the 300 s absolute maximum.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

ABS_MAX_DELAY = 300


def backoff_exponential(attempt: int, initial: int, max_delay: int, multiplier: float) -> int:
    # attempt is 1-indexed; first retry gets initial * multiplier^0
    return min(int(initial * (multiplier ** (attempt - 1))), max_delay)


def backoff_linear(attempt: int, initial: int, max_delay: int, multiplier: float) -> int:
    return min(int(initial + multiplier * (attempt - 1)), max_delay)


def backoff_fixed(initial: int, max_delay: int) -> int:
    return min(initial, max_delay)


def add_jitter(delay: int, jitter_pct: float = 0.2, rng: random.Random | None = None) -> int:
    """±jitter_pct jitter; pass a seeded Random for determinism in tests."""
    if not 0 <= jitter_pct <= 1:
        jitter_pct = 0.2
    r = rng or random
    amount = int(delay * jitter_pct)
    return max(0, delay + r.randint(-amount, amount))


def parse_retry_after(value: str | None, now: datetime | None = None) -> int | None:
    """'120' -> 120; HTTP-date -> seconds from `now` (clamped >= 0)."""
    if not value:
        return None
    try:
        return int(value)
    except ValueError:
        pass
    try:
        target = parsedate_to_datetime(value)
        now = now or datetime.now(timezone.utc)
        return max(0, int((target - now).total_seconds()))
    except (ValueError, TypeError, OverflowError):
        return None


def calculate_backoff(
    strategy: str,
    attempt: int,
    initial: int,
    max_delay: int,
    multiplier: float,
    *,
    apply_jitter: bool = False,
    jitter_pct: float = 0.2,
    retry_after: str | None = None,
    rng: random.Random | None = None,
    now: datetime | None = None,
) -> int:
    ra = parse_retry_after(retry_after, now=now)
    if ra is not None:
        return min(ra, max_delay)
    if strategy == "exponential":
        delay = backoff_exponential(attempt, initial, max_delay, multiplier)
    elif strategy == "linear":
        delay = backoff_linear(attempt, initial, max_delay, multiplier)
    elif strategy == "fixed":
        delay = backoff_fixed(initial, max_delay)
    else:
        raise ValueError(f"Unknown backoff strategy: {strategy}")
    if apply_jitter:
        delay = add_jitter(delay, jitter_pct, rng)
    return min(delay, max_delay, ABS_MAX_DELAY)
