"""Priority scoring kernel (operator S1 in SURVEY.md §2.4).

The crawl-ordering invariant, behavior-equivalent to
``/root/reference/crawler/services/priority_queue.py:89-155``:

    score = (10 - clamp(priority, 0, 10)) * 10**12 + epoch_millis(scheduled_at)

Lower score drains first: priority dominates (10 = manual/highest), earlier
schedule breaks ties. We keep the score in exact int64 (max ~1.2e13, far
inside the 2^63 range) instead of the reference's float — same ordering, and
hash-exact in the DuckDB oracle.
"""

from __future__ import annotations

from datetime import datetime, timezone

PRIORITY_MIN = 0
PRIORITY_MAX = 10
PRIORITY_MULTIPLIER = 10**12

PRIORITY_MANUAL = 10
PRIORITY_SCHEDULED = 5
PRIORITY_RETRY = 0


def clamp_priority(priority: int) -> int:
    return max(PRIORITY_MIN, min(PRIORITY_MAX, priority))


def priority_score(priority: int, scheduled_at: datetime) -> int:
    """Exact-integer queue score; lower = drained first."""
    if scheduled_at.tzinfo is None:
        scheduled_at = scheduled_at.replace(tzinfo=timezone.utc)
    ts_ms = int(scheduled_at.timestamp() * 1000)
    return (PRIORITY_MAX - clamp_priority(priority)) * PRIORITY_MULTIPLIER + ts_ms
