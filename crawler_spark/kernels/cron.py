"""Cron scheduling kernel (S7 — SURVEY.md §2.4).

Behavior-equivalent to the reference's cron utilities
(`crawler/utils/cron.py:9-101`, `scheduled_job_processor.py:36-134`) without
croniter (not in this container): a from-scratch 5-field cron evaluator with
the extended aliases, IANA-timezone evaluation with UTC storage, and the
reference's 1-hour catch-up window for missed runs.

Supported field syntax: ``*``, lists ``1,5``, ranges ``1-5``, steps ``*/15``
and ``10-50/10``, names for months/weekdays (jan-dec, sun-sat), and the
``@yearly/@monthly/@weekly/@daily/@hourly`` aliases. Day-of-month and
day-of-week combine with OR when both are restricted (Vixie cron rule).

Driver-side only — the scheduler loop emits rows into the jobs/frontier
table; nothing here runs on executors.
"""

from __future__ import annotations

from datetime import UTC, datetime, timedelta
from zoneinfo import ZoneInfo

ALIASES = {
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
    "@monthly": "0 0 1 * *",
    "@weekly": "0 0 * * 0",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@hourly": "0 * * * *",
}

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"])}
_DOWS = {d: i for i, d in enumerate(["sun", "mon", "tue", "wed", "thu", "fri", "sat"])}

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]


class CronError(ValueError):
    pass


def _parse_field(spec: str, lo: int, hi: int, names: dict[str, int] | None) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        if not part:
            raise CronError(f"empty field part in {spec!r}")
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            try:
                step = int(step_s)
            except ValueError:
                raise CronError(f"bad step in {spec!r}")
            if step < 1:
                raise CronError(f"step must be >= 1 in {spec!r}")

        def _val(tok: str) -> int:
            t = tok.strip().lower()
            if names and t in names:
                return names[t]
            try:
                return int(t)
            except ValueError:
                raise CronError(f"bad value {tok!r} in {spec!r}")

        if part in ("*", ""):
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            va, vb = _val(a), _val(b)
            if not (lo <= va <= hi and lo <= vb <= hi and va <= vb):
                raise CronError(f"range out of bounds in {spec!r}")
            rng = range(va, vb + 1)
        else:
            v = _val(part)
            if not lo <= v <= hi:
                raise CronError(f"value {v} out of [{lo},{hi}] in {spec!r}")
            rng = range(v, v + 1)
        out.update(x for x in rng if (x - rng.start) % step == 0)
    return out


class CronSchedule:
    def __init__(self, expression: str):
        expr = ALIASES.get(expression.strip().lower(), expression.strip())
        fields = expr.split()
        if len(fields) != 5:
            raise CronError(f"cron needs 5 fields, got {len(fields)}: {expression!r}")
        self.minutes = _parse_field(fields[0], 0, 59, None)
        self.hours = _parse_field(fields[1], 0, 23, None)
        self.doms = _parse_field(fields[2], 1, 31, None)
        self.months = _parse_field(fields[3], 1, 12, _MONTHS)
        # 7 == 0 == Sunday (accept both): parse over 0-7 and fold 7 onto 0
        # per resolved value, so '1-7', '5-7', '*/7' all stay valid (a blind
        # string replace would corrupt them).
        self.dows = {x % 7 for x in _parse_field(fields[4], 0, 7, _DOWS)}
        self._dom_any = fields[2] == "*"
        self._dow_any = fields[4] in ("*", "0-7", "0-6", "1-7")

    def _day_matches(self, dt: datetime) -> bool:
        dom_ok = dt.day in self.doms
        dow_ok = ((dt.weekday() + 1) % 7) in self.dows  # python Mon=0 -> cron Sun=0
        if self._dom_any and self._dow_any:
            return True
        if self._dom_any:
            return dow_ok
        if self._dow_any:
            return dom_ok
        return dom_ok or dow_ok  # Vixie OR rule

    def next_after(self, dt: datetime) -> datetime:
        """Smallest schedule time strictly after dt (same tz as dt).

        Field-jumping scan: a non-matching month jumps to the next month
        start, a non-matching day to the next midnight, a non-matching hour
        to the next hour — so sparse schedules (monthly/weekly) resolve in
        tens of steps instead of a minute-by-minute walk. Wall-clock
        semantics are identical to the naive +1-minute scan (jumps only
        skip spans where some coarser field already fails to match).
        """
        cur = dt.replace(second=0, microsecond=0) + timedelta(minutes=1)
        horizon = dt + timedelta(days=4 * 366)  # leap-proof 4-year bound
        while cur <= horizon:
            if cur.month not in self.months:
                if cur.month == 12:
                    cur = cur.replace(
                        year=cur.year + 1, month=1, day=1, hour=0, minute=0
                    )
                else:
                    cur = cur.replace(month=cur.month + 1, day=1, hour=0, minute=0)
            elif not self._day_matches(cur):
                cur = cur.replace(hour=0, minute=0) + timedelta(days=1)
            elif cur.hour not in self.hours:
                cur = cur.replace(minute=0) + timedelta(hours=1)
            elif cur.minute not in self.minutes:
                cur += timedelta(minutes=1)
            else:
                return cur
        raise CronError("no matching time within 4 years")


def is_valid_cron(expression: str) -> bool:
    try:
        CronSchedule(expression)
        return True
    except CronError:
        return False


def calculate_next_run(
    cron_expression: str,
    base_time: datetime | None = None,
    timezone: str = "UTC",
) -> datetime:
    """Next run strictly after base_time: evaluated in the job's IANA
    timezone, returned in UTC (cron.py:9-73 semantics)."""
    if base_time is None:
        base_time = datetime.now(UTC)
    elif base_time.tzinfo is None:
        base_time = base_time.replace(tzinfo=UTC)
    try:
        tz = ZoneInfo(timezone)
    except Exception as e:
        raise CronError(f"invalid timezone {timezone!r}: {e}") from e
    local = base_time.astimezone(tz)
    nxt = CronSchedule(cron_expression).next_after(local)
    if nxt.tzinfo is None:
        nxt = nxt.replace(tzinfo=tz)
    return nxt.astimezone(UTC)


def due_jobs(
    jobs: list[dict],
    now: datetime,
    catchup_window: timedelta = timedelta(hours=1),
) -> list[dict]:
    """scheduled_job_processor.py:36-134 semantics: a job fires when
    next_run_time <= now; runs missed by MORE than the catch-up window are
    skipped forward (next_run recomputed from now, no burst of backfills)."""
    fired = []
    for job in jobs:
        if not job.get("is_active", True):
            continue
        nrt = job["next_run_time"]
        if nrt.tzinfo is None:
            nrt = nrt.replace(tzinfo=UTC)
        if nrt <= now:
            fire = now - nrt <= catchup_window
            base = now if not fire else nrt
            nxt = calculate_next_run(
                job["cron_expression"], base, job.get("timezone", "UTC")
            )
            fired.append({**job, "fired": fire, "next_run_time": nxt})
    return fired


def prepare_jobs(jobs: list[dict], now: datetime) -> list[dict]:
    """Orphan repair + timezone backfill before scheduling
    (scheduled_job_processor._prepare_scheduled_job, lines 43-134):

    - missing/empty timezone -> backfilled to 'UTC' (legacy rows predating
      the timezone column), flagged `timezone_backfilled=True`;
    - next_run_time is None (orphan: manual edit / failed migration) ->
      recompute from `now` in the job's timezone WITHOUT a catch-up firing
      (last_run_time untouched), flagged `orphan_repaired=True`;
    - orphan whose cron/timezone is invalid -> deactivated
      (`is_active=False`), kept in the output so callers can persist the
      deactivation.

    Pure driver-side metadata repair over the scheduled-jobs table — the
    per-row work is O(#jobs), never data-scale.
    """
    out = []
    for job in jobs:
        j = dict(job)
        if not j.get("timezone"):
            j["timezone"] = "UTC"
            j["timezone_backfilled"] = True
        if j.get("next_run_time") is None and j.get("is_active", True):
            try:
                j["next_run_time"] = calculate_next_run(
                    j["cron_expression"], now, j["timezone"]
                )
                j["orphan_repaired"] = True
            except CronError:
                j["is_active"] = False
        out.append(j)
    return out
