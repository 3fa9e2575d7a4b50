"""S7 cron kernel goldens: field syntax, timezone evaluation (Jakarta→UTC),
DST handling, catch-up window — case shapes mirror the reference's
tests/unit/utils/test_cron.py without copying code."""

from datetime import UTC, datetime, timedelta

import pytest

from crawler_spark.kernels.cron import (
    CronError,
    CronSchedule,
    calculate_next_run,
    due_jobs,
    is_valid_cron,
)

T0 = datetime(2024, 1, 15, 10, 30, tzinfo=UTC)  # a Monday


class TestNextRun:
    def test_daily_midnight(self):
        assert calculate_next_run("0 0 * * *", T0) == datetime(2024, 1, 16, 0, 0, tzinfo=UTC)

    def test_every_15_minutes(self):
        assert calculate_next_run("*/15 * * * *", T0) == datetime(2024, 1, 15, 10, 45, tzinfo=UTC)

    def test_hourly_alias(self):
        assert calculate_next_run("@hourly", T0) == datetime(2024, 1, 15, 11, 0, tzinfo=UTC)

    def test_weekly_alias_sunday(self):
        nxt = calculate_next_run("@weekly", T0)
        assert nxt == datetime(2024, 1, 21, 0, 0, tzinfo=UTC)
        assert nxt.weekday() == 6  # Sunday

    def test_monthly_first(self):
        assert calculate_next_run("0 0 1 * *", T0) == datetime(2024, 2, 1, 0, 0, tzinfo=UTC)

    def test_weekday_names(self):
        nxt = calculate_next_run("0 9 * * fri", T0)
        assert nxt == datetime(2024, 1, 19, 9, 0, tzinfo=UTC)

    def test_strictly_after(self):
        exact = datetime(2024, 1, 15, 10, 0, tzinfo=UTC)
        assert calculate_next_run("0 10 * * *", exact) == exact + timedelta(days=1)

    def test_leap_day(self):
        assert calculate_next_run("0 0 29 2 *", T0) == datetime(2024, 2, 29, 0, 0, tzinfo=UTC)

    def test_dom_dow_or_rule(self):
        # day-of-month 13 OR friday (Vixie rule): from Mon 15 Jan the next
        # hit is Fri 19 Jan, not Feb 13
        assert calculate_next_run("0 0 13 * 5", T0) == datetime(2024, 1, 19, 0, 0, tzinfo=UTC)


class TestTimezone:
    def test_jakarta_2am_is_previous_day_utc(self):
        # 2 AM Asia/Jakarta (UTC+7) == 19:00 UTC the previous day
        nxt = calculate_next_run("0 2 * * *", T0, timezone="Asia/Jakarta")
        assert nxt == datetime(2024, 1, 15, 19, 0, tzinfo=UTC)

    def test_dst_spring_forward(self):
        # New York DST start 2024-03-10: 02:30 local does not exist; the next
        # 01:30 EDT after 01:30 EST is the following day
        base = datetime(2024, 3, 10, 1, 45, tzinfo=UTC)  # 20:45 EST Mar 9
        nxt = calculate_next_run("30 1 * * *", base, timezone="America/New_York")
        assert nxt == datetime(2024, 3, 10, 6, 30, tzinfo=UTC)  # 01:30 EST Mar 10

    def test_invalid_timezone_raises(self):
        with pytest.raises(CronError, match="timezone"):
            calculate_next_run("0 0 * * *", T0, timezone="Mars/Olympus")


class TestValidation:
    @pytest.mark.parametrize("expr", [
        "0 0 * * *", "*/5 * * * *", "0 9-17 * * 1-5", "0 0 1 jan *",
        "@daily", "15,45 2 * * sun", "0-30/10 * * * *",
        # 7 == Sunday forms (ADVICE r01: a blind '7'->'0' replace corrupted
        # these; croniter accepts them all)
        "0 0 * * 7", "0 0 * * 1-7", "0 0 * * 5-7", "0 0 * * */7",
    ])
    def test_valid(self, expr):
        assert is_valid_cron(expr)

    def test_dow_seven_is_sunday(self):
        from crawler_spark.kernels.cron import CronSchedule
        assert CronSchedule("0 0 * * 7").dows == {0}
        assert CronSchedule("0 0 * * 5-7").dows == {5, 6, 0}
        assert CronSchedule("0 0 * * 1-7").dows == {0, 1, 2, 3, 4, 5, 6}

    @pytest.mark.parametrize("expr", [
        "", "* * * *", "60 * * * *", "* 24 * * *", "* * 32 * *",
        "* * * 13 *", "a b c d e", "*/0 * * * *", "5-1 * * * *",
    ])
    def test_invalid(self, expr):
        assert not is_valid_cron(expr)


class TestDueJobs:
    def _job(self, nrt, **kw):
        return {"name": "j", "cron_expression": "0 * * * *",
                "next_run_time": nrt, "is_active": True, **kw}

    def test_due_within_window_fires(self):
        jobs = [self._job(T0 - timedelta(minutes=30))]
        out = due_jobs(jobs, T0)
        assert out[0]["fired"] is True
        assert out[0]["next_run_time"] > T0 - timedelta(minutes=30)

    def test_missed_beyond_window_skipped_forward(self):
        jobs = [self._job(T0 - timedelta(hours=5))]
        out = due_jobs(jobs, T0)
        assert out[0]["fired"] is False  # too stale: skip, don't backfill
        assert out[0]["next_run_time"] == datetime(2024, 1, 15, 11, 0, tzinfo=UTC)

    def test_future_job_untouched(self):
        assert due_jobs([self._job(T0 + timedelta(minutes=5))], T0) == []

    def test_inactive_job_ignored(self):
        assert due_jobs([self._job(T0 - timedelta(minutes=1), is_active=False)], T0) == []


def test_prepare_jobs_backfills_timezone_and_repairs_orphans():
    from datetime import UTC, datetime

    from crawler_spark.kernels.cron import calculate_next_run, prepare_jobs

    now = datetime(2026, 3, 2, 12, 30, tzinfo=UTC)
    jobs = [
        # legacy row: no timezone column value
        {"id": 1, "cron_expression": "0 9 * * *", "timezone": None,
         "next_run_time": datetime(2026, 3, 3, 9, 0, tzinfo=UTC)},
        # orphan: next_run_time wiped, valid cron -> rescheduled, not fired
        {"id": 2, "cron_expression": "*/15 * * * *", "timezone": "UTC",
         "next_run_time": None},
        # orphan with garbage cron -> deactivated, kept in output
        {"id": 3, "cron_expression": "not a cron", "timezone": "UTC",
         "next_run_time": None},
        # healthy row passes through untouched
        {"id": 4, "cron_expression": "0 0 * * 0", "timezone": "Asia/Jakarta",
         "next_run_time": datetime(2026, 3, 8, 0, 0, tzinfo=UTC)},
    ]
    out = {j["id"]: j for j in prepare_jobs(jobs, now)}
    assert len(out) == 4
    assert out[1]["timezone"] == "UTC" and out[1].get("timezone_backfilled")
    assert out[2]["next_run_time"] == calculate_next_run(
        "*/15 * * * *", now, "UTC"
    )
    assert out[2].get("orphan_repaired") and out[2].get("is_active", True)
    assert out[3]["is_active"] is False and out[3]["next_run_time"] is None
    assert out[4] == jobs[3]  # no spurious flags on healthy rows


def test_prepare_jobs_inactive_orphan_left_alone():
    from datetime import UTC, datetime

    from crawler_spark.kernels.cron import prepare_jobs

    now = datetime(2026, 1, 1, tzinfo=UTC)
    jobs = [{"id": 9, "cron_expression": "0 9 * * *", "timezone": "UTC",
             "next_run_time": None, "is_active": False}]
    (j,) = prepare_jobs(jobs, now)
    assert j["next_run_time"] is None and not j.get("orphan_repaired")
