"""Schedule timing math incl. month/year clamping — expectations from
the reference's tests (/root/reference/tests/test_schedule.py:273-300
via SURVEY.md §5.2)."""

from datetime import datetime

from starbelly_spark.schedule import (
    AFTER_PREVIOUS_JOB_FINISHED,
    REGULAR_INTERVAL,
    Schedule,
    add_interval,
    due_schedules,
    next_event,
)


def test_month_end_clamping():
    assert add_interval(datetime(2024, 1, 31), 1, "MONTHS") == datetime(2024, 2, 29)
    assert add_interval(datetime(2023, 1, 31), 1, "MONTHS") == datetime(2023, 2, 28)
    assert add_interval(datetime(2023, 3, 31), 1, "MONTHS") == datetime(2023, 4, 30)
    assert add_interval(datetime(2023, 12, 15), 1, "MONTHS") == datetime(2024, 1, 15)


def test_leap_year_clamping():
    assert add_interval(datetime(2024, 2, 29), 1, "YEARS") == datetime(2025, 2, 28)
    assert add_interval(datetime(2024, 2, 29), 4, "YEARS") == datetime(2028, 2, 29)


def test_simple_units():
    base = datetime(2024, 1, 1, 12, 0)
    assert add_interval(base, 90, "MINUTES") == datetime(2024, 1, 1, 13, 30)
    assert add_interval(base, 2, "WEEKS") == datetime(2024, 1, 15, 12, 0)


def test_timing_bases():
    s_reg = Schedule("s1", 1, "DAYS", REGULAR_INTERVAL)
    s_after = Schedule("s2", 1, "DAYS", AFTER_PREVIOUS_JOB_FINISHED)
    started = datetime(2024, 1, 1, 0, 0)
    completed = datetime(2024, 1, 1, 6, 0)
    now = datetime(2024, 1, 1, 12, 0)
    assert next_event(s_reg, started, completed, now) == datetime(2024, 1, 2, 0, 0)
    assert next_event(s_after, started, completed, now) == datetime(2024, 1, 2, 6, 0)


def test_never_run_fires_now_and_disabled_never():
    now = datetime(2024, 1, 1)
    s = Schedule("s", 1, "DAYS", REGULAR_INTERVAL)
    assert next_event(s, None, None, now) == now
    off = Schedule("s", 1, "DAYS", REGULAR_INTERVAL, enabled=False)
    assert next_event(off, None, None, now) is None


def test_due_schedules():
    now = datetime(2024, 1, 10)
    schedules = [
        Schedule("due", 1, "DAYS", REGULAR_INTERVAL),
        Schedule("not-due", 30, "DAYS", REGULAR_INTERVAL),
        Schedule("new", 1, "DAYS", REGULAR_INTERVAL),
    ]
    history = {
        "due": (datetime(2024, 1, 8), datetime(2024, 1, 8, 1)),
        "not-due": (datetime(2024, 1, 5), datetime(2024, 1, 5, 1)),
    }
    assert due_schedules(schedules, history, now) == ["due", "new"]
