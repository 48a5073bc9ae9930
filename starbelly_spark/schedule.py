"""Job scheduling semantics (SURVEY.md F15, §3.3).

The reference's scheduler repeats jobs on an interval with two timing
bases (``/root/reference/starbelly/schedule.py:295-334,379-413``):

* REGULAR_INTERVAL — next event = previous job's *started_at* + interval
* AFTER_PREVIOUS_JOB_FINISHED — next event = *completed_at* + interval

with calendar arithmetic that clamps month/year lengths
(``schedule.py:28-54``, pinned by ``tests/test_schedule.py:273-300``):
adding months clamps the day-of-month to the target month's length
(Jan 31 + 1 month → Feb 28/29), adding years clamps Feb 29 → Feb 28.

Pure-Python kernels (driver-side control plane — scheduling is not
dataflow) + Spark column expressions for the set-oriented form
("next run time for every schedule" over a schedules table).
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F

REGULAR_INTERVAL = "REGULAR_INTERVAL"
AFTER_PREVIOUS_JOB_FINISHED = "AFTER_PREVIOUS_JOB_FINISHED"

UNITS = ("MINUTES", "HOURS", "DAYS", "WEEKS", "MONTHS", "YEARS")


def add_interval(base: datetime, num_units: int, unit: str) -> datetime:
    """Calendar-aware interval addition with month/year clamping."""
    if unit == "MINUTES":
        return base + timedelta(minutes=num_units)
    if unit == "HOURS":
        return base + timedelta(hours=num_units)
    if unit == "DAYS":
        return base + timedelta(days=num_units)
    if unit == "WEEKS":
        return base + timedelta(weeks=num_units)
    if unit == "MONTHS":
        month_index = base.month - 1 + num_units
        year = base.year + month_index // 12
        month = month_index % 12 + 1
        day = min(base.day, calendar.monthrange(year, month)[1])
        return base.replace(year=year, month=month, day=day)
    if unit == "YEARS":
        year = base.year + num_units
        day = min(base.day, calendar.monthrange(year, base.month)[1])
        return base.replace(year=year, day=day)
    raise ValueError(f"unknown unit {unit!r}")


@dataclass(frozen=True)
class Schedule:
    schedule_id: str
    num_units: int
    time_unit: str                       # MINUTES … YEARS
    timing: str                          # REGULAR_INTERVAL | AFTER_…
    enabled: bool = True


def next_event(
    schedule: Schedule,
    latest_started_at: datetime | None,
    latest_completed_at: datetime | None,
    now: datetime,
) -> datetime | None:
    """When should this schedule fire next?  None when disabled.
    A schedule with no previous job fires immediately (now)."""
    if not schedule.enabled:
        return None
    base = (
        latest_started_at
        if schedule.timing == REGULAR_INTERVAL
        else latest_completed_at
    )
    if base is None:
        return now
    return add_interval(base, schedule.num_units, schedule.time_unit)


def due_schedules(schedules, job_history, now: datetime) -> list[str]:
    """Driver-side event loop step: schedule_ids due at ``now``.

    job_history: schedule_id → (latest_started_at, latest_completed_at);
    the latest-job lookup is the J2 window pattern over the jobs table.
    """
    due = []
    for s in schedules:
        hist = job_history.get(s.schedule_id, (None, None))
        ev = next_event(s, hist[0], hist[1], now)
        if ev is not None and ev <= now:
            due.append(s.schedule_id)
    return due


def next_month_clamped_expr(ts_col: Column, months: int = 1) -> Column:
    """Set-oriented month arithmetic (Spark's add_months already
    clamps month-ends — matches add_interval MONTHS semantics)."""
    return F.add_months(ts_col, months)
