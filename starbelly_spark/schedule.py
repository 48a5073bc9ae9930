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
    job_name: str = "Job {COUNT}"        # {COUNT} {DATE} {TIME} vars


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


def format_job_name(template: str, when: datetime, job_count: int) -> str:
    """Job-name templating (reference ``schedule.py:190-203``):
    {COUNT} = how many jobs this schedule has started, {TIME} = unix
    seconds, {DATE} = ISO-ish timestamp of the event's due time."""
    return template.format(
        COUNT=job_count,
        TIME=int(when.timestamp()),
        DATE=when.strftime("%Y-%m-%dT%H:%M:%S"),
    )


class Scheduler:
    """Deterministic scheduler event loop (reference
    ``schedule.py:369-459``, de-trio'd: time is an argument, not a
    clock, so tests and the driver advance it explicitly).

    Semantics pinned by the reference:

    * a schedule first added with NO job history fires after a fixed
      initial delay (reference: 60 s, ``schedule.py:420-421``);
    * on a job-state change (``on_job_state``) the next event is
      recomputed from the event time — REGULAR_INTERVAL reschedules
      when a job STARTS, AFTER_PREVIOUS_JOB_FINISHED when it finishes
      (``schedule.py:379-413``);
    * when an event fires while the schedule's previous job is still
      running, the old job is CANCELLED first (``schedule.py:438-459``);
    * job names are formatted with {COUNT}/{DATE}/{TIME}, COUNT
      incremented before formatting (first job = 1).
    """

    FINISHED = ("completed", "cancelled")

    def __init__(self, start_job_fn, cancel_job_fn,
                 initial_delay_seconds: float = 60.0):
        self._start = start_job_fn       # (schedule, job_name, due) -> job_id
        self._cancel = cancel_job_fn     # (job_id) -> None
        self._initial_delay = initial_delay_seconds
        self._events: list[tuple[datetime, int, str]] = []
        self._seq = 0
        self._schedules: dict[str, Schedule] = {}
        self._running: dict[str, str] = {}      # schedule_id → job_id
        self._job_counts: dict[str, int] = {}

    def _push(self, due: datetime, schedule_id: str) -> None:
        import heapq

        self._seq += 1
        heapq.heappush(self._events, (due, self._seq, schedule_id))

    def add_schedule(self, schedule: Schedule, now: datetime,
                     latest_job: dict | None = None) -> None:
        """latest_job: {job_id, run_state, started_at, completed_at}
        of the schedule's most recent job (J2 lookup), or None."""
        sid = schedule.schedule_id
        if sid in self._schedules:
            raise ValueError(f"schedule {sid} already added")
        self._schedules[sid] = schedule
        due = None
        if latest_job:
            finished = latest_job["run_state"] in self.FINISHED
            if schedule.timing == REGULAR_INTERVAL:
                due = add_interval(latest_job["started_at"],
                                   schedule.num_units, schedule.time_unit)
            elif finished:
                due = add_interval(latest_job["completed_at"],
                                   schedule.num_units, schedule.time_unit)
            if not finished and latest_job.get("job_id"):
                self._running[sid] = latest_job["job_id"]
        else:
            due = now + timedelta(seconds=self._initial_delay)
        if due is not None:
            self._push(due, sid)

    def remove_schedule(self, schedule_id: str) -> None:
        self._schedules.pop(schedule_id, None)
        self._running.pop(schedule_id, None)

    def on_job_state(self, schedule_id: str, job_id: str, run_state: str,
                     event_time: datetime) -> None:
        """Recompute the next event on a job state change."""
        sched = self._schedules.get(schedule_id)
        if sched is None:
            return
        finished = run_state in self.FINISHED
        if ((not finished and sched.timing == REGULAR_INTERVAL)
                or (finished and sched.timing == AFTER_PREVIOUS_JOB_FINISHED)):
            self._push(
                add_interval(event_time, sched.num_units, sched.time_unit),
                schedule_id,
            )
        if finished:
            if self._running.get(schedule_id) == job_id:
                self._running.pop(schedule_id, None)
        else:
            self._running[schedule_id] = job_id

    def next_due(self) -> datetime | None:
        return self._events[0][0] if self._events else None

    def tick(self, now: datetime) -> list[str]:
        """Fire every due event: cancel a still-running previous job of
        the same schedule, then start the new one.  Returns started
        job ids.  (The NEXT event is not pushed here — it arrives via
        on_job_state when the started job reports its state, exactly
        like the reference's listen task.)"""
        import heapq

        started = []
        while self._events and self._events[0][0] <= now:
            due, _, sid = heapq.heappop(self._events)
            sched = self._schedules.get(sid)
            if sched is None or not sched.enabled:
                continue
            old = self._running.get(sid)
            if old is not None:
                self._cancel(old)
                self._running.pop(sid, None)
            count = self._job_counts.get(sid, 0) + 1
            self._job_counts[sid] = count
            name = format_job_name(sched.job_name, due, count)
            job_id = self._start(sched, name, due)
            self._running[sid] = job_id
            started.append(job_id)
        return started
