"""Scheduler event-loop semantics (reference schedule.py:369-459 via
tests/test_schedule.py): initial 60s delay, recompute-on-state-change
per timing mode, cancel-previous on overlap, month-end clamping
through the loop, job-name templating."""

from datetime import datetime, timedelta

from starbelly_spark.schedule import (
    AFTER_PREVIOUS_JOB_FINISHED,
    REGULAR_INTERVAL,
    Schedule,
    Scheduler,
    format_job_name,
)

T0 = datetime(2026, 1, 31, 12, 0, 0)


class Harness:
    def __init__(self, **sched_kw):
        self.started: list[tuple[str, str]] = []   # (job_id, name)
        self.cancelled: list[str] = []
        self._n = 0
        self.sched = Scheduler(self._start, self._cancel)
        self.s = Schedule("s1", 1, "HOURS", REGULAR_INTERVAL, **sched_kw)

    def _start(self, schedule, name, due):
        self._n += 1
        jid = f"job{self._n}"
        self.started.append((jid, name))
        return jid

    def _cancel(self, job_id):
        self.cancelled.append(job_id)


def test_new_schedule_fires_after_initial_delay():
    h = Harness()
    h.sched.add_schedule(h.s, now=T0)
    assert h.sched.tick(T0) == []                       # not yet due
    assert h.sched.tick(T0 + timedelta(seconds=60)) == ["job1"]


def test_regular_interval_reschedules_on_start_and_cancels_overlap():
    h = Harness()
    h.sched.add_schedule(h.s, now=T0)
    [j1] = h.sched.tick(T0 + timedelta(seconds=60))
    start_t = T0 + timedelta(seconds=60)
    h.sched.on_job_state("s1", j1, "running", start_t)
    # next event = started_at + 1 hour
    assert h.sched.next_due() == start_t + timedelta(hours=1)
    # job still running when the event fires → cancel-previous
    [j2] = h.sched.tick(start_t + timedelta(hours=1))
    assert h.cancelled == [j1]
    assert j2 == "job2"


def test_after_previous_reschedules_only_on_finish():
    h = Harness()
    h.s = Schedule("s1", 1, "HOURS", AFTER_PREVIOUS_JOB_FINISHED)
    h.sched.add_schedule(h.s, now=T0)
    [j1] = h.sched.tick(T0 + timedelta(seconds=60))
    h.sched.on_job_state("s1", j1, "running", T0 + timedelta(seconds=60))
    assert h.sched.next_due() is None                   # nothing pending
    fin = T0 + timedelta(minutes=30)
    h.sched.on_job_state("s1", j1, "completed", fin)
    assert h.sched.next_due() == fin + timedelta(hours=1)
    [j2] = h.sched.tick(fin + timedelta(hours=1))
    assert h.cancelled == []                            # j1 already finished


def test_bootstrap_from_latest_job_history():
    h = Harness()
    latest = {"job_id": "old", "run_state": "completed",
              "started_at": T0, "completed_at": T0 + timedelta(minutes=5)}
    h.sched.add_schedule(h.s, now=T0 + timedelta(hours=2), latest_job=latest)
    # REGULAR_INTERVAL: due = started_at + 1h (already past) → fires now
    assert h.sched.tick(T0 + timedelta(hours=2)) == ["job1"]


def test_month_end_clamping_through_loop():
    h = Harness()
    h.s = Schedule("s1", 1, "MONTHS", REGULAR_INTERVAL)
    h.sched.add_schedule(h.s, now=T0)
    [j1] = h.sched.tick(T0 + timedelta(seconds=60))
    h.sched.on_job_state("s1", j1, "running", T0)       # Jan 31
    assert h.sched.next_due() == datetime(2026, 2, 28, 12, 0, 0)


def test_job_name_formatting():
    h = Harness(job_name="Crawl {COUNT} at {DATE}")
    h.sched.add_schedule(h.s, now=T0)
    h.sched.tick(T0 + timedelta(seconds=60))
    _, name = h.started[0]
    assert name == "Crawl 1 at 2026-01-31T12:01:00"
    assert format_job_name("n{COUNT}", T0, 7) == "n7"


def test_disabled_schedule_never_fires():
    h = Harness()
    h.s = Schedule("s1", 1, "HOURS", REGULAR_INTERVAL, enabled=False)
    h.sched.add_schedule(h.s, now=T0)
    assert h.sched.tick(T0 + timedelta(days=1)) == []
