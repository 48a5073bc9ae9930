"""Politeness state semantics — delay from completion, per-host beats
global, robots crawl-delay honored when policy allows (expectations
from /root/reference/tests/test_rate_limiter.py:88-216 and
tests/test_robots.py:273-396 via SURVEY.md §5.2)."""

from starbelly_spark.politeness import (
    eligible_hosts,
    empty_politeness,
    update_politeness,
)


def _completions(spark, rows):
    return spark.createDataFrame(rows, "host string, completion_ts double")


def test_delay_measured_from_completion_and_global_default(spark):
    pol = empty_politeness(spark)
    pol = update_politeness(
        pol, _completions(spark, [("a.test", 10.0)]), None, None,
        global_delay=5.0,
    )
    row = pol.collect()[0]
    assert row.host == "a.test" and row.next_allowed_ts == 15.0


def test_per_host_delay_beats_global(spark):
    rl = spark.createDataFrame([("fast.test", 2.0)], "host string, delay double")
    pol = update_politeness(
        empty_politeness(spark),
        _completions(spark, [("fast.test", 10.0), ("slow.test", 10.0)]),
        rl, None, global_delay=10.0,
    )
    got = {r.host: r.next_allowed_ts for r in pol.collect()}
    assert got == {"fast.test": 12.0, "slow.test": 20.0}


def test_crawl_delay_used_when_policy_obeys(spark):
    cd = spark.createDataFrame([("cd.test", 3.0)], "host string, crawl_delay double")
    obey = update_politeness(
        empty_politeness(spark), _completions(spark, [("cd.test", 0.0)]),
        None, cd, global_delay=5.0, obey_crawl_delay=True,
    )
    ignore = update_politeness(
        empty_politeness(spark), _completions(spark, [("cd.test", 0.0)]),
        None, cd, global_delay=5.0, obey_crawl_delay=False,
    )
    assert obey.collect()[0].next_allowed_ts == 3.0
    assert ignore.collect()[0].next_allowed_ts == 5.0


def test_eligibility_gate(spark):
    pol = update_politeness(
        empty_politeness(spark),
        _completions(spark, [("a.test", 0.0), ("b.test", 10.0)]),
        None, None, global_delay=5.0,
    )
    hosts = spark.createDataFrame(
        [("a.test",), ("b.test",), ("new.test",)], "host string"
    )
    ok = sorted(r.host for r in eligible_hosts(hosts, pol, now=6.0).collect())
    # a.test allowed again at 5.0 ≤ 6.0; b.test blocked until 15.0;
    # never-seen hosts always eligible
    assert ok == ["a.test", "new.test"]


def test_latest_completion_wins(spark):
    pol = empty_politeness(spark)
    pol = update_politeness(pol, _completions(spark, [("a.test", 10.0)]),
                            None, None, global_delay=5.0)
    pol = update_politeness(pol, _completions(spark, [("a.test", 20.0)]),
                            None, None, global_delay=5.0)
    assert pol.collect()[0].next_allowed_ts == 25.0
