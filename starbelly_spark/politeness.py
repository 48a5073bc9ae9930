"""Per-host politeness (rate-limit) state (SURVEY.md T1/W5/J6).

Reference semantics (``/root/reference/starbelly/rate_limiter.py:79-318``,
pinned by ``tests/test_rate_limiter.py:88-216``):

* one request per host at a time; the delay is measured from download
  **completion** ("reset"), not from issue;
* a per-host delay overrides the global default (5.0 s fixture,
  ``tools/container_init.py:183-199``);
* robots crawl-delay feeds the limiter when the policy obeys it
  (``tests/test_robots.py:273-396``).

Precedence chosen here (documented deterministic choice):
``per-host rate limit > robots crawl-delay (if policy obeys) >
global default``.

Spark-first shape: politeness is a tiny state table
``(host, delay, next_allowed_ts)`` — O(#hosts), always broadcastable —
joined against the frontier's hosts each micro-batch.  Time is a
simulated deterministic clock (double seconds) so crawl order is a
pure function of state, identical at any parallelism level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POLITENESS_SCHEMA = "host string, delay double, next_allowed_ts double"
DEFAULT_GLOBAL_DELAY = 5.0


def empty_politeness(spark) -> DataFrame:
    return spark.createDataFrame([], POLITENESS_SCHEMA)


def effective_delay_col(global_delay: float, obey_crawl_delay: bool):
    """delay precedence as a column over (rate_delay, crawl_delay)."""
    parts = [F.col("rate_delay")]
    if obey_crawl_delay:
        parts.append(F.col("crawl_delay"))
    parts.append(F.lit(float(global_delay)))
    return F.coalesce(*parts)


def eligible_hosts(
    frontier_hosts: DataFrame, politeness: DataFrame, now: float
) -> DataFrame:
    """Hosts whose delay has expired (or that were never fetched).

    ``frontier_hosts``: distinct (host) of the pending frontier.
    """
    return (
        frontier_hosts.join(F.broadcast(politeness), "host", "left")
        .where(
            F.col("next_allowed_ts").isNull()
            | (F.col("next_allowed_ts") <= F.lit(now))
        )
        .select("host")
    )


def update_politeness(
    politeness: DataFrame,
    completions: DataFrame,
    rate_limits: DataFrame | None,
    crawl_delays: DataFrame | None,
    global_delay: float = DEFAULT_GLOBAL_DELAY,
    obey_crawl_delay: bool = True,
) -> DataFrame:
    """Fold a batch's fetch completions into the politeness state.

    ``completions``: (host, completion_ts) — one row per fetched URL;
    the max completion per host wins (delay measured from completion,
    the reference's 'reset' semantics).
    ``rate_limits``: optional (host, delay) per-host overrides.
    ``crawl_delays``: optional (host, crawl_delay) from robots.
    """
    spark = politeness.sparkSession
    per_host = completions.groupBy("host").agg(
        F.max("completion_ts").alias("completion_ts")
    )
    rl = (
        rate_limits.select("host", F.col("delay").alias("rate_delay"))
        if rate_limits is not None
        else spark.createDataFrame([], "host string, rate_delay double")
    )
    cd = (
        crawl_delays
        if crawl_delays is not None
        else spark.createDataFrame([], "host string, crawl_delay double")
    )
    delay = effective_delay_col(global_delay, obey_crawl_delay)
    updates = (
        per_host.join(F.broadcast(rl), "host", "left")
        .join(F.broadcast(cd), "host", "left")
        .select(
            "host",
            delay.alias("delay"),
            (F.col("completion_ts") + delay).alias("next_allowed_ts"),
        )
    )
    # newest state per host wins
    merged = politeness.unionByName(updates).groupBy("host").agg(
        F.max("delay").alias("delay"),
        F.max("next_allowed_ts").alias("next_allowed_ts"),
    )
    return merged
