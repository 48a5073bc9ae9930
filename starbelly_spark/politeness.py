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

Spark-first shape: politeness is a **log-structured** state table —
each micro-batch appends ONLY the hosts it fetched
``(host, delay, next_allowed_ts, batch_id)``; reads resolve
latest-wins per host with a map-side-combining ``max(struct)`` agg and
the crawl loop compacts the log to a base on its existing cadence
(exactly the ``seen_segments`` merge-on-read pattern).  At 10^8 hosts
a batch therefore writes O(hosts-fetched-this-batch) rows, never a
full O(#hosts) snapshot rewrite.  Time is a simulated deterministic
clock (double seconds) so crawl order is a pure function of state,
identical at any parallelism level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POLITENESS_SCHEMA = "host string, delay double, next_allowed_ts double"
POLITENESS_LOG_SCHEMA = POLITENESS_SCHEMA + ", batch_id long"
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


def maybe_broadcast(df: DataFrame, ok: bool) -> DataFrame:
    """Broadcast hint gated by a size check.  The politeness table is
    O(#hosts fetched): tiny for most crawls, but at 10^10 URLs #hosts
    can reach 10^8 — past any broadcast limit.  Callers count the
    table (parquet metadata count — no scan) and fall back to a
    shuffle hash join on ``host`` above the threshold."""
    return F.broadcast(df) if ok else df


def eligible_hosts(
    frontier_hosts: DataFrame,
    politeness: DataFrame,
    now: float,
    broadcast_ok: bool = True,
) -> DataFrame:
    """Hosts whose delay has expired (or that were never fetched).

    ``frontier_hosts``: distinct (host) of the pending frontier.
    """
    return (
        frontier_hosts.join(maybe_broadcast(politeness, broadcast_ok),
                            "host", "left")
        .where(
            F.col("next_allowed_ts").isNull()
            | (F.col("next_allowed_ts") <= F.lit(now))
        )
        .select("host")
    )


def politeness_updates(
    completions: DataFrame,
    rate_limits: DataFrame | None,
    crawl_delays: DataFrame | None,
    global_delay: float = DEFAULT_GLOBAL_DELAY,
    obey_crawl_delay: bool = True,
) -> DataFrame:
    """This batch's politeness rows — ONLY the hosts fetched this batch.

    Because merging is last-writer-wins (the new row fully replaces
    the old one), the update rows are independent of prior state: no
    read of the existing table, no O(#hosts) rewrite.  The crawl loop
    appends these to the politeness LOG with a ``batch_id`` column and
    ``latest_politeness`` resolves on read.

    ``completions``: (host, completion_ts) — one row per fetched URL;
    the max completion per host wins (delay measured from completion,
    the reference's 'reset' semantics,
    ``/root/reference/starbelly/rate_limiter.py:188-196``).
    ``rate_limits``: optional (host, delay) per-host overrides.
    ``crawl_delays``: optional (host, crawl_delay) from robots.
    """
    spark = completions.sparkSession
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
    return (
        per_host.join(F.broadcast(rl), "host", "left")
        .join(F.broadcast(cd), "host", "left")
        .select(
            "host",
            delay.alias("delay"),
            (F.col("completion_ts") + delay).alias("next_allowed_ts"),
        )
    )


def latest_politeness(log: DataFrame) -> DataFrame:
    """Resolve the politeness log to current state: latest batch wins
    per host.  ``max(struct(batch_id, ...))`` is a hash aggregate with
    MAP-SIDE partial aggregation (each task pre-collapses its hosts
    before the shuffle) — no window, no sort, exactly the
    ``seen.latest_segments`` shape."""
    return (
        log.groupBy("host")
        .agg(F.max(F.struct("batch_id", "delay", "next_allowed_ts"))
             .alias("_v"))
        .select(
            "host",
            F.col("_v.delay").alias("delay"),
            F.col("_v.next_allowed_ts").alias("next_allowed_ts"),
        )
    )


def update_politeness(
    politeness: DataFrame,
    completions: DataFrame,
    rate_limits: DataFrame | None,
    crawl_delays: DataFrame | None,
    global_delay: float = DEFAULT_GLOBAL_DELAY,
    obey_crawl_delay: bool = True,
) -> DataFrame:
    """Fold a batch's fetch completions into a RESOLVED politeness
    state (test/API convenience over ``politeness_updates``; the crawl
    loop itself appends the updates to the log instead).

    LAST-writer-wins per host: a host fetched this batch takes its
    whole row (delay + next_allowed_ts together) from the update —
    so a rate limit LOWERED mid-crawl (reference supports live
    rate_limit changefeeds, db.py:1117, per-domain-supersedes
    rate_limiter.py:287-291) takes effect next batch.  max()-merging
    would pin the stale higher delay forever and could mix delay and
    next_allowed_ts from different rows.
    """
    updates = politeness_updates(
        completions, rate_limits, crawl_delays, global_delay,
        obey_crawl_delay,
    )
    untouched = politeness.join(updates.select("host"), "host", "left_anti")
    return untouched.unionByName(updates)
