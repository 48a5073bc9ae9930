"""robots.txt exclusion as a broadcast-joined rule table (SURVEY.md P8/S10).

The reference fetches and caches robots.txt per host at crawl time
(``/root/reference/starbelly/robots.py:116-176``) and asks
"is this URL allowed for this user-agent?" per link, honoring the
policy's OBEY / INVERT / IGNORE usage
(``starbelly/policy.py:571-584``, pinned by
``tests/test_robots.py:68-137``): IGNORE never consults robots,
INVERT flips the decision.  Crawl-delay feeds the rate limiter when
the policy allows (``tests/test_robots.py:273-396``).

Spark-first shape: robots files are parsed ONCE into a small rules
table ``(host, user_agent, path_prefix, allow, crawl_delay)`` which is
**broadcast-joined** against candidate links; the per-URL decision is
the standard longest-matching-prefix rule, computed as a window rank
over prefix length.  Missing robots → fully permissive
(``starbelly/robots.py:234-249``).

At 10^10 scale the rules table is O(#hosts × few rules) — far below
the links table — so the broadcast join is the right plan; the links
side never shuffles for this decision.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .policy import IGNORE, INVERT, OBEY, Policy

ROBOTS_SCHEMA = (
    "host string, user_agent string, path_prefix string, allow boolean, "
    "crawl_delay double"
)


def synthetic_robots_rules(spark, n_hosts: int, seed: int = 42) -> DataFrame:
    """Deterministic robots rules for the synthetic web: every third
    host disallows ``/p1`` paths for ``*``; every fifth sets a
    crawl-delay.  (Shape of real parsed robots.txt files.)"""
    rows = []
    for i in range(n_hosts):
        hv = zlib.crc32(f"robots|{i}|{seed}".encode())
        host = f"h{i}.example"
        if i % 3 == 2:
            rows.append((host, "*", "/p1", False, None))
        if i % 5 == 4:
            rows.append((host, "*", "/", True, float(1 + hv % 3)))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def apply_robots(
    links: DataFrame,
    robots_rules: DataFrame,
    policy: Policy,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Filter candidate links by robots rules under the policy's usage.

    ``links`` keeps its schema; rows not allowed are dropped.
    """
    if policy.robots.usage == IGNORE:
        return links

    path = F.coalesce(
        F.regexp_extract(F.col(url_col), r"^https?://[^/]+(/.*)$", 1),
        F.lit("/"),
    )
    candidates = links.withColumn("_path", path)

    rules = robots_rules.where(
        (F.col("user_agent") == "*")
        | (F.col("user_agent") == F.lit(policy.user_agent))
    ).select(
        F.col("host").alias("_rhost"),
        F.col("user_agent").alias("_rua"),
        "path_prefix",
        F.col("allow").alias("_rallow"),
    )

    joined = candidates.join(
        F.broadcast(rules),
        (candidates[host_col] == rules["_rhost"])
        & F.col("_path").startswith(F.col("path_prefix")),
        "left",
    )
    # Most-specific rule wins: specific-UA group beats '*', then
    # longest path prefix, allow beats disallow on exact ties (the
    # Google/RFC 9309 tie-break).
    w = Window.partitionBy(url_col).orderBy(
        F.when(F.col("_rua") == policy.user_agent, 0).otherwise(1),
        F.length(F.col("path_prefix")).desc(),
        F.col("_rallow").desc(),
    )
    decided = (
        joined.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .withColumn("_allowed", F.coalesce(F.col("_rallow"), F.lit(True)))
    )
    if policy.robots.usage == INVERT:
        # INVERT flips decisions for hosts that HAVE rules; hosts with
        # no robots stay permissive (reference flips the checker's
        # answer, and a missing robots answers 'allowed').
        keep = F.when(
            F.col("path_prefix").isNotNull(), ~F.col("_allowed")
        ).otherwise(F.lit(True))
    else:
        assert policy.robots.usage == OBEY
        keep = F.col("_allowed")
    return decided.where(keep).drop(
        "_path", "_rhost", "_rua", "path_prefix", "_rallow", "_rk", "_allowed"
    )


def crawl_delays(robots_rules: DataFrame) -> DataFrame:
    """(host, crawl_delay) pairs for the politeness table — max delay
    per host across rule groups."""
    return (
        robots_rules.where(F.col("crawl_delay").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )
