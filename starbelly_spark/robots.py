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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .policy import IGNORE, INVERT, OBEY, Policy

ROBOTS_SCHEMA = (
    "host string, user_agent string, path_prefix string, allow boolean, "
    "crawl_delay double"
)


# ---------------------------------------------------------------------------
# robots.txt TEXT parser: bytes → rule rows (SURVEY.md S10).
#
# The reference delegates to RobotExclusionRulesParser
# (``/root/reference/starbelly/robots.py:234-249``); behaviors pinned by
# ``/root/reference/tests/test_robots.py:68-137,273-396``:
#  * per-user-agent groups; a specific-UA group REPLACES '*' (TestAgent1
#    with its own group is allowed on '*'-disallowed /foo/);
#  * Crawl-delay belongs to its group;
#  * missing / unparseable file → fully permissive;
#  * the parser ignores anything it doesn't understand, never raises.
# ---------------------------------------------------------------------------

def parse_robots_txt(host: str, content: bytes | str | None) -> list[tuple]:
    """Parse one robots.txt into rule rows
    ``(host, user_agent, path_prefix, allow, crawl_delay)``.

    Empty/None/undecodable input yields no rows (= permissive).
    Groups are runs of ``User-agent:`` lines followed by rules; rules
    before any User-agent line are ignored.  An empty ``Disallow:``
    value means "allow all" and yields no row.  The group's crawl
    delay is stamped onto every row of the group (and onto a no-op
    ``Allow: /`` row if the group has no path rules) so the delay
    survives into the rule table.
    """
    if content is None:
        return []
    if isinstance(content, bytes):
        try:
            text = content.decode("utf-8")
        except UnicodeDecodeError:
            text = content.decode("latin-1")
    else:
        text = content

    # pass 1: group structure
    groups: list[dict] = []
    cur: dict | None = None
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_ua:
                cur = {"agents": [], "rules": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(value.lower() or "*")
            last_was_ua = True
            continue
        last_was_ua = False
        if cur is None:
            continue  # rules before any user-agent line: ignored
        if field == "disallow":
            if value:
                cur["rules"].append((value, False))
        elif field == "allow":
            if value:
                cur["rules"].append((value, True))
        elif field == "crawl-delay":
            try:
                cur["delay"] = float(value)
            except ValueError:
                pass  # unparseable → ignored, like the reference parser

    rows: list[tuple] = []
    for g in groups:
        for agent in g["agents"]:
            rules = g["rules"] or ([("/", True)] if g["delay"] is not None
                                   else [])
            for path, allow in rules:
                rows.append((host, agent, path, allow, g["delay"]))
    return rows


def robots_sitemaps(content: bytes | str | None) -> list[str]:
    """``Sitemap:`` URLs from one robots.txt — the analogue of the
    reference's ``RobotsTxt.get_sitemaps``
    (``/root/reference/starbelly/robots.py:280-284``).  Sitemap lines
    are GLOBAL per RFC 9309 §2.3 / sitemaps.org (not part of any
    user-agent group), so they parse independently of group
    structure; order preserved, duplicates dropped."""
    if content is None:
        return []
    if isinstance(content, bytes):
        try:
            text = content.decode("utf-8")
        except UnicodeDecodeError:
            text = content.decode("latin-1")
    else:
        text = content
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            url = value.strip()
            if url and url not in out:
                out.append(url)
    return out


def synthetic_robots_txt(host_index: int, seed: int = 42) -> str:
    """The robots.txt TEXT a synthetic host serves — the same rules
    ``synthetic_robots_rules`` tabulates, plus a ``Sitemap:`` line for
    hosts that have a sitemap page (synthetic_web.page_kind: hosts
    ``i % 4 == 1`` serve a sitemap at /p1).  Lets the read_sitemaps
    flow exercise the real text-parsing path end-to-end."""
    i = host_index
    hv = zlib.crc32(f"robots|{i}|{seed}".encode())
    lines = ["User-agent: *"]
    if i % 3 == 2:
        lines.append("Disallow: /p1")
    if i % 5 == 4:
        lines.append(f"Crawl-delay: {1 + hv % 3}")
    if i % 4 == 1:
        lines.append(f"Sitemap: http://h{i}.example/p1")
    return "\n".join(lines) + "\n"


def robots_rules_from_files(spark, files: DataFrame) -> DataFrame:
    """Distributed parse: (host, robots binary|string) → rules table.

    At 10^8 hosts the parse is executor-side (mapInPandas over the
    robots_txt store), one rule table refresh per batch — never a
    driver loop."""
    def _parse(it):
        for pdf in it:
            out = []
            for host, content in zip(pdf["host"], pdf["robots_txt"]):
                out.extend(parse_robots_txt(host, content))
            yield pd.DataFrame(
                out,
                columns=["host", "user_agent", "path_prefix", "allow",
                         "crawl_delay"],
            )

    return files.mapInPandas(_parse, schema=ROBOTS_SCHEMA)


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
    row_key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Filter candidate links by robots rules under the policy's usage.

    ``links`` keeps its schema; rows not allowed are dropped.  Every
    input row gets its OWN decision (the decision is a projection, not
    a window), so duplicate URLs from different parents survive intact
    for the downstream first-parent dedup.  ``row_key_cols`` is
    accepted for API stability but unused — per-row decisions make a
    row key unnecessary.
    """
    if policy.robots.usage == IGNORE:
        return links

    # regexp_extract returns '' (not NULL) on non-match, so a pathless
    # URL (http://h.example) must fall back to '/' explicitly —
    # matching the simulator and RFC 9309's empty-path handling
    extracted = F.regexp_extract(F.col(url_col), r"^https?://[^/]+(/.*)$", 1)
    path = F.when(extracted == "", F.lit("/")).otherwise(extracted)
    candidates = links.withColumn("_path", path)

    # GROUP SELECTION first (reference semantics, test_robots.py:68-92:
    # a host with a specific-UA group uses THAT group ONLY — it
    # replaces '*', it does not merge with it)
    # robots checks always use the FIRST agent (robots.py:88)
    agent = policy.agents()[0].lower()
    rel = robots_rules.where(
        (F.col("user_agent") == "*")
        | (F.lower(F.col("user_agent")) == F.lit(agent))
    )
    spec = rel.where(F.lower(F.col("user_agent")) == F.lit(agent))
    spec_hosts = spec.select("host").distinct()
    star = rel.where(F.col("user_agent") == "*").join(
        spec_hosts, "host", "left_anti"
    )
    # One ORDERED rule array per host (longest prefix first, allow
    # before disallow on ties — Google/RFC 9309), broadcast-joined.
    # The per-URL decision is then a pure projection: first matching
    # array element.  No window, no join fan-out — the links side
    # keeps exactly one row per candidate and NEVER shuffles for the
    # robots decision (the previous window-over-matches plan sorted
    # millions of (link × rule) rows per batch).
    per_host = (
        spec.unionByName(star)
        .groupBy(F.col("host").alias("_rhost"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.length("path_prefix")).alias("neg_len"),
                        (~F.col("allow")).alias("not_allow"),
                        F.col("path_prefix").alias("prefix"),
                        F.col("allow").alias("allow"),
                    )
                )
            ).alias("_rules")
        )
    )
    joined = candidates.join(
        F.broadcast(per_host),
        candidates[host_col] == F.col("_rhost"),
        "left",
    )
    first = F.get(
        F.filter(
            F.col("_rules"),
            lambda r: F.col("_path").startswith(r["prefix"]),
        ),
        0,
    )
    decided = joined.withColumn(
        "_allowed", F.coalesce(first["allow"], F.lit(True))
    )
    if policy.robots.usage == INVERT:
        # INVERT is the unconditional negation of the robots decision
        # (reference robots.py:90-92 `return not robots_decision`,
        # pinned by test_fetch_robots_invert: even a URL with NO
        # matching rule — where the decision defaults to allowed — is
        # dropped under INVERT).
        keep = ~F.col("_allowed")
    else:
        assert policy.robots.usage == OBEY
        keep = F.col("_allowed")
    return decided.where(keep).drop("_path", "_rhost", "_rules", "_allowed")


def crawl_delays(
    robots_rules: DataFrame, user_agent: str | None = None
) -> DataFrame:
    """(host, crawl_delay) pairs for the politeness table.

    With ``user_agent`` the delay comes from the host's selected UA
    group (specific over '*', reference test_robots.py:273-335);
    without, the max across groups (permissive default for synthetic
    '*'-only rule tables)."""
    rel = robots_rules.where(F.col("crawl_delay").isNotNull())
    if user_agent is not None:
        agent = user_agent.lower()
        rel = rel.where(
            (F.col("user_agent") == "*")
            | (F.lower(F.col("user_agent")) == F.lit(agent))
        )
        spec = rel.where(F.lower(F.col("user_agent")) == F.lit(agent))
        star = rel.where(F.col("user_agent") == "*").join(
            spec.select("host").distinct(), "host", "left_anti"
        )
        rel = spec.unionByName(star)
    return rel.groupBy("host").agg(F.max("crawl_delay").alias("crawl_delay"))
