"""robots.txt TEXT parser → rules table → decisions.

Ports the behavior expectations of
``/root/reference/tests/test_robots.py:68-137,273-396`` onto real
robots.txt byte fixtures feeding ``parse_robots_txt`` /
``robots_rules_from_files`` / ``apply_robots``.
"""

import pytest

from starbelly_spark.policy import INVERT, OBEY, Policy, RobotsPolicy
from starbelly_spark.robots import (
    apply_robots,
    crawl_delays,
    parse_robots_txt,
    robots_rules_from_files,
)

# the reference fixture file (tests/test_robots.py:56-66)
REF_FILE = (
    b"User-agent: *\n"
    b"Disallow: /foo/\n"
    b"\n"
    b"User-agent: TestAgent1\n"
    b"Disallow: /bar/\n"
)

DELAY_FILE = (
    b"User-agent: TestAgent1\n"
    b"Crawl-delay: 5\n"
    b"Disallow: /bar/\n"
)

LINKS = [
    ("http://www.example/index.html", "www.example"),
    ("http://www.example/foo/", "www.example"),
    ("http://www.example/bar/", "www.example"),
]


def _decide(spark, usage, agent, file=REF_FILE, links=LINKS):
    files = spark.createDataFrame(
        [(h, file) for h in {h for _, h in links}],
        "host string, robots_txt binary",
    )
    rules = robots_rules_from_files(spark, files)
    links_df = spark.createDataFrame(links, "url string, host string")
    policy = Policy(robots=RobotsPolicy(usage=usage), user_agent=agent)
    return sorted(r.url for r in apply_robots(links_df, rules, policy).collect())


def test_parse_groups_and_rules():
    rows = parse_robots_txt("www.example", REF_FILE)
    assert ("www.example", "*", "/foo/", False, None) in rows
    assert ("www.example", "testagent1", "/bar/", False, None) in rows
    assert len(rows) == 2


def test_parse_malformed_is_permissive():
    assert parse_robots_txt("h", None) == []
    assert parse_robots_txt("h", b"") == []
    assert parse_robots_txt("h", b"\xff\xfe garbage \x00 lines") == []
    # rules before any user-agent line are ignored
    assert parse_robots_txt("h", b"Disallow: /x\n") == []
    # empty Disallow value = allow-all = no row
    assert parse_robots_txt("h", b"User-agent: *\nDisallow:\n") == []


def test_parse_shared_group_and_allow():
    rows = parse_robots_txt(
        "h",
        b"User-agent: A\nUser-agent: B\nDisallow: /x\nAllow: /x/open\n",
    )
    assert ("h", "a", "/x", False, None) in rows
    assert ("h", "a", "/x/open", True, None) in rows
    assert ("h", "b", "/x", False, None) in rows
    assert len(rows) == 4


def test_parse_crawl_delay_belongs_to_group():
    rows = parse_robots_txt("h", DELAY_FILE)
    assert rows == [("h", "testagent1", "/bar/", False, 5.0)]
    # delay-only group still surfaces its delay (via a no-op allow row)
    rows2 = parse_robots_txt("h", b"User-agent: Z\nCrawl-delay: 2.5\n")
    assert rows2 == [("h", "z", "/", True, 2.5)]


def test_obey_agent_groups_replace_star(spark):
    """reference test_fetch_robots: TestAgent1's own group REPLACES '*'
    (so /foo/ is allowed for it), TestAgent2 falls back to '*'."""
    kept1 = _decide(spark, OBEY, "TestAgent1")
    assert kept1 == [
        "http://www.example/foo/",
        "http://www.example/index.html",
    ]
    kept2 = _decide(spark, OBEY, "TestAgent2")
    assert kept2 == [
        "http://www.example/bar/",
        "http://www.example/index.html",
    ]


def test_invert_from_parsed_file(spark):
    """reference test_fetch_robots_invert: exact negation per agent."""
    assert _decide(spark, INVERT, "TestAgent1") == ["http://www.example/bar/"]
    assert _decide(spark, INVERT, "TestAgent2") == ["http://www.example/foo/"]


def test_crawl_delay_group_selection(spark):
    files = spark.createDataFrame(
        [("www.example", DELAY_FILE)], "host string, robots_txt binary"
    )
    rules = robots_rules_from_files(spark, files)
    got1 = {r.host: r.crawl_delay
            for r in crawl_delays(rules, "TestAgent1").collect()}
    assert got1 == {"www.example": 5.0}
    # another agent has no group with a delay
    assert crawl_delays(rules, "OtherAgent").count() == 0
