"""Robots semantics — OBEY keeps allowed, INVERT flips, IGNORE skips
robots entirely; longest-prefix rule wins; missing robots permissive.
(Expectations from /root/reference/tests/test_robots.py:68-137 via
SURVEY.md §5.2.)"""

import pytest

from starbelly_spark.policy import IGNORE, INVERT, OBEY, Policy, RobotsPolicy
from starbelly_spark.robots import apply_robots, crawl_delays

RULES = [
    # host, user_agent, path_prefix, allow, crawl_delay
    ("a.test", "*", "/private", False, None),
    ("a.test", "*", "/private/open", True, None),
    ("a.test", "*", "/", True, 2.0),
    ("b.test", "*", "/", False, None),
    ("c.test", "special-bot", "/", False, None),
]

LINKS = [
    ("http://a.test/page", "a.test"),
    ("http://a.test/private/x", "a.test"),
    ("http://a.test/private/open/x", "a.test"),
    ("http://b.test/anything", "b.test"),
    ("http://norobots.test/x", "norobots.test"),
    ("http://c.test/x", "c.test"),
]


@pytest.fixture()
def rules(spark):
    return spark.createDataFrame(
        RULES,
        "host string, user_agent string, path_prefix string, allow boolean, "
        "crawl_delay double",
    )


@pytest.fixture()
def links(spark):
    return spark.createDataFrame(LINKS, "url string, host string")


def _kept(links, rules, usage, ua="generic-bot"):
    policy = Policy(robots=RobotsPolicy(usage=usage), user_agent=ua)
    return sorted(r.url for r in apply_robots(links, rules, policy).collect())


def test_obey(links, rules):
    assert _kept(links, rules, OBEY) == [
        "http://a.test/page",
        "http://a.test/private/open/x",   # longest prefix wins over /private
        "http://c.test/x",                 # special-bot rule doesn't bind us
        "http://norobots.test/x",          # missing robots → permissive
    ]


def test_obey_specific_ua_group(links, rules):
    assert "http://c.test/x" not in _kept(links, rules, OBEY, ua="special-bot")


def test_invert_negates_decision_unconditionally(links, rules):
    """Reference robots.py:90-92: INVERT = `not robots_decision` — a
    permissive answer (incl. missing robots) inverts to denied."""
    kept = _kept(links, rules, INVERT)
    assert "http://a.test/private/x" in kept       # was denied → kept
    assert "http://b.test/anything" in kept
    assert "http://a.test/page" not in kept        # was allowed → dropped
    assert "http://norobots.test/x" not in kept    # permissive → dropped
    assert "http://c.test/x" not in kept           # other-UA group → permissive


def test_ignore_keeps_everything(links, rules):
    assert _kept(links, rules, IGNORE) == sorted(u for u, _ in LINKS)


def test_crawl_delays(rules):
    got = {r.host: r.crawl_delay for r in crawl_delays(rules).collect()}
    assert got == {"a.test": 2.0}
