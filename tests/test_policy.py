"""Policy engine semantics — expectations pinned from the reference's
tests (/root/reference/tests/test_policy.py:314-351,573-616 via
SURVEY.md §5.2): first-match rule chains, ADD/MULTIPLY cost actions,
DOES_NOT_MATCH, {SEED_DOMAINS} interpolation, MIME terminal default,
cost gate pruning."""

from pyspark.sql import functions as F

from starbelly_spark.policy import (
    ADD,
    DOES_NOT_MATCH,
    MULTIPLY,
    Limits,
    MimeRule,
    Policy,
    UrlRule,
    cost_expr,
    cost_gate_expr,
    expand_seed_domains,
    make_deep_crawl,
    mime_save_expr,
    scheme_filter_expr,
)


def _costs(spark, policy, rows, seed_domains=None):
    df = spark.createDataFrame(rows, "url string, parent_cost double")
    out = df.withColumn(
        "cost", cost_expr(policy, F.col("url"), F.col("parent_cost"), seed_domains)
    )
    return {r.url: r.cost for r in out.collect()}


def test_depth_cost_add_one(spark):
    # Broad-crawl: every link costs parent+1 (depth tracking)
    policy = Policy(url_rules=(UrlRule(ADD, 1.0),))
    got = _costs(spark, policy, [("http://x.com/a", 2.0)])
    assert got["http://x.com/a"] == 3.0


def test_first_match_wins(spark):
    policy = Policy(
        url_rules=(
            UrlRule(MULTIPLY, 10.0, pattern=r"\.html$"),
            UrlRule(ADD, 5.0, pattern=r"^http://x"),
            UrlRule(ADD, 1.0),
        )
    )
    got = _costs(
        spark,
        policy,
        [
            ("http://x.com/page.html", 1.0),  # rule 1 (×10) not rule 2
            ("http://x.com/other", 1.0),       # rule 2 (+5)
            ("http://y.com/z", 1.0),           # terminal (+1)
        ],
    )
    assert got == {
        "http://x.com/page.html": 10.0,
        "http://x.com/other": 6.0,
        "http://y.com/z": 2.0,
    }


def test_does_not_match_and_multiply_zero_prunes(spark):
    # Deep-crawl shape: out-of-domain ×0, pruned by the cost gate
    policy = make_deep_crawl(max_cost=10.0)
    got = _costs(
        spark,
        policy,
        [("http://seed.com/in", 1.0), ("http://other.com/out", 1.0)],
        seed_domains=["seed.com"],
    )
    assert got["http://seed.com/in"] == 2.0
    assert got["http://other.com/out"] == 0.0

    df = spark.createDataFrame(
        [(u, c) for u, c in got.items()], "url string, cost double"
    )
    kept = df.where(cost_gate_expr(policy, F.col("cost"))).collect()
    assert [r.url for r in kept] == ["http://seed.com/in"]


def test_does_not_match_rule(spark):
    policy = Policy(
        url_rules=(
            UrlRule(MULTIPLY, 0.0, pattern=r"^https?://allowed\.com",
                    match=DOES_NOT_MATCH),
            UrlRule(ADD, 1.0),
        )
    )
    got = _costs(
        spark, policy,
        [("http://allowed.com/x", 1.0), ("http://evil.com/x", 1.0)],
    )
    assert got == {"http://allowed.com/x": 2.0, "http://evil.com/x": 0.0}


def test_max_cost_gate(spark):
    policy = Policy(limits=Limits(max_cost=3.0))
    df = spark.createDataFrame(
        [("a", 3.0), ("b", 3.5), ("c", -1.0)], "url string, cost double"
    )
    kept = sorted(
        r.url for r in df.where(cost_gate_expr(policy, F.col("cost"))).collect()
    )
    assert kept == ["a"]


def test_seed_domains_expansion():
    pat = expand_seed_domains("^https?://{SEED_DOMAINS}/", ["a.com", "b.org"])
    assert pat == r"^https?://(a\.com|b\.org)/"


def test_mime_first_match_terminal_default(spark):
    policy = Policy(
        mime_rules=(
            MimeRule(True, pattern=r"^text/"),
            MimeRule(True, pattern=r"^image/"),
            MimeRule(False),   # terminal: everything else not saved
        )
    )
    df = spark.createDataFrame(
        [("text/html",), ("image/png",), ("application/zip",), (None,)],
        "content_type string",
    )
    out = df.withColumn("save", mime_save_expr(policy, F.col("content_type")))
    got = {r.content_type: r.save for r in out.collect()}
    assert got == {
        "text/html": True,
        "image/png": True,
        "application/zip": False,
        None: False,
    }


def test_scheme_filter(spark):
    df = spark.createDataFrame(
        [("http://a/",), ("https://b/",), ("ftp://c/",), ("not a url ::",)],
        "url string",
    )
    kept = sorted(r.url for r in df.where(scheme_filter_expr(F.col("url"))).collect())
    assert kept == ["http://a/", "https://b/"]


def test_policy_from_doc_roundtrip():
    doc = {
        "limits": {"max_cost": 3},
        "url_rules": [
            {"pattern": "^https?://{SEED_DOMAINS}", "match": "MATCHES",
             "action": "ADD", "amount": 1},
            {"action": "MULTIPLY", "amount": 0},
        ],
        "mime_type_rules": [
            {"pattern": "^text/", "match": "MATCHES", "save": True},
            {"save": False},
        ],
        "url_normalization": {"enabled": True, "strip_parameters": ["PHPSESSID"]},
        "robots_txt": {"usage": "OBEY"},
        "user_agents": [{"name": "test-agent/1.0"}],
    }
    p = Policy.from_doc(doc)
    assert p.limits.max_cost == 3
    assert p.url_rules[0].action == "ADD" and p.url_rules[1].amount == 0.0
    assert p.normalization.strip_parameters == ("PHPSESSID",)
    assert p.user_agent == "test-agent/1.0"


# ---- proxy rules (reference policy.py:394-521, tests/test_policy.py:
# 412-453 semantics) ---------------------------------------------------------

def _proxy_for(spark, policy, url):
    from starbelly_spark.policy import proxy_expr

    row = (
        spark.createDataFrame([(url,)], "url string")
        .select(proxy_expr(policy, F.col("url")).alias("p"))
        .collect()[0]["p"]
    )
    return (row["proxy_type"], row["proxy_url"])


def test_proxy_never(spark):
    from starbelly_spark.policy import Policy, ProxyRule

    pol = Policy(proxy_rules=(ProxyRule(),))
    assert _proxy_for(spark, pol, "https://foo.com/index.html") == (None, None)


def test_proxy_always(spark):
    from starbelly_spark.policy import Policy, ProxyRule

    pol = Policy(proxy_rules=(ProxyRule(proxy_url="socks5://squid:3128"),))
    assert _proxy_for(spark, pol, "https://foo.com/index.html") == (
        "socks5", "socks5://squid:3128"
    )


def test_proxy_conditional_first_match(spark):
    from starbelly_spark.policy import Policy, ProxyRule

    pol = Policy(proxy_rules=(
        ProxyRule(proxy_url="socks5://tor:9050", pattern=r"\.onion"),
        ProxyRule(),
    ))
    assert _proxy_for(spark, pol, "https://foo.onion/index.html") == (
        "socks5", "socks5://tor:9050"
    )
    assert _proxy_for(spark, pol, "https://foo.com/index.html") == (None, None)


def test_proxy_does_not_match_and_chain_order(spark):
    from starbelly_spark.policy import Policy, ProxyRule

    pol = Policy(proxy_rules=(
        ProxyRule(proxy_url="http://a:1", pattern=r"\.example",
                  match="DOES_NOT_MATCH"),
        ProxyRule(proxy_url="socks4://b:2", pattern=r"/p1$"),
        ProxyRule(proxy_url="https://fallback:3"),
    ))
    # rule 1 fires (no .example)
    assert _proxy_for(spark, pol, "http://x.test/p1") == ("http", "http://a:1")
    # rule 1 skipped, rule 2 fires
    assert _proxy_for(spark, pol, "http://h0.example/p1") == (
        "socks4", "socks4://b:2"
    )
    # terminal with proxy_url always applies
    assert _proxy_for(spark, pol, "http://h0.example/p2") == (
        "https", "https://fallback:3"
    )


def test_proxy_validation_mirrors_reference():
    import pytest as _pytest

    from starbelly_spark.policy import Policy, ProxyRule, validate_proxy_rules

    # terminal may not carry pattern/match (test_policy.py:421-431)
    with _pytest.raises(ValueError):
        validate_proxy_rules((ProxyRule(pattern="[a-z]+"),))
    with _pytest.raises(ValueError):
        Policy.from_doc({"proxy_rules": [{"match": "MATCHES"}]})
    # non-terminal requires pattern + proxy_url (test_policy.py:455-461)
    with _pytest.raises(ValueError):
        validate_proxy_rules((ProxyRule(proxy_url="http://a:1"), ProxyRule()))
    with _pytest.raises(ValueError):
        validate_proxy_rules((
            ProxyRule(pattern="x", match="MATCHES"), ProxyRule(),
        ))
    # invalid regex / invalid scheme
    with _pytest.raises(ValueError):
        validate_proxy_rules((
            ProxyRule(proxy_url="http://a:1", pattern="^text/("),
            ProxyRule(),
        ))
    with _pytest.raises(ValueError):
        validate_proxy_rules((ProxyRule(proxy_url="gopher://a:1"),))


def test_proxy_doc_roundtrip():
    from starbelly_spark.crawl import _doc_to_policy, _policy_to_doc
    from starbelly_spark.policy import Policy, ProxyRule

    pol = Policy(proxy_rules=(
        ProxyRule(proxy_url="socks5://tor:9050", pattern=r"\.onion"),
        ProxyRule(),
    ))
    assert _doc_to_policy(_policy_to_doc(pol)).proxy_rules == pol.proxy_rules
