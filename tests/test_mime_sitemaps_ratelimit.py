"""Round-4 parity features:

* MIME download gate — a disallowed content type aborts the transfer
  in the fetch kernel (body never materializes) and the row never
  reaches crawl results, but the rate limiter still resets — the
  reference's ``MimeNotAllowedError`` semantics
  (``/root/reference/starbelly/downloader.py:25-30,194-213,269-272``).
* ``read_sitemaps`` — robots.txt ``Sitemap:`` URLs seed the frontier
  when the policy flag is on (reference ``policy.py:568-579`` +
  ``robots.py:280-284``).
* ``set_rate_limit`` — a mid-crawl metadata-only commit takes effect
  the next batch (reference ``db.py:1117`` live rate-limit
  changefeed).
"""

import pytest
from pyspark.sql import functions as F

from starbelly_spark.crawl import (
    CrawlSettings,
    run_batch,
    run_crawl,
    set_rate_limit,
    start_job,
)
from starbelly_spark.policy import (
    Limits,
    MimeRule,
    Policy,
    RobotsPolicy,
    UrlRule,
    make_mime_should_save,
)
from starbelly_spark.politeness import POLITENESS_LOG_SCHEMA, latest_politeness
from starbelly_spark.simulator import simulate_crawl
from starbelly_spark.sources.synthetic_web import WebConfig, fetch_one
from starbelly_spark.tableio import JobStore

WEB = WebConfig(n_hosts=4, total_pages=40, branching=2, seed=42)
SETTINGS = CrawlSettings(budget=6, per_host_k=1, global_delay=1.0,
                         compact_every=4, seen_partitions=4,
                         bloom_bits=1 << 13, cuckoo_buckets=1 << 8)

BLOCK_IMAGES = Policy(
    url_rules=(UrlRule("ADD", 1.0),),
    mime_rules=(MimeRule(False, pattern="^image/"), MimeRule(True)),
    limits=Limits(max_cost=4.0),
)


# ---- MIME download gate ----------------------------------------------------

def test_fetch_kernel_aborts_disallowed_mime():
    """Kernel boundary: the body is NEVER materialized for a blocked
    type — not fetched-then-dropped."""
    allow = make_mime_should_save(BLOCK_IMAGES)
    # /p3 is an image page (IMG_EVERY=7 → page%7==3)
    r = fetch_one(WEB, "http://h1.example/p3", mime_allow=allow)
    assert r["mime_blocked"] is True
    assert r["body"] is None and r["links"] == []
    assert r["content_type"].startswith("image/")
    assert r["image_id"] is None            # no image decode happened
    # same URL ungated: body present
    r2 = fetch_one(WEB, "http://h1.example/p3")
    assert r2["mime_blocked"] is False and r2["body"] is not None
    # html passes the gate untouched
    r3 = fetch_one(WEB, "http://h1.example/p0", mime_allow=allow)
    assert r3["mime_blocked"] is False and r3["links"]


def test_mime_blocked_rows_removed_from_results(spark, tmp_path):
    root = str(tmp_path / "mg")
    start_job(spark, root, "jobG", WEB.seeds(2), BLOCK_IMAGES, WEB, SETTINGS)
    m = run_crawl(spark, root, "jobG", max_batches=200)
    assert m["run_state"] == "completed"
    store = JobStore(spark, root, "jobG")
    res = store.table(m, "results")
    # no image row ever recorded
    assert res.where(F.col("content_type").startswith("image/")).count() == 0
    assert res.where(F.col("image_id").isNotNull()).count() == 0
    # blocked rows consumed pops (sequence) but not item_count
    n_pops = m["sequence"] - 1
    assert m["counters"]["item_count"] == res.count() < n_pops
    # ... and still consumed politeness: every fetched host (blocked or
    # not) has a politeness row
    pol = latest_politeness(
        store.table(m, "politeness", POLITENESS_LOG_SCHEMA))
    pol_hosts = {r.host for r in pol.collect()}
    # h*.example/p3 image pages exist on hosts we crawled
    assert pol_hosts  # non-empty
    # equivalence with the simulator under the same gate
    sim = simulate_crawl(
        WEB.seeds(2), BLOCK_IMAGES, WEB,
        budget=SETTINGS.budget, per_host_k=SETTINGS.per_host_k,
        global_delay=SETTINGS.global_delay,
    )
    got = [r.url for r in res.orderBy("sequence").collect()]
    assert got == sim.fetch_order
    spark_seen = {bytes(r.url_hash)
                  for r in store.table(m, "seen_exact").collect()}
    assert spark_seen == sim.seen


def test_default_policy_gate_is_noop(spark, tmp_path):
    """Save-all default rules: the gate never fires and results match
    the ungated contract (images recorded)."""
    root = str(tmp_path / "mn")
    pol = Policy(url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0))
    start_job(spark, root, "jobH", WEB.seeds(1), pol, WEB, SETTINGS)
    m = run_crawl(spark, root, "jobH", max_batches=200)
    store = JobStore(spark, root, "jobH")
    res = store.table(m, "results")
    assert m["counters"]["item_count"] == res.count() == m["sequence"] - 1
    assert res.where(F.col("image_id").isNotNull()).count() > 0


# ---- read_sitemaps ---------------------------------------------------------

def test_robots_sitemaps_parser():
    from starbelly_spark.robots import robots_sitemaps

    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://a.example/sm.xml\n"
        "sitemap: http://a.example/sm2.xml   # comment\n"
        "Sitemap: http://a.example/sm.xml\n"       # dup dropped
        "User-agent: bot\nSitemap: http://a.example/sm3.xml\n"
    )
    assert robots_sitemaps(txt) == [
        "http://a.example/sm.xml",
        "http://a.example/sm2.xml",
        "http://a.example/sm3.xml",             # Sitemap lines are global
    ]
    assert robots_sitemaps(None) == []
    assert robots_sitemaps(b"Sitemap: http://b/x\n") == ["http://b/x"]


def test_policy_doc_roundtrip_read_sitemaps():
    from starbelly_spark.crawl import _doc_to_policy, _policy_to_doc

    p = Policy(robots=RobotsPolicy(read_sitemaps=True))
    assert _doc_to_policy(_policy_to_doc(p)).robots.read_sitemaps is True
    # reference default is False (policy.py:568-569)
    assert Policy().robots.read_sitemaps is False
    assert Policy.from_doc({"robots_txt": {"usage": "OBEY"}}) \
        .robots.read_sitemaps is False


def test_sitemap_urls_seed_frontier(spark, tmp_path):
    """Host 1 (1 % 4 == 1) serves a sitemap page at /p1 and lists it in
    robots.txt; with read_sitemaps on, /p1 enters the frontier at job
    start at seed cost 0."""
    pol = Policy(url_rules=(UrlRule("ADD", 1.0),),
                 limits=Limits(max_cost=4.0),
                 robots=RobotsPolicy(read_sitemaps=True))
    root = str(tmp_path / "sm")
    store = start_job(spark, root, "jobS", ["http://h1.example/p0"],
                      pol, WEB, SETTINGS)
    m = store.latest_manifest()
    rows = {r.url: r.cost for r in store.frontier(m).collect()}
    assert rows == {"http://h1.example/p0": 0.0, "http://h1.example/p1": 0.0}

    # flag off (default): seeds only
    root2 = str(tmp_path / "sm0")
    store2 = start_job(spark, root2, "jobS0", ["http://h1.example/p0"],
                       Policy(url_rules=(UrlRule("ADD", 1.0),),
                              limits=Limits(max_cost=4.0)),
                       WEB, SETTINGS)
    m2 = store2.latest_manifest()
    assert [r.url for r in store2.frontier(m2).collect()] == \
        ["http://h1.example/p0"]

    # end-to-end equivalence with the simulator under the flag
    mf = run_crawl(spark, root, "jobS", max_batches=200)
    sim = simulate_crawl(
        ["http://h1.example/p0"], pol, WEB,
        budget=SETTINGS.budget, per_host_k=SETTINGS.per_host_k,
        global_delay=SETTINGS.global_delay,
    )
    res = JobStore(spark, root, "jobS").table(mf, "results")
    assert [r.url for r in res.orderBy("sequence").collect()] == \
        sim.fetch_order


# ---- set_rate_limit --------------------------------------------------------

def test_set_rate_limit_mid_crawl(spark, tmp_path):
    root = str(tmp_path / "rl")
    pol = Policy(url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0))
    store = start_job(spark, root, "jobR", WEB.seeds(2), pol, WEB, SETTINGS)
    m = run_batch(store, store.latest_manifest())
    # lower h0's delay mid-crawl — a metadata-only commit
    nm = set_rate_limit(spark, root, "jobR", "h0.example", 0.25)
    assert nm["batch_id"] == m["batch_id"] + 1
    assert ["h0.example", 0.25] in nm["rate_limits"]
    # takes effect the NEXT batch: after h0 is fetched again its
    # politeness row carries the overridden delay
    m2 = nm
    for _ in range(6):
        if m2["run_state"] != "running":
            break
        m2 = run_batch(store, m2)
    pol_df = latest_politeness(
        store.table(m2, "politeness", POLITENESS_LOG_SCHEMA))
    delays = {r.host: r.delay for r in pol_df.collect()}
    assert delays.get("h0.example") == 0.25
    # others keep the global default
    other = [d for h, d in delays.items() if h != "h0.example"]
    assert other and all(d == SETTINGS.global_delay for d in other)
    # clearing the override restores the global default on next fetch
    nm3 = set_rate_limit(spark, root, "jobR", "h0.example", None)
    assert all(t[0] != "h0.example" for t in nm3["rate_limits"])


def test_run_crawl_picks_up_external_commit(spark, tmp_path):
    """run_crawl re-reads LATEST between batches, so a set_rate_limit
    issued while the job is parked continues from the config commit."""
    root = str(tmp_path / "rc")
    pol = Policy(url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0))
    start_job(spark, root, "jobC", WEB.seeds(2), pol, WEB, SETTINGS)
    m = run_crawl(spark, root, "jobC", max_batches=1)
    set_rate_limit(spark, root, "jobC", "h1.example", 0.5)
    m2 = run_crawl(spark, root, "jobC", max_batches=200)
    assert m2["run_state"] == "completed"
    assert ["h1.example", 0.5] in m2["rate_limits"]
