"""End-to-end crawl engine: runs to exhaustion, matches the pure-Python
reference simulator on fetch order + final seen set, resumes exactly
from a mid-crawl snapshot, honors lifecycle commands."""

import os

import pytest
from pyspark.sql import functions as F

from starbelly_spark.crawl import (
    CrawlSettings,
    cancel_job,
    job_stats,
    pause_job,
    resume_job,
    run_crawl,
    start_job,
)
from starbelly_spark.policy import Limits, Policy, UrlRule
from starbelly_spark.simulator import simulate_crawl
from starbelly_spark.sources.synthetic_web import WebConfig
from starbelly_spark.tableio import JobStore

WEB = WebConfig(n_hosts=4, total_pages=40, branching=2, seed=42)
SMALL_WEB = WebConfig(n_hosts=3, total_pages=18, branching=2, seed=42)
POLICY = Policy(url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0))
SETTINGS = CrawlSettings(budget=6, per_host_k=1, global_delay=1.0,
                         compact_every=4, seen_partitions=4,
                         bloom_bits=1 << 13, cuckoo_buckets=1 << 8)


def _spark_fetch_order(store):
    m = store.latest_manifest()
    res = store.table(m, "results")
    return [r.url for r in res.orderBy("sequence").collect()]


@pytest.fixture(scope="module")
def finished(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl"))
    store = start_job(spark, root, "jobE", WEB.seeds(2), POLICY, WEB, SETTINGS)
    m = run_crawl(spark, root, "jobE", max_batches=200)
    return root, store, m


def test_crawl_completes(finished):
    _root, _store, m = finished
    assert m["run_state"] == "completed"
    assert m["counters"]["item_count"] > 10


def test_matches_simulator_order_and_seen_set(finished):
    root, store, m = finished
    sim = simulate_crawl(
        WEB.seeds(2), POLICY, WEB,
        budget=SETTINGS.budget, per_host_k=SETTINGS.per_host_k,
        global_delay=SETTINGS.global_delay,
    )
    got = _spark_fetch_order(store)
    assert got == sim.fetch_order
    spark_seen = {
        bytes(r.url_hash)
        for r in store.table(m, "seen_exact").collect()
    }
    assert spark_seen == sim.seen
    # per-row payload invariants: caption equality for fetched images
    res = store.table(m, "results")
    caps = {r.url: (r.image_id, r.caption)
            for r in res.where(F.col("image_id").isNotNull()).collect()}
    sim_caps = {r["url"]: (r["image_id"], r["caption"])
                for r in sim.results if r["image_id"]}
    assert caps == sim_caps and len(caps) > 0


def test_image_psnr_invariant(finished, spark):
    from starbelly_spark.functions.images import psnr_vs_oracle_udf

    _root, store, m = finished
    res = store.table(m, "results").where(
        F.col("image_id").isNotNull() & F.col("body").isNotNull()
    )
    checked = res.select(
        psnr_vs_oracle_udf(
            F.col("body"), F.col("image_id"), F.col("w"), F.col("h")
        ).alias("psnr")
    )
    rows = checked.collect()
    assert rows and all(r.psnr >= 40.0 for r in rows)


def test_metrics_and_lineage_written(finished):
    _root, store, m = finished
    metrics = store.table(m, "metrics")
    assert metrics.count() > 0
    agg = metrics.agg(F.sum("urls_fetched").alias("n")).collect()[0]
    assert agg["n"] == m["counters"]["item_count"]
    lineage = store.table(m, "lineage")
    assert lineage.count() > 0


def test_kill_and_resume_exactly(spark, tmp_path):
    """Run 3 batches, 'crash', resume — final state must equal an
    uninterrupted run (snapshot-exact resume, north rule)."""
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    start_job(spark, root_a, "j", SMALL_WEB.seeds(2), POLICY, SMALL_WEB, SETTINGS)
    start_job(spark, root_b, "j", SMALL_WEB.seeds(2), POLICY, SMALL_WEB, SETTINGS)

    run_crawl(spark, root_a, "j", max_batches=3)   # "killed" after 3 batches
    run_crawl(spark, root_a, "j", max_batches=500)  # resume to completion
    run_crawl(spark, root_b, "j", max_batches=500)  # uninterrupted

    sa = JobStore(spark, root_a, "j")
    sb = JobStore(spark, root_b, "j")
    assert _spark_fetch_order(sa) == _spark_fetch_order(sb)
    ma, mb = sa.latest_manifest(), sb.latest_manifest()
    assert ma["counters"] == mb["counters"]
    assert ma["clock"] == mb["clock"]


def test_lifecycle_pause_resume_cancel(spark, tmp_path):
    root = str(tmp_path / "lc")
    start_job(spark, root, "j2", SMALL_WEB.seeds(1), POLICY, SMALL_WEB, SETTINGS)
    run_crawl(spark, root, "j2", max_batches=2)
    pause_job(spark, root, "j2")
    st = job_stats(spark, root, "j2")
    assert st["run_state"] == "paused"
    m = run_crawl(spark, root, "j2", max_batches=5)
    assert m["run_state"] == "paused"   # paused job doesn't run

    resume_job(spark, root, "j2")
    cancel_job(spark, root, "j2")
    st = job_stats(spark, root, "j2")
    assert st["run_state"] == "cancelled"
    store = JobStore(spark, root, "j2")
    assert store.frontier(store.latest_manifest()).count() == 0


def test_crash_between_data_and_manifest_is_invisible(spark, tmp_path):
    """Dangling data dirs without a manifest must not change state."""
    root = str(tmp_path / "cr")
    store = start_job(spark, root, "j3", SMALL_WEB.seeds(1), POLICY,
                      SMALL_WEB, SETTINGS)
    m1 = run_crawl(spark, root, "j3", max_batches=1)
    # simulate a crash: data written for batch N+1 but no manifest
    orphan = store.write_dir("results", 999, store.table(m1, "results"))
    assert os.path.exists(os.path.join(store.dir, orphan))
    m2 = store.latest_manifest()
    assert m2["batch_id"] == m1["batch_id"]
    assert orphan not in m2["tables"].get("results", [])


def test_proxy_rules_routed_through_fetch(spark, tmp_path):
    """Data-plane proxy routing (reference policy.py:501-521 +
    downloader.py:266): every fetched row carries the proxy_url the
    first-match chain selects for its URL."""
    from starbelly_spark.policy import ProxyRule

    pol = Policy(
        url_rules=(UrlRule("ADD", 1.0),),
        limits=Limits(max_cost=3.0),
        proxy_rules=(
            ProxyRule(proxy_url="socks5://tor:9050", pattern=r"^http://h0\."),
            ProxyRule(proxy_url="http://cache:3128", pattern=r"/p[13]$"),
            ProxyRule(),
        ),
    )
    root = str(tmp_path / "proxy")
    store = start_job(spark, root, "jp", SMALL_WEB.seeds(2), pol,
                      SMALL_WEB, SETTINGS)
    m = run_crawl(spark, root, "jp", max_batches=30)
    rows = store.table(m, "results").select("url", "proxy_url").collect()
    assert len(rows) > 5
    import re as _re

    for r in rows:
        if _re.match(r"^http://h0\.", r.url):
            want = "socks5://tor:9050"
        elif _re.search(r"/p[13]$", r.url):
            want = "http://cache:3128"
        else:
            want = None
        assert r.proxy_url == want, (r.url, r.proxy_url, want)
    # proxied and unproxied rows both occurred
    got = {r.proxy_url for r in rows}
    assert "socks5://tor:9050" in got and None in got


def test_carry_precompute_equivalence(spark, tmp_path, monkeypatch):
    """r4: the next-batch (hosts, clock-jump) carry precompute must be
    a pure relocation of work — forcing it ON at toy scale (default:
    gated to ≥100k-row frontiers) yields byte-identical crawl order,
    counters, and clock vs the on-the-spot fallback."""
    import starbelly_spark.crawl as crawl_mod

    def run(root, job, carry_min):
        monkeypatch.setattr(crawl_mod, "CARRY_MIN_FRONTIER", carry_min)
        store = start_job(spark, str(root), job, WEB.seeds(2), POLICY,
                          WEB, SETTINGS)
        m = run_crawl(spark, str(root), job, max_batches=200)
        return store, m

    s1, m1 = run(tmp_path / "c_on", "jc1", 0)            # carry every batch
    s2, m2 = run(tmp_path / "c_off", "jc2", 10 ** 12)    # never carry
    assert _spark_fetch_order(s1) == _spark_fetch_order(s2)
    assert m1["counters"] == m2["counters"]
    assert m1["clock"] == m2["clock"]
    assert m1["batch_id"] == m2["batch_id"]
