"""Round-5 control-plane surfaces: delete_job (reference db.py:910-935 +
server/job.py:17-30), multi-user-agent rotation (policy.py:820-834,
downloader.py:279-280, robots.py:88), concurrent-commit detection, and
the performance_profile API (server/system.py:11-46)."""

import pytest
from pyspark.sql import functions as F

from starbelly_spark.api import get_job_items, list_jobs
from starbelly_spark.crawl import (
    CrawlSettings,
    cancel_job,
    delete_job,
    performance_profile,
    run_crawl,
    start_job,
)
from starbelly_spark.policy import Limits, Policy, UrlRule
from starbelly_spark.simulator import simulate_crawl
from starbelly_spark.sources.synthetic_web import WebConfig
from starbelly_spark.tableio import ConcurrentCommitError, JobStore, new_manifest

WEB = WebConfig(n_hosts=4, total_pages=40, branching=2, seed=42)
POLICY = Policy(url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0))
SETTINGS = CrawlSettings(budget=6, per_host_k=1, global_delay=1.0,
                         compact_every=4, seen_partitions=4,
                         bloom_bits=1 << 13, cuckoo_buckets=1 << 8)


# ---------------------------------------------------------------- delete_job

def test_delete_refuses_running_job(spark, tmp_path):
    root = str(tmp_path)
    start_job(spark, root, "jdel1", WEB.seeds(1), POLICY, WEB, SETTINGS)
    with pytest.raises(ValueError, match="cancelled or completed"):
        delete_job(spark, root, "jdel1")
    # still listed — nothing was removed
    assert [j["job_id"] for j in list_jobs(spark, root, ["jdel1"])] == ["jdel1"]


def test_delete_purges_finished_job(spark, tmp_path):
    import os

    root = str(tmp_path)
    start_job(spark, root, "jdel2", WEB.seeds(2), POLICY, WEB, SETTINGS)
    run_crawl(spark, root, "jdel2", max_batches=3)
    cancel_job(spark, root, "jdel2")
    assert os.path.isdir(os.path.join(root, "jdel2"))
    delete_job(spark, root, "jdel2")
    # results/frontier/seen state dirs are gone
    assert not os.path.exists(os.path.join(root, "jdel2"))
    # list_jobs no longer sees it; item reads raise the reference's
    # "no job exists" error
    assert list_jobs(spark, root, ["jdel2"]) == []
    with pytest.raises(ValueError, match="no job exists"):
        get_job_items(spark, root, "jdel2")


# ------------------------------------------------------- multi-user-agent

def test_user_agent_rotation_observed_in_headers(spark, tmp_path):
    root = str(tmp_path)
    policy = Policy(
        url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0),
        user_agent="agent-a/1.0", user_agents=("agent-a/1.0", "agent-b/2.0"),
    )
    start_job(spark, root, "jua", WEB.seeds(2), policy, WEB, SETTINGS)
    run_crawl(spark, root, "jua", max_batches=200)
    store = JobStore(spark, root, "jua")
    res = store.table(store.latest_manifest(), "results")
    # header layout is flattened KV pairs: USER-AGENT is present and
    # under a 2-agent policy BOTH agents appear across the crawl
    rows = res.select(
        F.element_at("headers", -1).alias("ua"),
        "url",
    ).collect()
    agents = {r["ua"] for r in rows}
    assert agents == {"agent-a/1.0", "agent-b/2.0"}
    # the per-row choice is the deterministic crc32(url) pick
    for r in rows:
        assert r["ua"] == policy.agent_for(r["url"])
    # simulator mirrors the rotation row-for-row
    sim = simulate_crawl(
        WEB.seeds(2), policy, WEB, budget=SETTINGS.budget,
        per_host_k=SETTINGS.per_host_k, global_delay=SETTINGS.global_delay,
    )
    sim_ua = {r["url"]: r["user_agent"] for r in sim.results}
    for r in rows:
        assert sim_ua[r["url"]] == r["ua"]


def test_robots_uses_first_agent_only(spark):
    # group selection: host has a specific group for agent-b; a policy
    # whose FIRST agent is agent-a must use the '*' group even though
    # agent-b is in the rotation list (reference robots.py:88)
    from starbelly_spark.robots import apply_robots

    rules = spark.createDataFrame(
        [("h0.example", "*", "/", True, None),
         ("h0.example", "agent-b", "/", False, None)],
        "host string, user_agent string, path_prefix string, "
        "allow boolean, crawl_delay double",
    )
    links = spark.createDataFrame(
        [("http://h0.example/p1", "h0.example")], "url string, host string"
    )
    p_first_a = Policy(user_agent="agent-a", user_agents=("agent-a", "agent-b"))
    assert apply_robots(links, rules, p_first_a).count() == 1
    p_first_b = Policy(user_agent="agent-b", user_agents=("agent-b", "agent-a"))
    assert apply_robots(links, rules, p_first_b).count() == 0


# --------------------------------------------------- concurrent commits

def test_concurrent_commit_raises_instead_of_clobbering(spark, tmp_path):
    root = str(tmp_path)
    store = start_job(spark, root, "jcc", WEB.seeds(1), POLICY, WEB, SETTINGS)
    m = store.latest_manifest()
    # two writers race to commit batch_id+1: the second must fail
    # loudly, never silently clobber (ADVICE r4 crawl.py:1065)
    w1 = new_manifest("jcc", m["batch_id"] + 1, m)
    w2 = new_manifest("jcc", m["batch_id"] + 1, m)
    store.commit(w1)
    with pytest.raises(ConcurrentCommitError, match="concurrent"):
        store.commit(w2)
    # and a stale writer (older batch id) also fails
    with pytest.raises(ConcurrentCommitError):
        store.commit(new_manifest("jcc", m["batch_id"], m))


def test_commit_takes_over_crashed_orphan_manifest(spark, tmp_path):
    """r6 atomic-claim commit: a manifest file WITHOUT a LATEST flip is
    the orphan of a crash between commit's two writes — a new commit of
    the same batch id must take it over (crash-invisibility), while a
    manifest that LATEST does point at stays protected (previous
    test)."""
    import json as _json

    root = str(tmp_path)
    store = start_job(spark, root, "jorph", WEB.seeds(1), POLICY, WEB,
                      SETTINGS)
    m = store.latest_manifest()
    orphan = new_manifest("jorph", m["batch_id"] + 1, m)
    orphan["marker"] = "orphan"
    with open(store._manifest_path(orphan["batch_id"]), "w") as f:
        f.write(_json.dumps(orphan))
    winner = new_manifest("jorph", m["batch_id"] + 1, m)
    winner["marker"] = "winner"
    store.commit(winner)
    latest = store.latest_manifest()
    assert latest["batch_id"] == m["batch_id"] + 1
    assert latest["marker"] == "winner"


def test_run_crawl_retries_lost_commit_race(spark, tmp_path, monkeypatch):
    """r6 (ADVICE r5 #2): a ConcurrentCommitError from a live admin
    commit must not kill the crawl loop — run_crawl re-reads LATEST and
    recomputes the batch."""
    import starbelly_spark.tableio as tio

    root = str(tmp_path)
    start_job(spark, root, "jrr", WEB.seeds(2), POLICY, WEB, SETTINGS)
    real = tio.JobStore.commit
    state = {"injected": False}

    def flaky(self, manifest):
        if not state["injected"] and manifest["batch_id"] == 2:
            state["injected"] = True
            raise ConcurrentCommitError("injected race")
        return real(self, manifest)

    monkeypatch.setattr(tio.JobStore, "commit", flaky)
    m = run_crawl(spark, root, "jrr", max_batches=2)
    assert state["injected"]
    assert m["counters"]["item_count"] > 0
    # the retried batch committed; no stale carry poisoned the pop
    assert m["batch_id"] >= 2


# ------------------------------------------------- performance_profile

def test_performance_profile_stages_and_cprofile(spark, tmp_path):
    root = str(tmp_path)
    start_job(spark, root, "jpp", WEB.seeds(2), POLICY, WEB, SETTINGS)
    run_crawl(spark, root, "jpp", max_batches=2)
    prof = performance_profile(spark, root, "jpp")
    assert len(prof["stages"]) == 2
    for b in prof["stages"]:
        assert "total" in b and b["total"] > 0
        assert any("stats-agg" in k for k in b)
    assert prof["stage_totals"]["total"] > 0
    # cprofile mode advances the running job one batch and returns
    # function rows (the reference's top-N by cumulative time)
    prof2 = performance_profile(spark, root, "jpp", cprofile=True, top_n=5)
    assert len(prof2["functions"]) == 5
    assert all(f["cumtime"] >= 0 for f in prof2["functions"])
    assert len(prof2["stages"]) >= 2
