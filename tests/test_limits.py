"""Policy limits + round-2 semantics fixes:

* ``max_items`` stops the crawl AT the limit with run_state=completed
  (reference ``starbelly/job.py:515-544`` item-limit stop);
* ``max_duration`` stops at the simulated-clock deadline;
* politeness merge is last-writer-wins (a LOWERED per-host delay takes
  effect — reference rate_limiter.py:287-291 per-domain supersedes);
* the politeness join falls back to a shuffle join past the broadcast
  host threshold (no BroadcastExchange in the plan);
* exception fetches (no status code) are counted apart from errors.
"""

import pytest
from pyspark.sql import functions as F

from starbelly_spark.crawl import CrawlSettings, run_crawl, start_job
from starbelly_spark.policy import Limits, Policy, UrlRule
from starbelly_spark.politeness import eligible_hosts, update_politeness
from starbelly_spark.sources.synthetic_web import WebConfig

WEB = WebConfig(n_hosts=4, total_pages=60, branching=3, seed=42)
SETTINGS = CrawlSettings(budget=8, per_host_k=2, global_delay=0.5,
                         compact_every=4, seen_partitions=4,
                         bloom_bits=1 << 13, cuckoo_buckets=1 << 8)


def _policy(**limits):
    return Policy(url_rules=(UrlRule("ADD", 1.0),),
                  limits=Limits(max_cost=6.0, **limits))


def test_max_items_stops_at_limit(spark, tmp_path):
    root = str(tmp_path / "mi")
    start_job(spark, root, "j", WEB.seeds(3), _policy(max_items=13),
              WEB, SETTINGS)
    m = run_crawl(spark, root, "j", max_batches=100)
    assert m["run_state"] == "completed"
    assert m["completion_reason"] == "max_items"
    # the per-batch budget is capped to the remainder → exact stop
    assert m["counters"]["item_count"] == 13


def test_max_duration_stops_at_deadline(spark, tmp_path):
    root = str(tmp_path / "md")
    start_job(spark, root, "j", WEB.seeds(3), _policy(max_duration=1.2),
              WEB, SETTINGS)
    m = run_crawl(spark, root, "j", max_batches=100)
    assert m["run_state"] == "completed"
    assert m["completion_reason"] == "max_duration"
    # ran at least one batch, and stopped at the first clock ≥ deadline
    assert m["counters"]["item_count"] > 0
    assert m["clock"] >= 1.2


def test_exception_count_wired(spark, tmp_path):
    """ERR_EVERY mix includes null-status exception fetches — they must
    land in exception_count, not http_error_count."""
    web = WebConfig(n_hosts=6, total_pages=400, branching=4, seed=42)
    root = str(tmp_path / "exc")
    settings = CrawlSettings(budget=64, per_host_k=16, global_delay=0.0,
                             compact_every=8, seen_partitions=4,
                             bloom_bits=1 << 15, cuckoo_buckets=1 << 10)
    start_job(spark, root, "j", web.seeds(6), _policy(), web, settings)
    m = run_crawl(spark, root, "j", max_batches=12)
    c = m["counters"]
    assert c["exception_count"] > 0
    assert c["item_count"] == (c["http_success_count"]
                               + c["http_error_count"]
                               + c["exception_count"])
    # status map never contains a null key
    assert all(k != "None" for k in c["http_status_counts"])


def test_politeness_lower_delay_takes_effect(spark):
    """LWW merge: lowering a per-host rate limit mid-crawl must lower
    the stored delay (a max()-merge would pin the old value)."""
    pol0 = spark.createDataFrame(
        [("h0.example", 10.0, 100.0)],
        "host string, delay double, next_allowed_ts double",
    )
    completions = spark.createDataFrame(
        [("h0.example", 200.0)], "host string, completion_ts double"
    )
    lowered = spark.createDataFrame(
        [("h0.example", 2.0)], "host string, delay double"
    )
    out = update_politeness(pol0, completions, lowered, None,
                            global_delay=5.0).collect()
    assert len(out) == 1
    assert out[0]["delay"] == 2.0
    assert out[0]["next_allowed_ts"] == 202.0


def test_politeness_join_not_broadcast_when_gated(spark):
    hosts = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id")).alias("host")
    )
    pol = spark.createDataFrame([], "host string, delay double, "
                                    "next_allowed_ts double")
    plan_b = eligible_hosts(hosts, pol, 0.0, broadcast_ok=True)._jdf \
        .queryExecution().executedPlan().toString()
    plan_s = eligible_hosts(hosts, pol, 0.0, broadcast_ok=False)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan_b
    assert "BroadcastExchange" not in plan_s


def test_zero_budget_rejected(spark, tmp_path):
    root = str(tmp_path / "zb")
    bad = CrawlSettings(budget=0, per_host_k=1, seen_partitions=4,
                        bloom_bits=1 << 13, cuckoo_buckets=1 << 8)
    start_job(spark, root, "j", WEB.seeds(1), _policy(), WEB, bad)
    with pytest.raises(ValueError):
        run_crawl(spark, root, "j", max_batches=1)


def test_politeness_log_writes_only_touched_hosts(spark, tmp_path):
    """Merge-on-read politeness (r2 verdict #2): a batch appends
    O(hosts-fetched-this-batch) rows to the politeness LOG — never a
    full O(#hosts) snapshot rewrite — and compaction collapses the log
    to one latest-wins base dir."""
    from starbelly_spark.politeness import (
        POLITENESS_LOG_SCHEMA,
        latest_politeness,
    )
    from starbelly_spark.tableio import JobStore

    web = WebConfig(n_hosts=8, total_pages=64, branching=3, seed=7)
    # budget 2, per_host_k 1 → ≤2 hosts fetched per batch while 8 exist
    settings = CrawlSettings(budget=2, per_host_k=1, global_delay=0.25,
                             compact_every=100, seen_partitions=4,
                             bloom_bits=1 << 13, cuckoo_buckets=1 << 8)
    root = str(tmp_path / "pl")
    start_job(spark, root, "j", web.seeds(6), _policy(), web, settings)
    run_crawl(spark, root, "j", max_batches=6)
    store = JobStore(spark, root, "j")
    m = store.latest_manifest()
    rels = m["tables"]["politeness"]
    assert len(rels) >= 4, "log-structured: one appended dir per batch"
    per_dir = [
        store.read_dirs([r], POLITENESS_LOG_SCHEMA).collect() for r in rels
    ]
    for rows in per_dir:
        # O(hosts touched): bounded by the batch budget, not #hosts
        assert 0 < len(rows) <= settings.budget
        hosts = [r.host for r in rows]
        assert len(hosts) == len(set(hosts))
    resolved = latest_politeness(
        store.table(m, "politeness", POLITENESS_LOG_SCHEMA)
    ).collect()
    n_hosts_total = len({r.host for r in resolved})
    assert n_hosts_total > settings.budget, \
        "crawl touched more hosts than any one batch wrote"
    # latest-wins: the resolved row per host is the row from the
    # highest batch_id that touched it
    best = {}
    for rows in per_dir:
        for r in rows:
            if r.host not in best or r.batch_id > best[r.host].batch_id:
                best[r.host] = r
    got = {r.host: (r.delay, r.next_allowed_ts) for r in resolved}
    want = {h: (r.delay, r.next_allowed_ts) for h, r in best.items()}
    assert got == want

    # compaction collapses the log to ONE base dir, same resolved state
    from starbelly_spark.crawl import run_batch
    settings2 = CrawlSettings(**{**m["settings"], "compact_every": 1})
    m["settings"] = settings2.__dict__ | {}
    m2 = run_batch(store, m)
    assert len(m2["tables"]["politeness"]) == 1
    resolved2 = latest_politeness(
        store.table(m2, "politeness", POLITENESS_LOG_SCHEMA)
    ).collect()
    assert {r.host for r in resolved2} >= {r.host for r in resolved}
