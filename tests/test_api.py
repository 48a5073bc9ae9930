"""Read-path API over a finished crawl: flag filtering, pagination,
sync-token resume (db.py:951-1012 / 1074-1109 semantics)."""

import pytest

from starbelly_spark.api import get_job_items, list_jobs, sync_items
from starbelly_spark.crawl import CrawlSettings, run_crawl, start_job
from starbelly_spark.policy import Limits, Policy, UrlRule
from starbelly_spark.sources.synthetic_web import WebConfig

WEB = WebConfig(n_hosts=3, total_pages=30, branching=3, seed=11)
POLICY = Policy(url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0))
SETTINGS = CrawlSettings(budget=10, per_host_k=2, global_delay=0.1,
                         compact_every=4, seen_partitions=4,
                         bloom_bits=1 << 13, cuckoo_buckets=1 << 8)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("api"))
    start_job(spark, root, "api-job", WEB.seeds(2), POLICY, WEB, SETTINGS)
    run_crawl(spark, root, "api-job", max_batches=100)
    return root


def test_items_ordered_and_paginated(spark, crawled):
    page1 = get_job_items(spark, crawled, "api-job", offset=0, limit=5).collect()
    page2 = get_job_items(spark, crawled, "api-job", offset=5, limit=5).collect()
    seqs = [r.sequence for r in page1 + page2]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert len(page1) == 5


def test_flag_filtering(spark, crawled):
    ok = get_job_items(spark, crawled, "api-job",
                       include_error=False, include_exception=False,
                       limit=1000).collect()
    assert ok and all(r.is_success for r in ok)
    err = get_job_items(spark, crawled, "api-job",
                        include_success=False, limit=1000).collect()
    assert all(not r.is_success for r in err)


def test_body_toggle(spark, crawled):
    no_body = get_job_items(spark, crawled, "api-job", with_body=False, limit=1)
    assert "body" not in no_body.columns


def test_sync_token_resume(spark, crawled):
    df1, tok1 = sync_items(spark, crawled, "api-job", 0, max_items=7)
    rows1 = df1.collect()
    assert len(rows1) == 7 and tok1 == rows1[-1].sequence
    df2, tok2 = sync_items(spark, crawled, "api-job", tok1, max_items=1000)
    rows2 = df2.collect()
    assert all(r.sequence > tok1 for r in rows2)
    # drained: next call returns nothing and the token stays put
    df3, tok3 = sync_items(spark, crawled, "api-job", tok2)
    assert df3.count() == 0 and tok3 == tok2
    # no overlap, full coverage
    all_seqs = {r.sequence for r in rows1} | {r.sequence for r in rows2}
    total = get_job_items(spark, crawled, "api-job", limit=10**6).count()
    assert len(all_seqs) == total


def test_list_jobs(spark, crawled):
    out = list_jobs(spark, crawled, ["api-job", "missing-job"])
    assert len(out) == 1
    assert out[0]["job_id"] == "api-job"
    assert out[0]["run_state"] == "completed"
    assert out[0]["item_count"] > 0


def test_task_tree_snapshot(spark, crawled):
    """r3: task-monitor analogue (reference subscription.py:602-680) —
    nested (name, subtasks) over crawl jobs + Spark scheduler."""
    from starbelly_spark.api import task_tree

    tree = task_tree(spark, crawled, ["api-job", "no-such-job"])
    assert tree["name"] == "<Root>"
    crawl_node, spark_node = tree["subtasks"]
    names = [t["name"] for t in crawl_node["subtasks"]]
    assert len(names) == 1 and names[0].startswith("job api-job (")
    subnames = [s["name"] for s in crawl_node["subtasks"][0]["subtasks"]]
    assert any(n.startswith("batch ") for n in subnames)
    assert spark_node["name"].startswith("spark jobs")


def test_results_as_of_time_travel(spark, crawled):
    """r3: snapshot time travel — an earlier committed batch's results
    table is a strict prefix of the latest one, and its row count
    equals the counters at that batch (Iceberg VERSION AS OF)."""
    from starbelly_spark.api import results_as_of
    from starbelly_spark.tableio import JobStore

    store = JobStore(spark, crawled, "api-job")
    snaps = store.snapshots()
    assert snaps[0] == 0 and len(snaps) >= 3
    mid = snaps[len(snaps) // 2]
    mid_rows = {r.sequence for r in
                results_as_of(spark, crawled, "api-job", mid)
                .select("sequence").collect()}
    last_rows = {r.sequence for r in
                 results_as_of(spark, crawled, "api-job", snaps[-1])
                 .select("sequence").collect()}
    assert mid_rows < last_rows
    m_mid = store.manifest_at(mid)
    assert len(mid_rows) == m_mid["counters"]["item_count"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        results_as_of(spark, crawled, "api-job", 10**6)
