"""Leveled (size-tiered) seen_exact compaction — r4 verdict #5.

The IO-shape contract: compaction IO is bounded by NEW-data size, never
by total seen-set size (the former full rewrite each ``compact_every``
was a whole-table rewrite on a fixed clock — at 10^10 URLs, fatal).
The planner is a pure function (tableio.plan_seen_compaction), so the
write-amplification bound is asserted exactly, without Spark; one e2e
crawl then pins the engine wiring (bounded dir list, base dirs left
physically untouched, exact seen semantics preserved across the merge
and across kill/resume)."""

import math
import os

from starbelly_spark.crawl import CrawlSettings, run_crawl, start_job
from starbelly_spark.policy import Limits, Policy, UrlRule
from starbelly_spark.sources.synthetic_web import WebConfig
from starbelly_spark.tableio import (
    SEEN_MAX_DIRS,
    SEEN_MERGE_FACTOR,
    JobStore,
    plan_seen_compaction,
)


# ------------------------------------------------------------- pure planner

def test_plan_noop_below_trigger():
    sizes = [(f"d{i}", 100) for i in range(SEEN_MAX_DIRS)]
    merge, keep = plan_seen_compaction(sizes)
    assert merge == []
    assert keep == [r for r, _ in sizes]


def test_plan_big_base_is_immune():
    """A base dir that dwarfs the appended smalls is NEVER rewritten —
    the exact failure mode of the full-rewrite scheme."""
    sizes = [("base", 1_000_000)] + [(f"a{i}", 100) for i in range(9)]
    merge, keep = plan_seen_compaction(sizes)
    assert "base" in keep
    assert sorted(merge) == sorted(f"a{i}" for i in range(9))


def test_plan_merges_at_least_two_or_nothing():
    # one small dir + nine immune giants: nothing sane to merge
    sizes = [("s", 1)] + [(f"g{i}", 10_000 * (i + 1)) for i in range(9)]
    merge, keep = plan_seen_compaction(sizes)
    assert merge == []
    assert len(keep) == 10


def test_plan_write_amplification_is_logarithmic():
    """Simulate a long crawl: N equal-size appends, planning after each.
    Total rewritten bytes must be O(N log N) — each byte rewritten at
    most ~log_factor(N) times — NOT the O(N^2) of periodic full
    rewrites.  Also: every merge's IO is bounded by factor/(factor-1) x
    the new bytes accumulated since the last merge touched them, never
    by the table total."""
    append = 100  # bytes per batch's new-seen dir
    n = 400
    dirs: list[tuple[str, int]] = []
    total_rewritten = 0
    total_appended = 0
    seq = 0
    for i in range(n):
        dirs.append((f"add{i}", append))
        total_appended += append
        merge, keep = plan_seen_compaction(dirs)
        if merge:
            by_rel = dict(dirs)
            merged_bytes = sum(by_rel[r] for r in merge)
            total_rewritten += merged_bytes
            # IO of ONE merge: bounded by the small tiers, not the table
            table_total = sum(b for _, b in dirs)
            immune_bytes = sum(by_rel[r] for r in keep)
            assert merged_bytes == table_total - immune_bytes
            seq += 1
            dirs = [(r, by_rel[r]) for r in keep] + [
                (f"lvl{seq}", merged_bytes)
            ]
        assert len(dirs) <= SEEN_MAX_DIRS + math.ceil(
            math.log(n, SEEN_MERGE_FACTOR)
        ) + 1
    # per-byte rewrite count ≤ log_factor(N) + slack
    max_rewrites = math.log(n, SEEN_MERGE_FACTOR) + 2
    assert total_rewritten <= total_appended * max_rewrites, (
        f"write amplification {total_rewritten / total_appended:.1f}x "
        f"exceeds the O(log) bound {max_rewrites:.1f}x"
    )


def test_plan_deterministic():
    sizes = [(f"d{i}", (i * 37) % 11 + 1) for i in range(12)]
    assert plan_seen_compaction(sizes) == plan_seen_compaction(
        list(reversed(sizes))
    )


# ------------------------------------------------------------------ e2e

def test_seen_compaction_engine_shape(spark, tmp_path):
    """Drive enough batches to trigger ≥1 leveled merge; assert the dir
    list stays bounded, a previously-written level is left PHYSICALLY
    untouched by later merges (mtime stable), and the resolved seen set
    still equals the simulator's exactly."""
    web = WebConfig(n_hosts=6, total_pages=600, branching=3, seed=11)
    policy = Policy(url_rules=(UrlRule("ADD", 1.0),),
                    limits=Limits(max_cost=20.0))
    settings = CrawlSettings(budget=4, per_host_k=2, global_delay=0.5,
                             compact_every=100,  # isolate the leveled path
                             seen_partitions=4,
                             bloom_bits=1 << 13, cuckoo_buckets=1 << 8)
    root = str(tmp_path / "lc")
    start_job(spark, root, "j", web.seeds(3), policy, web, settings)
    m = run_crawl(spark, root, "j", max_batches=SEEN_MAX_DIRS + 3)
    store = JobStore(spark, root, "j")
    rels = m["tables"]["seen_exact"]
    assert any(r.startswith("seen_exact_base/") for r in rels), \
        "no leveled merge happened — trigger never fired"
    assert len(rels) <= SEEN_MAX_DIRS + 2
    level_rel = next(r for r in rels if r.startswith("seen_exact_base/"))
    level_mtimes = {}
    lp = os.path.join(store.dir, level_rel)
    for fn in os.listdir(lp):
        level_mtimes[fn] = os.path.getmtime(os.path.join(lp, fn))

    # run further batches: the existing level must not be rewritten
    # unless it stops dwarfing its smaller siblings
    m2 = run_crawl(spark, root, "j", max_batches=3)
    if level_rel in m2["tables"]["seen_exact"]:
        for fn, mt in level_mtimes.items():
            assert os.path.getmtime(os.path.join(lp, fn)) == mt, \
                "kept level was physically rewritten"

    # exactness: a merge is a pure RE-LAYOUT — at the first merge batch
    # M, resolved seen(M) must equal seen(M-1) ∪ the rows batch M
    # appended (snapshot history makes both sides readable)
    merge_bid = next(
        b for b in store.snapshots()
        if any(r.startswith("seen_exact_base/")
               for r in store.manifest_at(b)["tables"]["seen_exact"])
    )
    m_at = store.manifest_at(merge_bid)
    m_before = store.manifest_at(merge_bid - 1)
    seen_before = {
        bytes(r.url_hash) for r in store.seen_exact(m_before).collect()
    }
    added = {
        bytes(r.url_hash)
        for r in store.read_dirs(
            [f"frontier_add/batch={merge_bid:08d}"]
        ).select("url_hash").collect()
    }
    seen_after = {
        bytes(r.url_hash) for r in store.seen_exact(m_at).collect()
    }
    assert seen_after == seen_before | added
