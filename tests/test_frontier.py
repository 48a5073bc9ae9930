"""Frontier pop semantics — mirrors the reference's integration
expectations (/root/reference/integration/test_db.py:176-220, via
SURVEY.md §5.2): ascending cost, in-flight rows skipped, claimed batch
excluded from the next pop, deterministic tie-break."""

from pyspark.sql import functions as F

from starbelly_spark.functions.urls import url_hash
from starbelly_spark.operators.frontier import (
    any_in_flight,
    frontier_size,
    pop_batch,
    topk_per_group,
)


def _frontier(spark, rows):
    data = [
        (
            "job1",
            url,
            url.split("/")[2],
            float(cost),
            bool(in_flight),
            url_hash(url),
            url_hash(url).hex(),
        )
        for url, cost, in_flight in rows
    ]
    return spark.createDataFrame(
        data,
        "job_id string, url string, host string, cost double, "
        "in_flight boolean, url_hash binary, url_hash_hex string",
    )


def test_pop_ascending_cost_skips_in_flight(spark):
    fr = _frontier(
        spark,
        [
            ("http://a.test/1", 1.0, False),
            ("http://b.test/2", 2.0, False),
            ("http://c.test/25", 2.5, True),   # in flight → never popped
            ("http://d.test/3", 3.0, False),
        ],
    )
    batch1 = pop_batch(fr, budget=2, per_host_k=1)
    got1 = [r.cost for r in batch1.orderBy("cost").collect()]
    assert got1 == [1.0, 2.0]

    popped_urls = [r.url for r in batch1.collect()]
    fr2 = fr.where(~F.col("url").isin(popped_urls))
    batch2 = pop_batch(fr2, budget=2, per_host_k=1)
    got2 = [(r.url, r.cost) for r in batch2.collect()]
    assert got2 == [("http://d.test/3", 3.0)]


def test_per_host_cap(spark):
    fr = _frontier(
        spark,
        [
            ("http://a.test/1", 1.0, False),
            ("http://a.test/2", 1.5, False),
            ("http://a.test/3", 2.0, False),
            ("http://b.test/1", 5.0, False),
        ],
    )
    batch = pop_batch(fr, budget=10, per_host_k=1)
    got = sorted((r.host, r.cost) for r in batch.collect())
    assert got == [("a.test", 1.0), ("b.test", 5.0)]


def test_eligible_hosts_politeness_gate(spark):
    fr = _frontier(
        spark,
        [
            ("http://a.test/1", 1.0, False),
            ("http://b.test/1", 2.0, False),
        ],
    )
    eligible = spark.createDataFrame([("b.test",)], "host string")
    batch = pop_batch(fr, budget=10, per_host_k=1, eligible_hosts=eligible)
    assert [r.host for r in batch.collect()] == ["b.test"]


def test_tie_break_deterministic_across_shuffles(spark):
    rows = [(f"http://h{i}.test/x", 1.0, False) for i in range(20)]
    fr = _frontier(spark, rows)
    a = [r.url for r in pop_batch(fr.repartition(8), 5).orderBy("url_hash_hex").collect()]
    b = [r.url for r in pop_batch(fr.repartition(2), 5).orderBy("url_hash_hex").collect()]
    assert a == b and len(a) == 5
    # ties broken by url_hash_hex ascending
    hashes = sorted(url_hash(u).hex() for u, _, _ in rows)[:5]
    assert sorted(url_hash(u).hex() for u in a) == hashes


def test_size_and_in_flight_probes(spark):
    fr = _frontier(
        spark,
        [("http://a.test/1", 1.0, False), ("http://b.test/2", 2.0, True)],
    )
    assert frontier_size(fr, "job1") == 2
    assert any_in_flight(fr, "job1") is True
    assert any_in_flight(fr, "nope") is False


def test_topk_per_group_generic(spark):
    df = spark.createDataFrame(
        [("g1", 3), ("g1", 1), ("g1", 2), ("g2", 9)], "g string, v int"
    )
    out = topk_per_group(df, ["g"], [F.col("v")], k=2)
    got = sorted((r.g, r.v, r.rn) for r in out.collect())
    assert got == [("g1", 1, 1), ("g1", 2, 2), ("g2", 9, 1)]


def test_with_login_flag(spark):
    from starbelly_spark.operators.frontier import with_login_flag

    fr = _frontier(
        spark,
        [("http://a.test/1", 1.0, False), ("http://b.test/2", 2.0, False)],
    )
    logins = spark.createDataFrame(
        [("a.test", "user", "pw")], "host string, user string, password string"
    )
    out = {r.host: r.needs_login for r in with_login_flag(fr, logins).collect()}
    assert out == {"a.test": True, "b.test": False}


def test_large_budget_topk_matches_small_path(spark):
    """The distributed large-k path (global_rank) must select exactly
    the same rows, with exactly the total-order ranks, as TakeOrdered +
    a local sort."""
    from starbelly_spark.operators.frontier import (
        drain_pending_unpersist,
        global_rank,
    )

    rows = [(f"http://h{i%9}.t/{i}", float(i % 13), False) for i in range(3000)]
    fr = _frontier(spark, rows).withColumn("_tb", F.col("url_hash_hex"))
    small = [r.url for r in fr.orderBy("cost", "_tb").limit(1000).collect()]
    ranked, total = global_rank(fr, ["cost", "_tb"], "_grank")
    assert total == 3000
    got = ranked.where(F.col("_grank") <= 1000).orderBy("_grank").collect()
    assert [r.url for r in got] == small
    assert [r["_grank"] for r in got] == list(range(1, 1001))
    drain_pending_unpersist()


def test_pop_rank_is_sequence_order(spark):
    """with_rank: the pop rank must equal the (cost, tie) position on
    BOTH physical paths (small TakeOrdered / large distributed)."""
    from starbelly_spark.operators.frontier import (
        POP_RANK,
        drain_pending_unpersist,
    )

    rows = [(f"http://h{i%7}.t/{i}", float(i % 5), False) for i in range(800)]
    fr = _frontier(spark, rows)
    want = [
        r.url
        for r in fr.withColumn("_tb", F.col("url_hash_hex"))
        .orderBy("cost", "_tb").limit(300).collect()
    ]
    small = pop_batch(fr, 300, per_host_k=10**6, with_rank=True)
    got_small = small.orderBy(POP_RANK).collect()
    assert [r.url for r in got_small] == want
    assert [r[POP_RANK] for r in got_small] == list(range(1, 301))
    # large path: force it by dropping the budget threshold via big k
    large = pop_batch(fr, 60_000, per_host_k=10**6, with_rank=True)
    got_large = large.orderBy(POP_RANK).limit(300).collect()
    assert [r.url for r in got_large] == want
    drain_pending_unpersist()


def test_pop_prefilter_exact_and_fallback(spark, monkeypatch):
    """The cost-cutoff pre-filter must never change WHICH rows pop or
    their ranks — including the pathological-skew fallback where the
    cheap rows all sit on one per-host-capped host."""
    import starbelly_spark.operators.frontier as fr

    def pop_urls(frontier, budget, k):
        out = pop_batch(frontier, budget, per_host_k=k, with_rank=True)
        got = out.orderBy(fr.POP_RANK).collect()
        fr.drain_pending_unpersist()
        return [(r.url, r[fr.POP_RANK]) for r in got]

    # normal shape: many hosts, smooth costs
    rows = [(f"http://h{i % 40}.t/{i}", float(i % 97), False)
            for i in range(4000)]
    frontier = _frontier(spark, rows)
    monkeypatch.setattr(fr, "PREFILTER_MIN_ROWS", 10)
    fast = pop_urls(frontier, 60, 5)
    monkeypatch.setattr(fr, "PREFILTER_MIN_ROWS", 10**12)  # disable
    slow = pop_urls(frontier, 60, 5)
    assert fast == slow and len(fast) == 60

    # skew pathology: ALL cheap rows on one host, per_host_k=1 → the
    # filtered survivor set can't fill the budget → exact fallback
    rows = ([(f"http://hot.t/{i}", 0.0 + i * 1e-6, False)
             for i in range(3000)]
            + [(f"http://h{i % 20}.t/x{i}", 1000.0 + i, False)
               for i in range(1000)])
    frontier = _frontier(spark, rows)
    monkeypatch.setattr(fr, "PREFILTER_MIN_ROWS", 10)
    fast = pop_urls(frontier, 21, 1)
    monkeypatch.setattr(fr, "PREFILTER_MIN_ROWS", 10**12)
    slow = pop_urls(frontier, 21, 1)
    assert fast == slow and len(fast) == 21
    # 1 from the hot host + 20 cold hosts
    assert sum(1 for u, _ in fast if u.startswith("http://hot")) == 1


def test_prefilter_decision_boundary():
    """r4 (verdict #9): the engage/fallback thresholds live in ONE
    decision function; at the default constants the worth-checking
    boundary coincides exactly with the small/large budget-cut split
    (SMALL_BUDGET_ROWS)."""
    import starbelly_spark.operators.frontier as fr

    # below the split: never worth probing the frontier size
    worth, target, floor = fr.prefilter_decision(fr.SMALL_BUDGET_ROWS - 1)
    assert not worth
    # at the split: probe engages, floor = ratio × slack × budget
    worth, target, floor = fr.prefilter_decision(fr.SMALL_BUDGET_ROWS)
    assert worth
    assert target == int(fr.PREFILTER_SLACK * fr.SMALL_BUDGET_ROWS)
    assert floor == fr.PREFILTER_RATIO * target \
        == fr.PREFILTER_RATIO \
        * int(fr.PREFILTER_SLACK * fr.SMALL_BUDGET_ROWS)
    # the documented identity that lets one constant express both
    # decisions: slack × small-budget == historical MIN_ROWS floor
    assert int(fr.PREFILTER_SLACK * fr.SMALL_BUDGET_ROWS) \
        == fr.PREFILTER_MIN_ROWS
    # floor never drops below MIN_ROWS even for mid-size budgets
    assert fr.prefilter_decision(50)[2] >= fr.PREFILTER_MIN_ROWS
