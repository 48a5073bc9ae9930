"""Physical-plan regression gates: predicate pushdown reaches parquet,
small dimensions broadcast, hot expressions stay in codegen, and the
frontier pop never scans columns it doesn't need."""

import __spark_entry__ as entrymod
from starbelly_spark.plans import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    wholestage_codegen_count,
)


def test_range_predicate_pushes_down(spark, sf_dir):
    df = entrymod.q_p4_range_predicate(spark, sf_dir)
    assert has_pushed_filters(df, "l_shipdate")


def test_equality_filter_pushes_down(spark, sf_dir):
    df = entrymod.q_p5_boolean_filter(spark, sf_dir)
    # OR-of-ANDs still yields an Or pushed filter on parquet
    assert has_pushed_filters(df)


def test_dimension_joins_broadcast(spark, sf_dir):
    df = entrymod.q_j5_broadcast_lookup(spark, sf_dir)
    assert has_broadcast_join(df)


def test_tpch_q3_broadcasts_small_side(spark, sf_dir):
    # AQE/static planner should broadcast customer (1.5k rows) rather
    # than sort-merge everything
    df = entrymod.q_tpch_q3_shipping(spark, sf_dir)
    assert has_broadcast_join(df)


def test_q1_jvm_side_with_map_side_combine(spark, sf_dir):
    df = entrymod.q_tpch_q1_pricing(spark, sf_dir)
    plan = formatted_plan(df)
    # pure column expressions: no python evaluation anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation before the exchange = map-side combine (the
    # thing that keeps this shuffle small at 100 TB)
    # (the formatted plan numbers HashAggregate(partial_*) before the
    # Exchange operator — presence of partial_sum is the evidence)
    assert "partial_sum" in plan


def test_scan_prunes_columns(spark, sf_dir):
    df = entrymod.q_p4_range_predicate(spark, sf_dir)
    plan = formatted_plan(df)
    # ReadSchema on lineitem must include only the 3 needed columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_returnflag", "l_quantity", "l_shipdate"}


def test_text_exprs_are_jvm_side(spark, sf_dir):
    # lang-id / token counts compile to JVM expressions, not UDFs
    df = entrymod.q_text_lang_id(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robots_decision_is_projection_not_window(spark):
    """Round-2 plan shape: the robots decision must be a broadcast
    rule-array join + higher-order filter projection — NO Window (the
    old per-(link × rule) window sort was the lineage-stage hotspot)."""
    from starbelly_spark.policy import Policy
    from starbelly_spark.robots import apply_robots

    rules = spark.createDataFrame(
        [("a.test", "*", "/x", False, None)],
        "host string, user_agent string, path_prefix string, "
        "allow boolean, crawl_delay double",
    )
    links = spark.createDataFrame(
        [("http://a.test/x/1", "a.test"), ("http://a.test/y", "a.test")],
        "url string, host string",
    )
    df = apply_robots(links, rules, Policy())
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert [r.url for r in df.collect()] == ["http://a.test/y"]


def test_first_parent_dedup_is_partial_hash_agg(spark):
    """Round-2 plan shape: first-parent dedup is min(struct) with
    MAP-SIDE partial aggregation (pre-shuffle combine), not a window
    sort."""
    from pyspark.sql import functions as F

    links = spark.createDataFrame(
        [("u1", 1, 0, "h", b"\x01", 1.0), ("u1", 2, 0, "h", b"\x01", 2.0),
         ("u2", 1, 1, "h", b"\x02", 1.0)],
        "url string, parent_seq long, pos int, host string, "
        "url_hash binary, cost double",
    )
    dedup = (
        links.groupBy("url")
        .agg(F.min(F.struct("parent_seq", "pos", "host", "url_hash",
                            "cost")).alias("_first"))
        .select("url", "_first.cost")
    )
    plan = formatted_plan(dedup)
    assert "partial_min" in plan and "Window" not in plan
    got = {r.url: r.cost for r in dedup.collect()}
    assert got == {"u1": 1.0, "u2": 1.0}


def test_exact_jaccard_pairs_is_jvm_side(spark):
    """The recall-gate ground truth must stay out of Python: shingle
    explode + equi-join + hash agg, all JVM."""
    from starbelly_spark.operators.dedup import exact_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    df = exact_jaccard_pairs(docs, 0.1, shingle_n=2)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_politeness_update_has_no_python_udf_after_fetch(spark):
    """r4 (verdict #4): `host` rides through the fetch kernel as a
    passthrough column, so the politeness update plan contains exactly
    ONE Python-eval stage — the fetch itself (mapInPandas) — and no
    second host_udf pass between the fetch and the per-host agg."""
    from pyspark.sql import functions as F

    from starbelly_spark.politeness import politeness_updates
    from starbelly_spark.sources.synthetic_web import (
        WebConfig,
        fetch_schema_with,
        make_fetch_batches,
    )

    web = WebConfig(n_hosts=3, total_pages=20, branching=2, seed=1)
    popped = spark.createDataFrame(
        [(u, f"h{i % 3}.example") for i, u in
         enumerate(f"http://h{i % 3}.example/p{i}" for i in range(6))],
        "url string, host string",
    )
    fetched = popped.mapInPandas(
        make_fetch_batches(web, passthrough=("host",)),
        schema=fetch_schema_with("host string"),
    )
    completions = fetched.select(
        "host", (F.col("latency_ms") / 1000.0).alias("completion_ts")
    )
    pol = politeness_updates(completions, None, None, global_delay=1.0,
                             obey_crawl_delay=False)
    plan = formatted_plan(pol)
    # exactly one python stage: the fetch kernel (MapInPandas); the
    # host column is never recomputed by a row-wise python UDF.
    # (formatted plans print each node twice — tree + detail — so
    # count the tree form "MapInPandas (<id>")
    assert plan.count("MapInPandas (") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # and the per-host max is map-side combined (partial agg)
    assert "partial_max" in plan or "partial_finalmerge" in plan, plan
