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
