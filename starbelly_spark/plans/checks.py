"""Plan assertions: verify that filters reach the parquet scan, small
dims broadcast, and expressions stay inside whole-stage codegen.

Used by tests/test_plans.py so plan regressions (a filter that stops
pushing down, a broadcast that silently becomes a sort-merge join)
fail CI rather than silently costing 100× at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what .explain prints)."""
    qe = df._jdf.queryExecution()
    try:
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
    except Exception:  # pragma: no cover - older explain API fallback
        return qe.toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def has_pushed_filters(df: DataFrame, needle: str | None = None) -> bool:
    filters = pushed_filters(df)
    if needle is None:
        return bool(filters)
    return any(needle in f for f in filters)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def wholestage_codegen_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", formatted_plan(df)))
