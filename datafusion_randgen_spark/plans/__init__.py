"""Plan-inspection helpers: assert the physical plan is the one you'd
want at 100 TB (pushdown reached the scan, the small side broadcast,
codegen wasn't broken by a stray Python UDF)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString("formatted")


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in formatted_plan(df).replace("PushedFilters: []", "")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def python_eval_nodes(df: DataFrame) -> int:
    plan = physical_plan(df)
    return plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") + plan.count("MapInPandas")


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines from the formatted plan — verify column pruning."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema:" in line
    ]
