"""Plan-inspection helpers: assert the physical plan is the one you'd
want at 100 TB (pushdown reached the scan, the small side broadcast,
codegen wasn't broken by a stray Python UDF)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    # explainString takes an ExplainMode object, not a plain string
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in formatted_plan(df).replace("PushedFilters: []", "")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def python_eval_nodes(df: DataFrame) -> int:
    plan = physical_plan(df)
    return sum(
        plan.count(node)
        for node in (
            "ArrowEvalPython",
            "BatchEvalPython",
            "MapInPandas",
            "MapInArrow",  # substring also matches PythonMapInArrowExec
            "FlatMapGroupsInPandas",  # applyInPandas
            "FlatMapCoGroupsInPandas",  # cogrouped applyInPandas
        )
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines from the formatted plan — verify column pruning."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


def has_partition_filters(df: DataFrame) -> bool:
    """True iff the scan carries a non-empty PartitionFilters list —
    i.e. partition pruning will skip directories, the difference between
    reading one partition and reading 100 TB."""
    plan = formatted_plan(df).replace("PartitionFilters: []", "")
    return "PartitionFilters: [" in plan


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the physical plan.  The
    at-scale currency: a bucketed/co-partitioned join should show 0
    before the join, a plain SMJ shows 2."""
    plan = physical_plan(df)
    # count shuffle exchanges only, not BroadcastExchange
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange " in line and "BroadcastExchange" not in line
    )
