"""Plan-inspection helpers: assert the physical plan has the shape the
100 TB design requires (pushdown reached the scan, aggregation is
partial map-side, small sides broadcast, codegen spans the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side (partial) hash aggregation before the shuffle."""
    plan = physical_plan(df)
    return "partial_" in plan or "HashAggregate" in plan


def has_pushed_filters(df: DataFrame) -> bool:
    """Predicate pushdown reached the parquet scan."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema of the (first) file scan — verifies column pruning."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees, via codegen explain mode
    (AQE hides the markers from the non-final executedPlan string)."""
    s = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    return s.count("WholeStageCodegen subtree")
