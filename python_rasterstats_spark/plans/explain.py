"""Plan-inspection helpers: assert the physical plan is the one we want
(broadcast where intended, filters pushed to the scan, codegen spans)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict:
    plan = physical_plan(df)
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "exchanges": plan.count("Exchange"),
        "wholestage_codegen": plan.count("WholeStageCodegen"),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "batch_scans": plan.count("Scan parquet"),
    }
