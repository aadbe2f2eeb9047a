"""Physical-plan inspection helpers.

Used by tests (and during development) to assert the plans we want at
scale actually got chosen: filters pushed to the parquet scan, small
sides broadcast, expressions inside whole-stage codegen.  This is the
engine's guard-rail against silent plan regressions — the 100 TB
story is only as good as the plan Catalyst picks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (more/wider = better)."""
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def assert_no_cartesian_without_broadcast(df: DataFrame) -> None:
    p = physical_plan(df)
    if "CartesianProduct" in p:
        raise AssertionError(
            "CartesianProduct in plan — expected a broadcast strategy:\n" + p
        )
