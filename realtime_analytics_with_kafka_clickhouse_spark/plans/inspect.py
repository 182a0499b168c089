"""Physical-plan inspection (SURVEY.md §4 — "optimize for scale, concretely").

The scale contract every operator must hold is *visible in the plan*:
filters reach the scan (``PushedFilters``), projections prune the read
schema (``ReadSchema``), small dimensions broadcast instead of shuffling,
and shuffle count stays at the algorithmic minimum.  These helpers turn
those properties into assertable strings for tests (tests/test_plans.py),
so a regression that, say, un-broadcasts a dimension join fails CI instead
of melting a 1000-executor cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.split(",") if c.strip()}
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Exchange operators in the optimized physical plan (before AQE runtime
    coalescing; broadcast exchanges excluded)."""
    plan = formatted_plan(df)
    # formatted mode prints shuffle nodes as "(N) Exchange" (broadcast
    # exchanges print as "(N) BroadcastExchange" and are excluded).
    return len(re.findall(r"\(\d+\) Exchange\b", plan))
