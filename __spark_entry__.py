"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (hourly category rollup — the A1
materialized-view analog, SURVEY.md §7-M1) on sf0.001.  ``queries()`` maps
every implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql()`` carries the DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_analytics_with_kafka_clickhouse_spark.operators import registry as _registry
from realtime_analytics_with_kafka_clickhouse_spark.oracle import ORACLE as _ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.rollups import (
        hourly_category_rollup,
    )

    return hourly_category_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry())


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return dict(_ORACLE)
