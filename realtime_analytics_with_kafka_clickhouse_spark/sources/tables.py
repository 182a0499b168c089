"""Batch table loaders for the driver's parquet testdata (TESTDATA.md).

At 100 TB these would be partitioned table roots; ``spark.read.parquet``
keeps predicate pushdown + column pruning (verify via ``PushedFilters`` /
``ReadSchema`` in the formatted plan — see ``plans.inspect``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Must hold for ANY caller-provided session (the driver builds its own):
    # events.ts is parquet TIMESTAMP(NANOS), unreadable by Spark 4 without
    # this runtime conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong=true it surfaces as a long of
    # epoch-nanos.  Truncate to micros (matching DuckDB's ns->us read) and
    # restore TimestampType so downstream date_trunc/to_date work unchanged.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each testdata table as a temp view for ``spark.sql`` queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
