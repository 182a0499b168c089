"""Batch table loaders for the driver's parquet testdata (TESTDATA.md).

At 100 TB these would be partitioned table roots; ``spark.read.parquet``
keeps predicate pushdown + column pruning (verify via ``PushedFilters`` /
``ReadSchema`` in the formatted plan — see ``plans.inspect``).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

# Fingerprint-keyed LOADER memo (r14 schema memo, widened r15): a
# bench/oracle session calls ``load_table`` thousands of times over the same
# few immutable files, and every bare ``spark.read.parquet`` re-infers the
# schema (driver-side footer read + file listing, 75-97 ms) while even a
# schema-supplied read still pays ~10-15 ms of py4j/analysis chatter per
# call.  A DataFrame is an immutable logical plan — handing the SAME plan
# object to every caller is semantically identical to rebuilding it (every
# execution still scans parquet; transformations derive new frames), so the
# memo stores the fully-normalized DataFrame per (sf_dir, table,
# max-mtime+bytes fingerprint).  This is metadata, never data: a rewritten
# fixture at the same path changes the fingerprint and misses; an
# unfingerprintable path degrades to plain inference.
#
# Keying (r14 VERDICT "what's wrong" #2): entries hang off the SparkSession
# itself via a WeakKeyDictionary — a plan built under one session's conf
# can never leak into another session (CPython id() recycling made the old
# ``id(spark)`` key theoretically collidable), and a dead session's frames
# are dropped with it instead of pinning JVM-side plan handles.
_SESSION_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _session_state(spark: SparkSession) -> dict:
    st = _SESSION_MEMO.get(spark)
    if st is None:
        st = {"nanos_conf_set": False, "dfs": {}}
        _SESSION_MEMO[spark] = st
    return st


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts has drifted across driver fixture generations:
    #   * TIMESTAMP(NANOS) → (with nanosAsLong=true) a long of epoch-nanos;
    #   * timestamp[us] with no tz → Spark 4 reads TIMESTAMP_NTZ, which
    #     unix_micros / withWatermark / window() reject.
    # Normalize both to session-local TimestampType in this one choke point
    # so every downstream date_trunc/to_date/watermark call site is stable.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.to_timestamp(F.col("ts")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..operators._memo import table_fingerprint

    st = _session_state(spark)
    # Must hold for ANY caller-provided session (the driver builds its own):
    # events.ts is parquet TIMESTAMP(NANOS), unreadable by Spark 4 without
    # this runtime conf.  Set once per session — the conf is never unset by
    # the engine, and a memoized frame's scan fails at read time exactly
    # like a fresh one would if a caller force-disabled it.
    if not st["nanos_conf_set"]:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        st["nanos_conf_set"] = True
    try:
        key = (sf_dir, name, table_fingerprint(sf_dir, name))
    except Exception:
        return _load_uncached(spark, sf_dir, name)
    df = st["dfs"].get(key)
    if df is None:
        df = _load_uncached(spark, sf_dir, name)
        if len(st["dfs"]) > 256:  # bound: a few fixtures x tables
            st["dfs"].clear()
        st["dfs"][key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each testdata table as a temp view for ``spark.sql`` queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
