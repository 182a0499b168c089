"""Round-11 additions: the runtime (AQE) broadcast gate for derived
frames, the enforced request-size collect cap, and the integer-micros
distinct-avg output."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from realtime_analytics_with_kafka_clickhouse_spark.functions.hints import (
    collect_request_sized,
    runtime_broadcast,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_runtime_broadcast_attaches_no_hint(spark):
    # The whole point: NO static hint — the decision belongs to AQE.
    dim = spark.range(0, 50).withColumnRenamed("id", "k").groupBy("k").count()
    gated = runtime_broadcast(dim)
    analyzed = gated._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    assert gated is dim  # zero-job, zero-copy


def test_runtime_broadcast_aqe_converts_smj(spark):
    """With the static threshold off and the adaptive threshold on, a
    small agg-derived frame joined without any hint must come out of
    execution as a broadcast-hash join — AQE measured the actual
    post-shuffle size and converted.  This is the mechanism the dedup/ANN
    derived-frame call sites rely on instead of a limit-probe."""
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        left = spark.range(0, 10000).withColumnRenamed("id", "k")
        dim = (
            spark.range(0, 200)
            .withColumnRenamed("id", "k")
            .groupBy("k")
            .count()
        )
        joined = left.join(runtime_broadcast(dim), "k")
        # collect() (not count()) so the final adaptive plan lands on THIS
        # DataFrame's queryExecution
        assert len(joined.collect()) == 200
        executed = (
            joined._jdf.queryExecution().executedPlan().toString()
        ).split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in executed, executed
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_collect_request_sized_under_cap_returns_all(spark):
    rows = collect_request_sized(spark.range(0, 10), cap=10)
    assert sorted(r["id"] for r in rows) == list(range(10))


def test_collect_request_sized_oversized_raises(spark):
    with pytest.raises(ValueError, match="request-size premise"):
        collect_request_sized(spark.range(0, 11), cap=10, what="test batch")


def test_collect_request_sized_rejects_bad_cap(spark):
    with pytest.raises(ValueError):
        collect_request_sized(spark.range(1), cap=0)


def test_distinct_agg_battery_integer_avg(spark, queries):
    """avg_micros is exact round-half-up integer micros of the distinct
    mean — recomputed here independently from the collected distinct
    sets (the r10/r9 gate reds were engine-evaluated doubles; the output
    must stay integer end-to-end)."""
    df = queries["distinct_agg_battery"](spark, SF_DIR)
    assert dict(df.dtypes)["avg_micros"] == "bigint"
    rows = {r["event_type"]: r for r in df.collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from decimal import Decimal

    from pyspark.sql import functions as F

    per = (
        ev.select("event_type", F.col("value").cast("decimal(25,6)").alias("v"))
        .distinct()
        .groupBy("event_type")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    for r in per:
        s6 = int(r["s"] * Decimal(1_000_000))
        n = r["n"]
        expect = (2 * s6 + n) // (2 * n)
        got = rows[r["event_type"]]
        assert got["avg_micros"] == expect, (r["event_type"], expect, got)
        assert got["n_distinct_values"] == n
