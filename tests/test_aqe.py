"""AQE runtime re-planning, proven on executed plans (SURVEY.md §4): the
two adaptive behaviors that matter at 100 TB — shuffle-partition coalescing
(map output much smaller than the static partition count) and skew-join
splitting (one hot key dominating a shuffle join) — asserted from the
final adaptive physical plan after an action, not from confs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only after execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_coalesces_shuffle_partitions(spark):
    # 32 static shuffle partitions over ~KB of map output: AQE must fuse
    # them into far fewer post-shuffle partitions via AQEShuffleRead.
    df = (
        spark.range(10_000)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    plan = _executed_plan(df)
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_aqe_splits_skewed_join(spark):
    # One key owns ~95% of the left side.  With thresholds lowered to
    # fixture scale, AQE must mark the sort-merge join partition as skewed
    # and split it (skew=true in the executed plan) — the runtime remedy
    # this engine relies on for hot keys it did NOT pre-salt
    # (storage.bucketing.salted_join covers the keys it did).
    conf = spark.conf
    old = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(500).select(F.col("id").alias("k"))
        # Downstream must NOT require the join's output partitioning: a
        # groupBy on the join key makes AQE skip the split (splitting would
        # force an extra shuffle; forceOptimizeSkewedJoin is off).  That
        # skip is itself a scale fact to remember: keyed consumers of a
        # skewed join need salting, AQE alone won't save them.
        joined = left.join(right, "k").agg(F.sum("payload").alias("s"))
        plan = _executed_plan(joined)
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            conf.set(k, v)
