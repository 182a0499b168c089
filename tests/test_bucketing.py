"""Shuffle-elimination levers: bucketed co-located joins (zero Exchange)
and skew-salted joins (identical results, spread hot keys)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.plans.inspect import count_shuffles
from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
from realtime_analytics_with_kafka_clickhouse_spark.storage.bucketing import (
    bucketed_join,
    salted_join,
    write_bucketed,
)

from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    with tempfile.TemporaryDirectory() as d:
        write_bucketed(orders, "b_orders", "o_orderkey", 8, path=f"{d}/orders")
        write_bucketed(li, "b_lineitem", "l_orderkey", 8, path=f"{d}/lineitem")
        try:
            joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
            # The whole point: both sides read pre-bucketed, so the
            # sort-merge join plans with ZERO Exchange.  The same join shape
            # over plain parquet (merge hint = what a fact-fact join does at
            # scale, where neither side broadcasts) shuffles both sides.
            assert count_shuffles(joined) == 0
            plain = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
            assert count_shuffles(plain) >= 2
            assert joined.count() == plain.count()
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_topk_equals_windowed_topk(spark):
    """Two-phase salted top-k returns exactly the windowed top-k (per brand,
    by price desc with partkey tiebreak), while never sorting a whole group
    on one reducer."""
    from pyspark.sql import Window

    from realtime_analytics_with_kafka_clickhouse_spark.storage.bucketing import (
        salted_topk_per_group,
    )

    part = load_table(spark, SF_DIR, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    want = (
        part.withColumn("rank_in_group", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_group") <= 3)
        .select("p_brand", "p_partkey", "rank_in_group")
    )
    got = salted_topk_per_group(
        part, ["p_brand"], "p_retailprice", 3, tiebreak_col="p_partkey", n_salts=8
    ).select("p_brand", "p_partkey", "rank_in_group")
    assert sorted(map(tuple, want.collect())) == sorted(map(tuple, got.collect()))


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # A pathologically hot key: 10k rows on one key vs 10 on others.
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(10).select((F.col("id") + 2).alias("k"), F.col("id").alias("payload"))
    large = hot.union(cold)
    small = spark.range(12).select(F.col("id").alias("k"), F.col("id").alias("v"))
    out = salted_join(large, small, "k", "k", n_salts=8)
    assert out.count() == 10_000 + 10  # exact join semantics preserved
    # The salt column spreads the hot key across all 8 sub-keys.
    salts = (
        large.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(8)))
        .filter(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8
