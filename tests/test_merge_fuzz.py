"""Seeded randomized battery for the bucketed keyed-merge engine.

Complements the hypothesis property tests with the interaction surface
they don't reach: batch-id re-deliveries, caller-provided touched hints,
annihilation-to-empty, and empty epochs — all against a pure-python
model.  The seed is fixed so failures reproduce; the r6 session's free
fuzz of this space found the full-annihilation schema bug this way.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

import realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline as P


# Two bucket counts: the toy default and a derived-scale N (the
# O(batch · bucket_size) claim's precondition is that N grows with the
# table — derive_n_buckets — so the contract must be N-independent).
@pytest.mark.parametrize("n_buckets", [8, 64])
def test_versioned_merge_randomized_contract(spark, tmp_path, n_buckets):
    rng = random.Random(20260814)
    for trial in range(5):
        n = rng.randint(1, 40)
        rows = [
            (rng.randint(0, 5), rng.randint(1, 3), rng.choice([1, -1]))
            for _ in range(n)
        ]
        n_epochs = rng.randint(1, 5)
        use_bid = rng.random() < 0.5
        order = list(range(n_epochs))
        if not use_bid:
            rng.shuffle(order)  # out-of-order only WITHOUT ids (the contract)
        use_hint = rng.random() < 0.5
        table = os.path.join(tmp_path, f"t{trial}")
        idx = [(k, v, s, i) for i, (k, v, s) in enumerate(rows)]
        df = spark.createDataFrame(idx, "k long, version long, sign long, i long")
        em = None
        if use_hint:
            bcol = P._keyed_bucket(["k"], n_buckets)
            em = {
                r["e"]: r["bs"]
                for r in df.select(
                    (F.col("i") % n_epochs).alias("e"), bcol.alias("b")
                )
                .groupBy("e")
                .agg(F.collect_set("b").alias("bs"))
                .collect()
            }
        for e in order:
            deliveries = 1 + (use_bid and rng.random() < 0.5)
            for _ in range(deliveries):  # in-order + random re-delivery
                P.merge_versioned_collapsing(
                    spark,
                    table,
                    df.filter(F.col("i") % n_epochs == e).drop("i"),
                    keys=["k"],
                    batch_id=(e if use_bid else None),
                    n_buckets=n_buckets,
                    touched=(em.get(e, []) if use_hint else None),
                )
        got = sorted(
            map(
                tuple,
                spark.read.parquet(table).select("k", "version", "sign").collect(),
            )
        )
        want: dict = {}
        for k, v, s in rows:
            want[(k, v)] = want.get((k, v), 0) + s
        exp = sorted((k, v, s) for (k, v), s in want.items() if s != 0)
        assert got == exp, (
            f"trial {trial} bid={use_bid} hint={use_hint} order={order} rows={rows}"
        )
