"""Property-based tests (hypothesis): the determinism and equivalence
invariants the engine's correctness story rests on, checked over random
inputs rather than fixtures."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.functions.scalars import dsum
from realtime_analytics_with_kafka_clickhouse_spark.storage.bucketing import salted_join

MONEY = st.decimals(
    min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"), places=2
).map(float)


@settings(max_examples=8, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=60), st.sampled_from([1, 3, 7]))
def test_dsum_is_partition_order_invariant(spark, values, nparts):
    """dsum == exact Decimal sum regardless of how rows are partitioned —
    the invariant that makes 32-core Spark hash-match a serial oracle."""
    df = spark.createDataFrame([(v,) for v in values], ["v"]).repartition(nparts)
    got = df.agg(dsum("v").alias("s")).collect()[0]["s"]
    want = float(sum(Decimal(f"{v:.2f}") for v in values))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=40),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=10),
    st.sampled_from([2, 4, 8]),
)
def test_salted_join_equals_plain_join(spark, left_rows, right_rows, n_salts):
    """Salting is a physical rewrite only: result multiset identical."""
    left = spark.createDataFrame(left_rows or [(99, 0)], ["k", "a"])
    right = spark.createDataFrame(right_rows or [(98, 0)], ["k2", "b"])
    plain = left.join(right, left.k == right.k2).select("k", "a", "k2", "b")
    salted = salted_join(left, right, "k", "k2", n_salts=n_salts).select("k", "a", "k2", "b")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def _sessions_reference(ts_list, gap_sec):
    """Brute-force session splitter: sorted event times -> session sizes."""
    out, cur = [], []
    for t in sorted(ts_list):
        if cur and (t - cur[-1]).total_seconds() > gap_sec:
            out.append(cur)
            cur = []
        cur.append(t)
    if cur:
        out.append(cur)
    return sorted((min(s), max(s), len(s)) for s in out)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(0, 6 * 3600).map(lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_sessionization_matches_reference_splitter(spark, ts_list):
    """The lag/cumsum sessionization equals the brute-force gap splitter
    for a single user over arbitrary event times (gap = 30 min)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        SESSION_GAP_SEC,
    )
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, t, 1, 1.0) for i, t in enumerate(ts_list)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col("ts")) - prev) > SESSION_GAP_SEC * 1_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = df.withColumn("sid", F.sum(is_new).over(run))
    got = sorted(
        (r["mn"], r["mx"], r["n"])
        for r in sess.groupBy("sid")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    assert got == _sessions_reference(ts_list, SESSION_GAP_SEC)


def _loop_session_fold(ts_us, vals, state, gap_us):
    """The obvious per-event reference fold the vectorized
    _fold_session_segments must match exactly."""
    out = []
    if state is None:
        start = None
    else:
        start, last, n, revenue = state
    for t, v in zip(ts_us, vals):
        t, v = int(t), float(v)
        if start is None:
            start, last, n, revenue = t, t, 1, v
        elif t - last > gap_us:
            out.append((start, last, n, revenue))
            start, last, n, revenue = t, t, 1, v
        else:
            start = min(start, t)
            last, n, revenue = max(last, t), n + 1, revenue + v
    return out, (start, last, n, revenue)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=25),
    st.one_of(st.none(), st.tuples(st.integers(0, 20), st.integers(0, 40))),
)
def test_vectorized_session_fold_matches_loop(gaps, carried):
    """The numpy segment fold inside streaming_sessionize equals the
    per-event loop on every input: arbitrary inter-event gaps (some past
    the session gap), with and without a carried open session, including
    cross-batch late arrivals (batch rows at/below the carried end)."""
    import numpy as np

    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        _fold_session_segments,
    )

    gap_us = 10  # tiny gap threshold; gaps of 11+ split sessions
    ts = np.cumsum(np.array(gaps, dtype=np.int64))
    vals = np.array([float(i + 1) for i in range(len(ts))])
    state = None
    if carried is not None:
        s_start, s_last = sorted(carried)
        state = (int(s_start), int(s_last), 2, 5.0)
    got = _fold_session_segments(ts, vals, state, gap_us)
    want = _loop_session_fold(ts, vals, state, gap_us)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 3), st.integers(0, 99)),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.permutations(list(range(3))),
)
def test_replacing_merge_epoch_order_invariant(spark, tmp_path_factory, rows, epoch_order):
    """ReplacingMergeTree fold: for ANY (key, version, payload) set split
    into epochs replayed in ANY order, the final table is the per-key
    max-version row — associativity/idempotence over random inputs."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_replacing,
    )

    table = str(tmp_path_factory.mktemp("replacing") / "t")
    df = spark.createDataFrame(rows, "k long, version long, payload long")
    for i in epoch_order:
        batch = df.filter((F.col("k") + F.col("version")) % 3 == i)
        merge_replacing(spark, table, batch, key="k", version="version")
    got = sorted(map(tuple, spark.read.parquet(table).select("k", "version", "payload").collect()))
    want = {}
    for k, v, p in rows:
        if (k, v, p) and (k not in want or v > want[k][1]):
            want[k] = (k, v, p)
    assert got == sorted(want.values())


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from([1, -1])),
        min_size=1,
        max_size=30,
    ),
    st.permutations(list(range(3))),
)
def test_collapsing_merge_epoch_order_invariant(spark, tmp_path_factory, rows, epoch_order):
    """Collapsing fold: any sign multiset split into epochs replayed in any
    order nets to the same per-key sign sum, with net-zero keys dropped."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_collapsing,
    )

    table = str(tmp_path_factory.mktemp("collapsing") / "t")
    indexed = [(k, s, i) for i, (k, s) in enumerate(rows)]
    df = spark.createDataFrame(indexed, "k long, sign long, i long")
    for e in epoch_order:
        merge_collapsing(spark, table, df.filter(F.col("i") % 3 == e).drop("i"), keys=["k"])
    got = sorted(map(tuple, spark.read.parquet(table).select("k", "sign").collect()))
    want = {}
    for k, s in rows:
        want[k] = want.get(k, 0) + s
    assert got == sorted((k, v) for k, v in want.items() if v != 0)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 3), st.sampled_from([1, -1])),
        min_size=1,
        max_size=30,
    ),
    st.permutations(list(range(3))),
)
def test_versioned_collapsing_epoch_order_invariant(
    spark, tmp_path_factory, rows, epoch_order
):
    """VersionedCollapsing fold: any (key, version, sign) multiset split
    into epochs replayed in ANY order nets to the same per-(key, version)
    sign sum, net-zero pairs dropped — the per-version matching that
    makes out-of-order cancels safe, over random inputs."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_versioned_collapsing,
    )

    table = str(tmp_path_factory.mktemp("vcollapsing") / "t")
    indexed = [(k, v, s, i) for i, (k, v, s) in enumerate(rows)]
    df = spark.createDataFrame(indexed, "k long, version long, sign long, i long")
    for e in epoch_order:
        merge_versioned_collapsing(
            spark, table, df.filter(F.col("i") % 3 == e).drop("i"), keys=["k"]
        )
    got = sorted(
        map(tuple, spark.read.parquet(table).select("k", "version", "sign").collect())
    )
    want: dict = {}
    for k, v, s in rows:
        want[(k, v)] = want.get((k, v), 0) + s
    assert got == sorted((k, v, s) for (k, v), s in want.items() if s != 0)
