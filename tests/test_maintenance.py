"""storage.maintenance.run_maintenance — the scheduled chores entry point
(repair + TTL + per-partition compaction for partitioned tables; OPTIMIZE +
VACUUM for txlog tables) composed from already-tested primitives."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
    hourly_rollup_aggregate,
)
from realtime_analytics_with_kafka_clickhouse_spark.sources.generator import (
    generate_orders,
)
from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog
from realtime_analytics_with_kafka_clickhouse_spark.storage.layout import (
    read_orders_table,
    write_orders_table,
)
from realtime_analytics_with_kafka_clickhouse_spark.storage.maintenance import (
    run_maintenance,
)

from conftest import SF_DIR


def test_maintenance_partitioned_ttl_and_compaction(spark, tmp_path):
    orders = generate_orders(spark, 2000, seed=42)
    path = str(tmp_path / "orders_table")
    write_orders_table(orders, path)
    cutoff = "2026-02-10 00:00:00"
    report = run_maintenance(spark, path, kind="partitioned", ttl_cutoff=cutoff)
    assert report["kind"] == "partitioned"
    assert any(t.startswith("dropped:") for t in report["ttl"])
    # every surviving month partition got a compaction pass
    assert report["compacted_files"]
    assert all(n >= 1 for n in report["compacted_files"].values())
    survived = read_orders_table(spark, path)
    assert (
        survived.filter(
            F.col("order_timestamp") < F.lit(cutoff).cast("timestamp")
        ).count()
        == 0
    )
    expected = orders.filter(
        F.col("order_timestamp") >= F.lit(cutoff).cast("timestamp")
    ).count()
    assert survived.count() == expected
    # idempotent: a second pass with the same cutoff changes nothing
    report2 = run_maintenance(spark, path, kind="partitioned", ttl_cutoff=cutoff)
    assert not any(t.startswith("dropped:") for t in report2.get("ttl", []))
    assert read_orders_table(spark, path).count() == expected


def test_maintenance_txlog_optimize_and_vacuum(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").limit(2000)
    table = str(tmp_path / "events_tx")
    for i in range(3):  # append_tx: one data dir per epoch accumulates
        chunk = events.filter(F.pmod("event_id", F.lit(3)) == i)
        txlog.append_tx(spark, table, hourly_rollup_aggregate(chunk), batch_id=i)
    before = sorted(map(tuple, txlog.read_table(spark, table).collect()))
    report = run_maintenance(spark, table, kind="txlog", retention_ms=0)
    assert report["compacted"] is True
    assert report["vacuumed"], "old versions' data must be collected"
    # exactly one live data dir after OPTIMIZE + VACUUM, content unchanged
    _, commit = txlog.snapshot(spark, table)
    assert len(commit["dirs"]) == 1
    assert sorted(map(tuple, txlog.read_table(spark, table).collect())) == before


def test_expire_ttl_group_by_conserves_measures(spark, tmp_path):
    """Rollup TTL: expired months collapse to one row per key with the
    summed measures EXACTLY conserved; the boundary month keeps its
    surviving rows untouched; schema unchanged."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage.layout import (
        expire_ttl_group_by,
        write_orders_table,
    )

    orders = generate_orders(spark, 5000, seed=7)
    path = str(tmp_path / "orders")
    write_orders_table(orders, path)
    before = spark.read.parquet(path)
    months = sorted(
        r["order_month"] for r in before.select("order_month").distinct().collect()
    )
    assert len(months) >= 2
    # cutoff mid-second-month: month[0] fully expired, month[1] boundary
    cutoff = f"{months[1] // 100}-{months[1] % 100:02d}-15 00:00:00"
    pre_total = before.groupBy().agg(F.sum(F.col("total_amount").cast("decimal(25,6)"))).collect()[0][0]
    pre_qty = before.groupBy().agg(F.sum("quantity")).collect()[0][0]
    pre_n = before.count()
    # Materialize the expected surviving suffix BEFORE the mutation — the
    # lazy `before` frame's file index goes stale once partitions swap.
    surv_expected = sorted(
        map(
            tuple,
            before.filter(
                (F.col("order_month") == months[1])
                & (F.col("order_timestamp") >= F.lit(cutoff).cast("timestamp"))
            ).collect(),
        )
    )

    touched = expire_ttl_group_by(
        spark, path, cutoff, keys=["order_status"],
        sum_cols=["total_amount", "quantity"],
    )
    assert any(t.startswith("collapsed:") for t in touched)
    after = spark.read.parquet(path)
    assert set(after.columns) == set(before.columns)
    assert after.count() < pre_n  # detail collapsed
    post_total = after.groupBy().agg(F.sum(F.col("total_amount").cast("decimal(25,6)"))).collect()[0][0]
    post_qty = after.groupBy().agg(F.sum("quantity")).collect()[0][0]
    assert post_total == pre_total and post_qty == pre_qty
    # fully-expired month: exactly one row per status key
    m0 = after.filter(F.col("order_month") == months[0])
    assert m0.count() == m0.select("order_status").distinct().count()
    # surviving suffix of the boundary month is row-for-row intact
    surv_after = sorted(
        map(
            tuple,
            after.filter(
                (F.col("order_month") == months[1])
                & (F.col("order_timestamp") >= F.lit(cutoff).cast("timestamp"))
            ).collect(),
        )
    )
    assert surv_after == surv_expected
