"""Storage layout (partitioned+sorted writes, TTL) and the Structured
Streaming foreachBatch-MERGE pipeline (incremental == batch, SURVEY.md §5.4)."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.sources.generator import generate_orders
from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
from realtime_analytics_with_kafka_clickhouse_spark.storage import (
    expire_ttl,
    read_orders_table,
    write_orders_table,
)
from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
    hourly_rollup_aggregate,
    run_file_stream_pipeline,
)

from tests.conftest import SF_DIR


def test_partitioned_sorted_write_and_prune(spark):
    orders = generate_orders(spark, 2000, seed=42)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_table"
        write_orders_table(orders, path)
        part_dirs = sorted(p.name for p in Path(path).glob("order_month=*"))
        assert len(part_dirs) >= 2, part_dirs
        back = read_orders_table(spark, path)
        assert back.count() == 2000
        # partition pruning: a month predicate must hit only that partition
        one_month = back.filter(F.col("order_month") == 202601)
        plan = one_month._jdf.queryExecution().executedPlan().toString()
        assert "order_month" in plan
        assert one_month.count() == read_orders_table(spark, path).filter(
            F.date_format("order_timestamp", "yyyyMM") == "202601"
        ).count()


def test_ttl_expiry_partition_drop_and_boundary_rewrite(spark):
    orders = generate_orders(spark, 2000, seed=42)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_table"
        write_orders_table(orders, path)
        total = read_orders_table(spark, path).count()
        cutoff = "2026-02-10 00:00:00"
        touched = expire_ttl(spark, path, cutoff)
        assert any(t.startswith("dropped:") for t in touched)
        assert any(t.startswith("rewrote:") for t in touched)
        survived = read_orders_table(spark, path)
        assert survived.filter(F.col("order_timestamp") < F.lit(cutoff).cast("timestamp")).count() == 0
        kept_expected = orders.filter(F.col("order_timestamp") >= F.lit(cutoff).cast("timestamp")).count()
        assert survived.count() == kept_expected < total


def test_file_stream_incremental_equals_batch(spark):
    """The M5 pin: N micro-batches through foreachBatch MERGE == one-shot
    batch aggregation, with out-of-order event times across batches."""
    events = load_table(spark, SF_DIR, "events")
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/incoming"
        # 3 chunk files, interleaved in time (event_id mod 3): every chunk
        # carries events 'late' relative to the previous chunk's max ts.
        for i in range(3):
            events.filter(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        run_file_stream_pipeline(
            spark,
            source_dir=src,
            schema=events.schema,
            raw_dir=f"{d}/raw",
            rollup_dir=f"{d}/rollup",
            checkpoint_dir=f"{d}/ckpt",
        )
        raw = spark.read.parquet(f"{d}/raw")
        assert raw.count() == events.count()  # conservation: count in == stored
        got = spark.read.parquet(f"{d}/rollup")
        want = hourly_rollup_aggregate(events)
        diff = got.exceptAll(want).count() + want.exceptAll(got).count()
        assert diff == 0
