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


def test_compact_dir_merges_small_files(spark, tmp_path):
    """Maintenance parity with MergeTree background merges: many small
    epoch files -> few target-size files, same rows, sorted within files."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage.layout import compact_dir

    orders = generate_orders(spark, 5000, seed=5)
    path = str(tmp_path / "frag")
    # Fragment: 20 separate small appends (the streaming-epoch pattern).
    for i in range(20):
        orders.filter(F.pmod(F.xxhash64("order_id"), F.lit(20)) == i).coalesce(
            2
        ).write.mode("append").parquet(path)
    n_before = len([p for p in Path(path).glob("*.parquet")])
    total = spark.read.parquet(path).count()
    n_out = compact_dir(spark, path, target_file_bytes=64 * 1024 * 1024, sort_cols=["order_timestamp"])
    n_after = len([p for p in Path(path).glob("*.parquet")])
    assert spark.read.parquet(path).count() == total
    assert n_after == n_out < n_before


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


def test_ingest_batch_replay_is_idempotent(spark):
    """Crash-replay semantics: re-delivering the same epoch must not
    double-count — the raw epoch directory overwrites itself and the merge
    skips already-recorded batch ids."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        last_merged_batch,
        process_ingest_batch,
    )

    events = load_table(spark, SF_DIR, "events").limit(1000)
    with tempfile.TemporaryDirectory() as d:
        raw, rollup = f"{d}/raw", f"{d}/rollup"
        process_ingest_batch(spark, events, 0, raw, rollup)
        first_raw = spark.read.parquet(raw).count()
        first_rollup = sorted(map(tuple, spark.read.parquet(rollup).collect()))
        # Replay the SAME epoch (what foreachBatch does after a crash).
        process_ingest_batch(spark, events, 0, raw, rollup)
        assert spark.read.parquet(raw).count() == first_raw
        assert sorted(map(tuple, spark.read.parquet(rollup).collect())) == first_rollup
        assert last_merged_batch(spark, rollup) == 0
        # The next epoch still merges.
        process_ingest_batch(spark, events, 1, raw, rollup)
        assert spark.read.parquet(raw).count() == 2 * first_raw
        assert last_merged_batch(spark, rollup) == 1


def test_wire_stream_pipeline_end_to_end(spark, tmp_path):
    """The full reference ingest analog (SURVEY.md §3.2): wire JSON ->
    parse+DLQ -> normalize -> streaming dedup -> raw epochs + rollup MERGE.
    Conservation: stored == unique parseable orders; corrupt payloads land
    in the DLQ; the rollup equals the one-shot A1 aggregate."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.normalize import (
        normalize_orders,
        parse_wire,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.generator import (
        generate_orders,
        to_wire,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        orders_hourly_rollup_aggregate,
        run_wire_stream_pipeline,
    )

    orders = generate_orders(spark, 400, seed=11).dropDuplicates(["order_id"])
    n_unique = orders.count()
    src = str(tmp_path / "wire")
    # File 1: unique orders.  File 2: 50 re-deliveries + 2 corrupt payloads
    # (separate micro-batch => exercises cross-batch dedup state).
    to_wire(orders).coalesce(1).write.mode("append").text(src)
    bad = spark.createDataFrame([("corrupt {",), ("99",)], ["value"])
    to_wire(orders.limit(50)).union(bad).coalesce(1).write.mode("append").text(src)

    run_wire_stream_pipeline(
        spark,
        source_dir=src,
        raw_dir=f"{tmp_path}/raw",
        rollup_dir=f"{tmp_path}/rollup",
        dlq_dir=f"{tmp_path}/dlq",
        checkpoint_root=f"{tmp_path}/ckpt",
    )
    raw = spark.read.parquet(f"{tmp_path}/raw")
    assert raw.count() == n_unique  # dedup dropped all 50 re-deliveries
    assert raw.select("order_id").distinct().count() == n_unique
    dlq = spark.read.parquet(f"{tmp_path}/dlq")
    assert sorted(r["raw_payload"] for r in dlq.collect()) == ["99", "corrupt {"]
    got = spark.read.parquet(f"{tmp_path}/rollup").select(
        "hour", "category", "order_count", "total_revenue", "total_quantity"
    )
    want = orders_hourly_rollup_aggregate(normalize_orders(parse_wire(to_wire(orders))))
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0


def test_merge_recovers_from_crash_between_delete_and_rename(spark, tmp_path):
    """The swap's crash window: rollup dir deleted, rename not yet done —
    the only copy of the state lives in the orphaned .swap-* dir.  The next
    merge must promote it, not silently restart from empty."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage import fs
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        hourly_rollup_aggregate,
        last_merged_batch,
        merge_rollup,
    )

    events = load_table(spark, SF_DIR, "events").limit(2000)
    b0 = events.filter(F.pmod("event_id", F.lit(2)) == 0)
    b1 = events.filter(F.pmod("event_id", F.lit(2)) == 1)
    rollup = f"{tmp_path}/rollup"
    merge_rollup(spark, rollup, hourly_rollup_aggregate(b0), batch_id=0)
    # Simulate the crash: the swapped-in dir gets orphaned back to a swap name.
    fs.rename(spark, rollup, f"{rollup}.swap-crashed1")
    assert not fs.exists(spark, rollup)
    merge_rollup(spark, rollup, hourly_rollup_aggregate(b1), batch_id=1)
    got = spark.read.parquet(rollup)
    want = hourly_rollup_aggregate(events)
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0  # batch 0 NOT lost
    assert last_merged_batch(spark, rollup) == 1
    # Stale swap dirs were cleaned up after the successful merge.
    assert not fs.exists(spark, f"{rollup}.swap-crashed1")


def test_maintenance_swaps_recover_from_crash(spark, tmp_path):
    """Compaction and the TTL boundary rewrite share merge_rollup's .swap-*
    protocol: a crash between delete and rename (the partition's only copy
    stranded under a swap name) is repaired by the next maintenance pass."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage import fs
    from realtime_analytics_with_kafka_clickhouse_spark.storage.layout import compact_dir

    # --- compact_dir: orphaned swap promoted before compacting ---
    frag = f"{tmp_path}/frag"
    orders = generate_orders(spark, 1000, seed=9)
    orders.coalesce(4).write.parquet(frag)
    total = spark.read.parquet(frag).count()
    fs.rename(spark, frag, f"{frag}.swap-crashed")  # crash window state
    assert not fs.exists(spark, frag)
    compact_dir(spark, frag, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(frag).count() == total
    assert not fs.exists(spark, f"{frag}.swap-crashed")

    # --- expire_ttl: boundary partition stranded mid-rewrite, then swept ---
    table = f"{tmp_path}/orders_table"
    write_orders_table(orders, table)
    cutoff = "2026-02-10 00:00:00"
    boundary = f"{table}/order_month=202602"
    assert fs.exists(spark, boundary)
    fs.rename(spark, boundary, f"{boundary}.swap-crashed")
    touched = expire_ttl(spark, table, cutoff)
    assert f"rewrote:order_month=202602" in touched  # recovered AND rewritten
    survived = read_orders_table(spark, table)
    assert survived.filter(
        F.col("order_timestamp") < F.lit(cutoff).cast("timestamp")
    ).count() == 0
    kept = orders.filter(F.col("order_timestamp") >= F.lit(cutoff).cast("timestamp")).count()
    assert survived.count() == kept


def test_observed_metrics_single_pass(spark):
    """A4 parity: observe() metrics piggyback the batch without a second scan."""
    from pyspark.sql import Observation

    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        with_observed_metrics,
    )

    events = load_table(spark, SF_DIR, "events")
    obs = Observation("ingest_metrics")
    df = with_observed_metrics(events, observation=obs)
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == events.count()
    assert abs(got["revenue"] - events.agg(F.sum("value")).collect()[0][0]) < 1e-6


def test_windowed_stateful_rollup_equals_batch_when_no_late_data(spark):
    """The watermark alternative agrees with the MERGE path when nothing is
    late (single epoch); its late-drop divergence is documented behavior."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        hourly_rollup_aggregate,
        windowed_stateful_rollup,
    )

    events = load_table(spark, SF_DIR, "events")
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/incoming"
        events.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        agg = windowed_stateful_rollup(stream.filter(F.col("event_type") != "error"))
        q = (
            agg.writeStream.format("memory")
            .queryName("win_rollup")
            .outputMode("complete")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT * FROM win_rollup")
        want = hourly_rollup_aggregate(events)
        assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0


def test_stream_stream_join_orders_acks(spark, tmp_path):
    """Stream-stream join within an event-time range: every order with an
    ack inside the window joins exactly once; acks outside never join."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        join_orders_with_acks,
    )

    orders = generate_orders(spark, 300, seed=21).dropDuplicates(["order_id"])
    n = orders.count()
    # Acks: half within 10 minutes (join), half 3 hours late (outside window).
    acks = orders.select(
        "order_id",
        F.when(F.pmod(F.xxhash64("order_id"), F.lit(2)) == 0,
               F.col("order_timestamp") + F.expr("INTERVAL 10 MINUTES"))
         .otherwise(F.col("order_timestamp") + F.expr("INTERVAL 3 HOURS"))
         .alias("ack_timestamp"),
        F.lit("ok").alias("ack_status"),
    )
    n_in_window = orders.filter(F.pmod(F.xxhash64("order_id"), F.lit(2)) == 0).count()
    o_src, a_src = str(tmp_path / "orders"), str(tmp_path / "acks")
    orders.coalesce(1).write.parquet(o_src)
    acks.coalesce(1).write.parquet(a_src)
    o_stream = spark.readStream.schema(orders.schema).parquet(o_src)
    a_stream = spark.readStream.schema(acks.schema).parquet(a_src)
    q = (
        join_orders_with_acks(o_stream, a_stream)
        .writeStream.format("memory")
        .queryName("acked")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM acked")
    assert got.count() == n_in_window
    assert 0 < n_in_window < n


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions close on gap arrival
    and on event-time timeout as the watermark passes last+gap."""
    import datetime as dt

    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        streaming_sessionize,
    )

    T = lambda h, m: dt.datetime(2026, 1, 1, h, m)
    schema = "event_id long, ts timestamp, user_id long, value double"
    batches = [
        [(1, T(10, 0), 1, 5.0), (2, T(10, 10), 1, 7.0)],   # S1 open
        [(3, T(13, 0), 1, 2.0)],                            # gap -> S1 emits, S2 opens
        [(4, T(20, 0), 2, 1.0)],                            # advance watermark
        [(5, T(23, 0), 2, 1.0)],                            # wm passes S2 timeout
    ]
    src = str(tmp_path / "events")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["session_revenue"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert (1, T(10, 0), T(10, 10), 2, 12.0) in got  # closed by gap arrival
    assert (1, T(13, 0), T(13, 0), 1, 2.0) in got    # closed by event-time timeout


def test_streaming_sessionize_survives_cross_batch_late_events(spark, tmp_path):
    """A late event older than the session's current end (even below the
    watermark — applyInPandasWithState delivers those) must fold into the
    session WITHOUT moving its end backwards: a receding `last` would place
    the event-time timeout at/below the watermark, which Spark rejects at
    runtime, killing the query."""
    import datetime as dt

    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        streaming_sessionize,
    )

    T = lambda h, m: dt.datetime(2026, 1, 1, h, m)
    schema = "event_id long, ts timestamp, user_id long, value double"
    batches = [
        [(1, T(10, 0), 1, 5.0)],   # S1 open; wm -> 09:30
        [(2, T(8, 0), 1, 1.0)],    # LATE (< wm): folds in, end stays 10:00
        [(3, T(20, 0), 2, 1.0)],   # wm -> 19:30, past S1's 10:30 timeout
        [(4, T(23, 0), 2, 1.0)],   # next epoch: S1 timeout fires
    ]
    src = str(tmp_path / "events")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["session_revenue"])
        for r in spark.sql("SELECT * FROM sess_late").collect()
    }
    # Late event widened the start, did not recede the end; revenue counted.
    assert (1, T(8, 0), T(10, 0), 2, 6.0) in got


def test_rate_orders_stream_shape(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.sources.generator import (
        generate_orders,
        rate_orders_stream,
    )

    live = rate_orders_stream(spark, rows_per_second=50)
    assert live.isStreaming
    assert live.schema == generate_orders(spark, 1).schema


def test_delete_rows_gdpr_mutation(spark):
    """ALTER TABLE ... DELETE analog: keyed delete rewrites only affected
    partitions, preserves everything else, survives NULL predicates."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage import delete_rows

    orders = generate_orders(spark, 2000, seed=42)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_table"
        write_orders_table(orders, path)
        victim = read_orders_table(spark, path).select("customer_id").first()[0]
        n_victim = orders.filter(F.col("customer_id") == victim).count()
        assert n_victim > 0
        before = read_orders_table(spark, path).count()
        touched = delete_rows(spark, path, f"customer_id = '{victim}'")
        assert touched and all(
            t.startswith(("rewrote:", "dropped:")) for t in touched
        )
        after = read_orders_table(spark, path)
        assert after.filter(F.col("customer_id") == victim).count() == 0
        assert after.count() == before - n_victim
        # Untouched months keep their files: only affected partitions listed.
        all_months = {
            p.name for p in Path(path).glob("order_month=*")
        }
        touched_months = {t.split(":", 1)[1] for t in touched}
        assert touched_months <= all_months | touched_months
        # Idempotent: deleting again touches nothing.
        assert delete_rows(spark, path, f"customer_id = '{victim}'") == []


def test_replacing_merge_recovers_from_crash(spark, tmp_path):
    """merge_replacing shares merge_rollup's .swap-* crash protocol: a
    crash between delete and rename must not lose earlier versions — the
    next merge promotes the orphan and the update still supersedes it."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage import fs
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_replacing,
    )

    table = f"{tmp_path}/replacing"
    v0 = spark.createDataFrame([(1, 0, "O"), (2, 0, "O")], "k long, version long, s string")
    v1 = spark.createDataFrame([(1, 1, "D")], "k long, version long, s string")
    merge_replacing(spark, table, v0, key="k", version="version", batch_id=0)
    fs.rename(spark, table, f"{table}.swap-crashed1")
    assert not fs.exists(spark, table)
    merge_replacing(spark, table, v1, key="k", version="version", batch_id=1)
    got = {r["k"]: (r["version"], r["s"]) for r in spark.read.parquet(table).collect()}
    assert got == {1: (1, "D"), 2: (0, "O")}  # batch 0's key 2 NOT lost
    assert not fs.exists(spark, f"{table}.swap-crashed1")


def test_windowed_rollup_drops_late_event_merge_path_keeps_it(spark, tmp_path):
    """The documented semantic fork, proven in BOTH directions: an event
    arriving beyond the watermark after its window finalized is DROPPED by
    the engine-state windowed aggregation (append mode), but the
    table-side MERGE path folds it in — the reason merge_rollup is the
    default MV strategy (unbounded lateness, like the reference's MVs)."""
    import datetime as dt

    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        hourly_rollup_aggregate,
        merge_rollup,
        windowed_stateful_rollup,
    )

    def ev(eid, hour, minute):
        return (eid, dt.datetime(2024, 3, 1, hour, minute), "purchase", 10.0, '{"k": 1}')

    schema = "event_id long, ts timestamp, event_type string, value double, props string"
    chunk1 = spark.createDataFrame(
        [ev(1, 10, 0), ev(2, 10, 10), ev(3, 10, 20), ev(4, 23, 0)], schema
    )
    # Spark's LATE-RECORD filter runs one batch behind eviction (the 23:00
    # event's watermark governs filtering from batch 2 on, while window
    # 10:00 already finalizes at the end of batch 1) — so the late probe
    # rides a THIRD file, after a filler batch establishes the filter.
    chunk2 = spark.createDataFrame([ev(7, 23, 10)], schema)
    chunk3 = spark.createDataFrame([ev(5, 10, 30), ev(6, 23, 30)], schema)

    src = f"{tmp_path}/src"
    chunk1.coalesce(1).write.mode("append").parquet(src)
    chunk2.coalesce(1).write.mode("append").parquet(src)
    chunk3.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(chunk1.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        windowed_stateful_rollup(stream)
        .writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        r["hour"].isoformat(): r["order_count"]
        for r in spark.sql("SELECT * FROM late_drop").collect()
    }
    assert emitted["2024-03-01T10:00:00"] == 3  # event 5 dropped by the watermark

    rollup_dir = f"{tmp_path}/rollup"
    merge_rollup(spark, rollup_dir, hourly_rollup_aggregate(chunk1), batch_id=0)
    merge_rollup(spark, rollup_dir, hourly_rollup_aggregate(chunk2), batch_id=1)
    merge_rollup(spark, rollup_dir, hourly_rollup_aggregate(chunk3), batch_id=2)
    merged = {
        r["hour"].isoformat(): r["order_count"]
        for r in spark.read.parquet(rollup_dir).collect()
    }
    assert merged["2024-03-01T10:00:00"] == 4  # MERGE path keeps the late event


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """ST3 delivery guarantee across a query RESTART: a file-source stream
    processes chunk A, stops, chunk B lands, and a NEW query over the SAME
    checkpoint + sink processes ONLY B — the checkpointed offsets make the
    restart exactly-once (no replay of A, no gap).  This is the crash/
    redeploy path of the reference consumer, where auto-committed Kafka
    offsets lose or double rows (SURVEY.md §2.7)."""
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    ).limit(1000).cache()
    try:
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        a = events.filter(F.col("event_id") % 2 == 0)
        b = events.filter(F.col("event_id") % 2 == 1)
        a.coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema

        def run_once():
            q = (
                spark.readStream.schema(schema).parquet(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        n_a = spark.read.parquet(out).count()
        assert n_a == a.count()
        b.coalesce(1).write.mode("append").parquet(src)
        run_once()  # restart: same checkpoint, same sink
        got = spark.read.parquet(out)
        assert got.count() == events.count()  # B appended, A not replayed
        assert got.select("event_id").distinct().count() == events.count()
    finally:
        events.unpersist(blocking=False)
