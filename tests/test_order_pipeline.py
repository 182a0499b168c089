"""Order wire-format pipeline: generator -> JSON wire -> parse -> normalize
(SURVEY.md §5.2 edge semantics: Z-suffix fallback, defaults, money
invariant, Unicode fidelity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.operators.normalize import (
    normalize_orders,
    parse_wire,
    recompute_total,
    with_partition_month,
)
from realtime_analytics_with_kafka_clickhouse_spark.sources.generator import (
    generate_orders,
    to_wire,
)


def test_generator_deterministic_and_distributed(spark):
    a = generate_orders(spark, 500, seed=7).collect()
    b = generate_orders(spark, 500, seed=7).collect()
    assert a == b
    c = generate_orders(spark, 500, seed=8).collect()
    assert a != c


def test_wire_roundtrip_preserves_unicode_and_values(spark):
    orders = generate_orders(spark, 300, seed=42)
    wire = to_wire(orders)
    parsed = normalize_orders(parse_wire(wire))
    src = orders.orderBy("order_id", "order_timestamp", "customer_id").collect()
    out = parsed.orderBy("order_id", "order_timestamp", "customer_id").collect()
    assert len(src) == len(out)
    thai_seen = False
    for s, o in zip(src, out):
        assert o["product_name"] == s["product_name"]  # Unicode-clean end-to-end
        assert o["total_amount"] == s["total_amount"]
        assert o["order_timestamp"] == s["order_timestamp"]
        thai_seen = thai_seen or any("฀" <= ch <= "๿" for ch in s["product_name"])
    assert thai_seen, "catalog must exercise Thai text"


def test_malformed_timestamp_falls_back(spark):
    orders = generate_orders(spark, 200, seed=1)
    wire = to_wire(orders, malform_every=5)
    fallback = F.lit("2030-01-01 00:00:00").cast("timestamp")
    parsed = normalize_orders(parse_wire(wire), fallback_ts=fallback)
    n_fallback = parsed.filter(F.col("order_timestamp") == fallback).count()
    assert n_fallback > 0  # some rows malformed -> pinned fallback applied
    assert parsed.filter(F.col("order_timestamp").isNull()).count() == 0


def test_missing_fields_get_defaults(spark):
    raw = spark.createDataFrame(
        [('{"order_id": "ORD-2026-00001"}',), ("not json at all",)], ["value"]
    )
    parsed = normalize_orders(parse_wire(raw), fallback_ts=F.lit("2030-01-01").cast("timestamp"))
    rows = parsed.collect()
    assert len(rows) == 2
    good = [r for r in rows if r["order_id"] == "ORD-2026-00001"][0]
    assert good["customer_id"] == ""
    assert good["quantity"] == 1
    assert good["unit_price"] == 0.0
    bad = [r for r in rows if r["order_id"] == ""][0]  # unparseable -> all defaults
    assert bad["total_amount"] == 0.0


def test_corrupt_records_quarantined_with_payload(spark):
    """Dead-letter path: unparseable records keep their raw payload in the
    quarantine side instead of becoming all-default rows."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.normalize import (
        parse_wire_with_dlq,
    )

    good = to_wire(generate_orders(spark, 50, seed=9))
    bad = spark.createDataFrame(
        [("not json at all",), ('{"order_id": truncated',), ("12345",)], ["value"]
    )
    ok, dlq = parse_wire_with_dlq(good.union(bad))
    assert ok.count() == 50
    dlq_rows = dlq.collect()
    assert {r["raw_payload"] for r in dlq_rows} == {
        "not json at all",
        '{"order_id": truncated',
        "12345",
    }  # payloads preserved verbatim
    assert {r["error"] for r in dlq_rows} == {"json_parse_failed"}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """FIXTURES.md §1 duplicate order_ids: re-delivered records are dropped
    by dropDuplicatesWithinWatermark keyed on order_id."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        dedup_orders_stream,
    )

    orders = generate_orders(spark, 300, seed=3).dropDuplicates(["order_id"])
    n_unique = orders.count()
    dup = orders.limit(60)  # re-deliveries: same order_id, same event time
    src = str(tmp_path / "wire")
    orders.union(dup).coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(orders.schema).parquet(src)
    q = (
        dedup_orders_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM dedup_out")
    assert got.count() == n_unique
    assert got.select("order_id").distinct().count() == n_unique


def test_wire_schema_evolution_tolerated(spark):
    """Schema evolution on the wire: producers adding fields must not break
    the consumer (unknown JSON keys are ignored), and consumers upgraded
    before producers see defaults for not-yet-sent fields — the reference's
    .get(key, default) behavior, held by from_json + normalize."""
    newer_producer = spark.createDataFrame(
        [('{"order_id": "ORD-2026-00001", "quantity": 2, "NEW_FIELD": "x", "nested_new": {"a": 1}}',)],
        ["value"],
    )
    rows = normalize_orders(
        parse_wire(newer_producer), fallback_ts=F.lit("2030-01-01").cast("timestamp")
    ).collect()
    assert len(rows) == 1
    assert rows[0]["order_id"] == "ORD-2026-00001"
    assert rows[0]["quantity"] == 2
    assert "NEW_FIELD" not in rows[0].asDict()  # unknown keys ignored
    # Older producer: fields the current schema knows but the payload lacks
    # get their declared defaults (the upgraded-consumer side of evolution).
    assert rows[0]["region"] == ""
    assert rows[0]["discount_percent"] == 0.0


def test_total_amount_invariant(spark):
    orders = generate_orders(spark, 400, seed=42)
    checked = recompute_total(orders)
    assert checked.filter(~F.col("total_consistent")).count() == 0


def test_partition_month_key(spark):
    orders = generate_orders(spark, 100, seed=42)
    m = with_partition_month(orders).select("order_month").distinct().collect()
    months = sorted(r["order_month"] for r in m)
    assert months and all(202601 <= x <= 202603 for x in months)
    assert len(months) >= 2  # span exercises partition pruning
