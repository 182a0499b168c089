"""Kafka ops parity (S7 topic DDL, F2 system-topic filter) against a fake
admin client — no broker exists in this environment — plus a builder smoke
test for the source/sink option plumbing."""

from __future__ import annotations

import pytest

from realtime_analytics_with_kafka_clickhouse_spark.sources.admin import (
    DEFAULT_TOPICS,
    TopicExistsError,
    ensure_topics,
    list_user_topics,
)


class FakeAdmin:
    def __init__(self, existing=()):
        self.topics = set(existing)
        self.created = []

    def create_topics(self, names_partitions_rf):
        for name, p, r in names_partitions_rf:
            if name in self.topics:
                raise TopicExistsError(name)
            self.topics.add(name)
            self.created.append((name, p, r))

    def list_topics(self):
        return list(self.topics)


def test_ensure_topics_creates_with_reference_config():
    admin = FakeAdmin()
    results = ensure_topics(admin)
    assert [(r.name, r.partitions, r.status) for r in results] == [
        ("sales_orders", 3, "created")
    ]
    assert admin.created == list(DEFAULT_TOPICS)  # 3 partitions, RF 1


def test_ensure_topics_tolerates_existing():
    admin = FakeAdmin(existing={"sales_orders"})
    results = ensure_topics(admin)
    assert results[0].status == "exists"
    assert admin.created == []


def test_ensure_topics_records_errors():
    class BrokenAdmin(FakeAdmin):
        def create_topics(self, names_partitions_rf):
            raise RuntimeError("boom")

    results = ensure_topics(BrokenAdmin(), [("t", 1, 1)])
    assert results[0].status.startswith("error:")


def test_list_user_topics_filters_system_topics():
    admin = FakeAdmin(existing={"__consumer_offsets", "_schemas", "sales_orders", "audit"})
    assert list_user_topics(admin) == ["audit", "sales_orders"]


def test_external_batch_writer_appends_epoch(spark):
    """S4 sink factory: epoch-stamped append through an arbitrary format
    (driven through parquet so the stamp is observable)."""
    import tempfile

    from realtime_analytics_with_kafka_clickhouse_spark.streaming.sinks import (
        external_batch_writer,
        jdbc_batch_writer,
    )

    with tempfile.TemporaryDirectory() as d:
        writer = external_batch_writer("parquet", {"path": f"{d}/out"})
        df = spark.range(10).withColumnRenamed("id", "v")
        writer(df, 3)
        writer(df, 4)
        back = spark.read.parquet(f"{d}/out")
        assert back.count() == 20
        assert {r["ingest_epoch"] for r in back.select("ingest_epoch").distinct().collect()} == {3, 4}
    # JDBC flavor composes the same handler (no DB in sandbox to execute).
    assert callable(jdbc_batch_writer("jdbc:postgresql://x/y", "t"))


def test_kafka_option_maps_pin_reference_config():
    """S1/S2 option plumbing, pinned WITHOUT the connector jar: the pure
    option builders carry the reference consumer/producer config
    (bootstrap servers, topic subscribe, offset reset, bounded batches)."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources.kafka import (
        reader_options,
        writer_options,
    )

    r = reader_options()
    assert r == {
        "kafka.bootstrap.servers": "localhost:9092",
        "subscribe": "sales_orders",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "5000",
    }
    assert "maxOffsetsPerTrigger" not in reader_options(max_offsets_per_trigger=None)
    w = writer_options(checkpoint_dir="/ckpt")
    assert w == {
        "kafka.bootstrap.servers": "localhost:9092",
        "topic": "sales_orders",
        "checkpointLocation": "/ckpt",
    }


def test_kafka_wire_payload_roundtrip(spark):
    """S2 encode: every column folds into one JSON value column that
    parse-side schemas can recover — pure transform, no broker needed."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.normalize import (
        parse_wire_with_dlq,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.generator import (
        generate_orders,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.kafka import (
        to_wire_payload,
    )

    orders = generate_orders(spark, 50, seed=3)
    payload = to_wire_payload(orders)
    assert payload.columns == ["value"]
    ok, dlq = parse_wire_with_dlq(payload)
    assert dlq.count() == 0
    assert ok.count() == 50


def test_kafka_reader_builder_options(spark):
    """S1 smoke: the reader builder must at least produce a streaming
    DataFrame with the kafka wire schema when the connector is available;
    without the connector jar the builder itself must still compose."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources.kafka import (
        read_orders_stream,
    )

    try:
        df = read_orders_stream(spark, bootstrap_servers="localhost:19092")
    except Exception as e:  # connector jar not shipped with plain pyspark
        msg = str(e)
        assert "kafka" in msg.lower()
        pytest.skip("kafka connector not available in sandbox")
    assert df.isStreaming
    assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)


class _RecordingStreamBuilder:
    """Stands in for DataStreamReader/Writer: records format/options/
    trigger so the wire path is pinned without a broker or connector."""

    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.trigger_kwargs = None

    def format(self, fmt):
        self.fmt = fmt
        return self

    def options(self, **kw):
        self.opts.update(kw)
        return self

    def trigger(self, **kw):
        self.trigger_kwargs = kw
        return self

    def load(self):
        return self


def test_reader_builder_passes_exact_option_map():
    """r5 verdict #7: .format("kafka") must receive exactly
    reader_options()'s map — the one untested seam, pinned by mock."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources import kafka

    class FakeSpark:
        readStream = _RecordingStreamBuilder()

    fake = FakeSpark()
    out = kafka.read_orders_stream(
        fake,
        bootstrap_servers="broker:9092",
        topic="t1",
        starting_offsets="latest",
        max_offsets_per_trigger=777,
    )
    assert out is fake.readStream  # .load() result flows back unwrapped
    assert fake.readStream.fmt == "kafka"
    assert fake.readStream.opts == kafka.reader_options(
        "broker:9092", "t1", "latest", 777
    )
    assert fake.readStream.opts["maxOffsetsPerTrigger"] == "777"


def test_writer_builder_passes_exact_option_map_and_trigger():
    """S2 mirror of the reader pin: the sink builder encodes via
    to_wire_payload and hands writer_options() verbatim to the kafka
    format, with the reference consumer's 5s flush cadence."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources import kafka

    writer = _RecordingStreamBuilder()

    class FakeWireDF:
        writeStream = writer

    class FakeDF:
        columns = ["order_id", "total_amount"]

        def select(self, *cols):
            # to_wire_payload builds one to_json(struct(...)) column
            assert len(cols) == 1
            return FakeWireDF()

    out = kafka.write_orders_stream(
        FakeDF(),
        bootstrap_servers="broker:9092",
        topic="t2",
        checkpoint_dir="/tmp/ckpt-x",
    )
    assert out is writer
    assert writer.fmt == "kafka"
    assert writer.opts == kafka.writer_options("broker:9092", "t2", "/tmp/ckpt-x")
    assert writer.trigger_kwargs == {"processingTime": kafka.SINK_FLUSH_INTERVAL}
