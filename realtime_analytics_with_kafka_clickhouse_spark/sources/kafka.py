"""Kafka source/sink builders (SURVEY.md §2.1 S1/S2).

Mirrors the reference's consumer/producer configuration
(/root/reference/consumers/kafka_to_clickhouse.py:50-58,
 /root/reference/producers/sales_producer.py:157-165) as Structured
Streaming options.  No broker or spark-sql-kafka jar exists in the test
environment, so option construction is factored into pure functions
(``reader_options``/``writer_options``) that tests pin WITHOUT the
connector; the builders themselves apply those options verbatim, and the
file-stream pipeline (streaming.pipeline) exercises the identical
downstream logic in tests.

Divergences from the reference, by design (SURVEY.md §2.7):
- exactly-once via checkpointing + idempotent sink instead of
  auto-committed offsets (the reference can lose or duplicate on crash);
- no 100-records/poll ceiling — ``maxOffsetsPerTrigger`` bounds batches
  without capping sustained throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOPIC = "sales_orders"
SINK_FLUSH_INTERVAL = "5 seconds"  # the reference consumer's flush cadence


def reader_options(
    bootstrap_servers: str = "localhost:9092",
    topic: str = TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 5000,
) -> dict[str, str]:
    """The kafka-source option map, as one pure, testable unit."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def writer_options(
    bootstrap_servers: str = "localhost:9092",
    topic: str = TOPIC,
    checkpoint_dir: str = "/tmp/kafka_sink_checkpoint",
) -> dict[str, str]:
    """The kafka-sink option map, as one pure, testable unit."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def read_orders_stream(
    spark: SparkSession,
    bootstrap_servers: str = "localhost:9092",
    topic: str = TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 5000,
) -> DataFrame:
    """readStream from the orders topic; value stays binary for parse_wire."""
    return (
        spark.readStream.format("kafka")
        .options(
            **reader_options(
                bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
            )
        )
        .load()
    )


def to_wire_payload(df: DataFrame) -> DataFrame:
    """S2 wire encoding: every column folded into one JSON value column —
    pure DataFrame transform, testable without any connector."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def write_orders_stream(
    df: DataFrame,
    bootstrap_servers: str = "localhost:9092",
    topic: str = TOPIC,
    checkpoint_dir: str = "/tmp/kafka_sink_checkpoint",
):
    """writeStream of order rows to Kafka as JSON (S2: to_json(struct(*)))."""
    return (
        to_wire_payload(df)
        .writeStream.format("kafka")
        .options(**writer_options(bootstrap_servers, topic, checkpoint_dir))
        .trigger(processingTime=SINK_FLUSH_INTERVAL)
    )
