"""Kafka source/sink builders (SURVEY.md §2.1 S1/S2).

Mirrors the reference's consumer/producer configuration
(/root/reference/consumers/kafka_to_clickhouse.py:50-58,
 /root/reference/producers/sales_producer.py:157-165) as Structured
Streaming options.  No broker exists in the test environment, so these are
builders only — the file-stream pipeline (streaming.pipeline) exercises the
identical downstream logic in tests.

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


def read_orders_stream(
    spark: SparkSession,
    bootstrap_servers: str = "localhost:9092",
    topic: str = TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 5000,
) -> DataFrame:
    """readStream from the orders topic; value stays binary for parse_wire."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def write_orders_stream(
    df: DataFrame,
    bootstrap_servers: str = "localhost:9092",
    topic: str = TOPIC,
    checkpoint_dir: str = "/tmp/kafka_sink_checkpoint",
):
    """writeStream of order rows to Kafka as JSON (S2: to_json(struct(*)))."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="5 seconds")  # the consumer's 5s flush cadence
    )
