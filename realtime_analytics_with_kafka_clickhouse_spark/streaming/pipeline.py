"""Incremental rollup maintenance — the materialized-view analog
(SURVEY.md §2.7/§3.2, §7-M5).

The reference's MVs fire per insert block and add partial-aggregate rows to
a SummingMergeTree, tolerating unboundedly late events
(/root/reference/clickhouse/init/01_init.sql:63-87).  The Spark analog:

    readStream -> normalize -> foreachBatch:
        (a) append raw micro-batch to the raw table
        (b) aggregate JUST the micro-batch and MERGE into the rollup table

State lives in the rollup *table*, not engine memory — a watermarked
stateful aggregation would drop late events (semantic divergence) and hold
unbounded state at 100 TB; table-side merge keeps memory bounded and
lateness unbounded, exactly like the MV.

``merge_rollup`` implements SummingMergeTree merge semantics: union the
batch partials with current partials and re-sum per key.  On Delta/Iceberg
this is a keyed MERGE; on plain parquet we re-aggregate the (tiny,
key-bounded) rollup table and atomically swap directories.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dsum, to_start_of_hour
from ..sources.tables import load_table

ROLLUP_KEYS = ["hour", "category"]


def hourly_rollup_aggregate(batch: DataFrame) -> DataFrame:
    """The A1 rollup aggregation over one micro-batch of events
    (hour x category -> count/revenue/quantity over completed orders),
    identical semantics to operators.rollups.hourly_category_rollup."""
    from ..operators.rollups import category_key, completed, quantity_key

    return (
        batch.filter(completed())
        .groupBy(
            to_start_of_hour("ts").alias("hour"),
            category_key().alias("category"),
        )
        .agg(
            F.count("*").alias("order_count"),
            dsum("value").alias("total_revenue"),
            F.sum(quantity_key()).alias("total_quantity"),
        )
    )


def merge_rollup(spark: SparkSession, rollup_dir: str, batch_partials: DataFrame) -> None:
    """MERGE batch partials into the stored rollup (SummingMergeTree fold):
    equal-key rows re-sum; new keys append.  Atomic directory swap."""
    root = Path(rollup_dir)
    if root.exists():
        current = spark.read.parquet(rollup_dir)
        unioned = current.unionByName(batch_partials)
    else:
        unioned = batch_partials
    merged = unioned.groupBy(*ROLLUP_KEYS).agg(
        F.sum("order_count").alias("order_count"),
        dsum("total_revenue").alias("total_revenue"),
        F.sum("total_quantity").alias("total_quantity"),
    )
    tmp = f"{rollup_dir}.swap-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if root.exists():
        shutil.rmtree(root)
    Path(tmp).rename(root)


def incremental_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible proof of incremental-equals-batch: replay events as 4
    interleaved micro-batches (event_id mod 4 — deliberately out of time
    order, so every batch contains 'late' events) through the MERGE path,
    then return the final rollup.  The oracle is the one-shot GROUP BY: the
    invariant IS the query."""
    events = load_table(spark, sf_dir, "events")
    workdir = tempfile.mkdtemp(prefix="rollup_inc_")
    rollup_dir = str(Path(workdir) / "sales_by_category_hourly")
    try:
        for i in range(4):
            chunk = events.filter(F.pmod(F.col("event_id"), F.lit(4)) == i)
            merge_rollup(spark, rollup_dir, hourly_rollup_aggregate(chunk))
        final = spark.read.parquet(rollup_dir)
        # Materialize before the workdir disappears.
        out = spark.createDataFrame(final.collect(), schema=final.schema)
        return out
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def run_file_stream_pipeline(
    spark: SparkSession,
    source_dir: str,
    schema,
    raw_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
) -> None:
    """True Structured Streaming path: file-stream source (Kafka stand-in for
    tests — identical sink logic), availableNow trigger, foreachBatch
    appending raw + MERGE-ing the rollup.  Exactly-once per epoch via
    checkpointing + idempotent merge."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(raw_dir)
            merge_rollup(spark, rollup_dir, hourly_rollup_aggregate(batch_df))
        finally:
            batch_df.unpersist()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def with_observed_metrics(df: DataFrame, observation=None, name: str = "ingest_metrics") -> DataFrame:
    """A4 parity: the producer/consumer live counters
    (/root/reference/producers/sales_producer.py:150-153,181-186;
    /root/reference/consumers/kafka_to_clickhouse.py:36-41,140-147) as
    ``observe`` metrics — per-epoch row count / revenue sum / avg order
    value, surfaced through QueryProgress or ``Observation`` without a
    second pass over the data."""
    return df.observe(
        observation if observation is not None else name,
        F.count(F.lit(1)).alias("rows"),
        F.sum("value").alias("revenue"),
        F.avg("value").alias("avg_value"),
    )


def windowed_stateful_rollup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """The *alternative* MV strategy: engine-state tumbling-window
    aggregation with a watermark.  Late events beyond the watermark are
    DROPPED — a semantic divergence from the reference's
    unbounded-lateness MVs (SURVEY.md §2.7), which is why the MERGE path
    (merge_rollup) is the default; this exists for pipelines that prefer
    bounded engine state over table-side merge."""
    from ..operators.rollups import category_key, completed, quantity_key

    return (
        events.withWatermark("ts", watermark)
        .filter(completed())
        .groupBy(F.window("ts", "1 hour").alias("win"), category_key().alias("category"))
        .agg(
            F.count("*").alias("order_count"),
            dsum("value").alias("total_revenue"),
            F.sum(quantity_key()).alias("total_quantity"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "category",
            "order_count",
            "total_revenue",
            "total_quantity",
        )
    )
