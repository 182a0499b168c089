"""External-sink writers for foreachBatch (SURVEY.md §2.1 S4 — the
ClickHouse bulk-insert analog, /root/reference/consumers/
kafka_to_clickhouse.py:107-129, minus its drop-failed-batch behavior).

``external_batch_writer`` returns a foreachBatch handler that stamps each
micro-batch with its epoch id and appends through any DataSource V2 format
(jdbc, delta, parquet, noop...).  The epoch column is the idempotency
hook: a transactional backend dedupes ON CONFLICT on (epoch, key); an
append-only backend dedupes downstream by epoch — either way a replayed
epoch is identifiable instead of silently double-counted.  Structured
Streaming's checkpoint pins WHICH offsets form each epoch, so epoch id ->
row set is deterministic across restarts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BatchWriter = Callable[[DataFrame, int], None]


def external_batch_writer(
    fmt: str, options: dict[str, str] | None = None, epoch_col: str = "ingest_epoch"
) -> BatchWriter:
    """foreachBatch handler: append the epoch-stamped micro-batch via any
    write format.  Errors propagate — Structured Streaming retries the
    epoch, and the epoch stamp keeps the retry identifiable (the reference
    consumer instead counted the error and kept the batch buffered)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(epoch_col, F.lit(batch_id))
            .write.format(fmt)
            .options(**(options or {}))
            .mode("append")
            .save()
        )

    return write


def jdbc_batch_writer(url: str, table: str, **options: str) -> BatchWriter:
    """JDBC analytics-store sink (the closest OSS analog of the reference's
    clickhouse-connect column insert; ClickHouse itself is reachable this
    way via its JDBC driver)."""
    return external_batch_writer("jdbc", {"url": url, "dbtable": table, **options})
