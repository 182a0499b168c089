"""Fixture schema-drift guards (round-4 regression: driver fixtures changed
events.ts from parquet TIMESTAMP(NANOS) to timestamp[us]/NTZ, silently
bypassing the loader's nanos normalization and breaking every
unix_micros / withWatermark call site).  ``load_table`` is the single
choke point — whatever physical type the fixtures use, downstream code
must always see a session-local TimestampType ``ts``."""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T

from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

from conftest import SF_DIR


def test_events_ts_normalized_to_timestamp(spark):
    events = load_table(spark, SF_DIR, "events")
    ts_type = events.schema["ts"].dataType
    assert isinstance(ts_type, T.TimestampType), (
        f"events.ts must normalize to TimestampType (got {ts_type}); "
        "unix_micros/withWatermark/window() reject NTZ and LongType"
    )
    # The values must actually be usable by the call sites that broke.
    row = events.select(F.unix_micros("ts").alias("um")).first()
    assert row["um"] is not None


def test_events_ts_watermarkable(spark):
    events = load_table(spark, SF_DIR, "events")
    # withWatermark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE at plan
    # time on a non-TIMESTAMP column — no need to run a stream.
    events.withWatermark("ts", "1 hour").groupBy(
        F.window("ts", "1 hour")
    ).count()._jdf  # force analysis
