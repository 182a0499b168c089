"""Scalar / aggregate expression library (SURVEY.md §2.6).

Covers every scalar function the reference uses, re-expressed as Spark
``Column`` expressions (JVM-side, codegen-friendly — no Python UDFs):

- ``toStartOfHour`` (/root/reference/clickhouse/init/01_init.sql:67)  → ``to_start_of_hour``
- ``toDate``        (01_init.sql:81)                                  → ``F.to_date``
- ``toYYYYMM``      (01_init.sql:28)                                  → ``to_yyyymm``
- ISO-8601 'Z' strip + fallback parse
  (/root/reference/consumers/kafka_to_clickhouse.py:82-86)            → ``parse_iso_ts_with_fallback``
- ``round(x, 2)`` money rounding
  (/root/reference/producers/sales_producer.py:129)                   → ``money_round``

Plus ``dsum``/``davg``: **order-independent money aggregation**.  Distributed
double sums are non-associative (partial-agg merge order varies run to run
and engine to engine); summing through a decimal intermediate is exact and
therefore bit-stable at any parallelism — this is the "opt-in Decimal
correctness mode" of SURVEY.md §1.3, and what makes our results hash-match a
single-threaded DuckDB oracle while running on 32+ cores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal(25,6) holds ±10^19 with micro-precision: enough for a 100 TB sum of
# money values while staying inside Spark's 128-bit decimal fast path.
_MONEY_DEC = "decimal(25,6)"


def dsum(col: Column | str) -> Column:
    """Exact (order-independent) sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_MONEY_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_MONEY_DEC)).cast("double") / F.count(c)


def money_round(col: Column) -> Column:
    """``round(x, 2)`` as the reference computes order totals."""
    return F.round(col, 2)


def to_start_of_hour(ts: Column | str) -> Column:
    return F.date_trunc("hour", ts)


def to_yyyymm(ts: Column | str) -> Column:
    """Month partition key, as int yyyymm (ClickHouse ``toYYYYMM``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.year(c) * 100 + F.month(c)).cast("int")


def parse_iso_ts_with_fallback(ts_str: Column, fallback: Column | None = None) -> Column:
    """Parse ISO-8601 with optional trailing 'Z'; fall back to processing time.

    Mirrors /root/reference/consumers/kafka_to_clickhouse.py:82-86: strip the
    'Z' suffix, ``fromisoformat``, and on failure use "now" (here: an
    explicit fallback column so batch re-runs stay deterministic when one is
    provided).
    """
    # try_to_timestamp: malformed input -> NULL (not an ANSI-mode error),
    # mirroring the consumer's try/except ValueError fallback.
    parsed = F.try_to_timestamp(F.regexp_replace(ts_str, "Z$", ""))
    fb = fallback if fallback is not None else F.current_timestamp()
    return F.coalesce(parsed, fb)
