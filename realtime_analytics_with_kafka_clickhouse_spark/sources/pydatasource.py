"""Python DataSource API source (SURVEY.md §2.1 extension, Spark 4).

The reference's only ingress besides Kafka is its Python producer loop
(/root/reference/producers/sales_producer.py) — a row generator living
OUTSIDE the engine.  Spark 4's Python DataSource API
(`pyspark.sql.datasource`) moves that pattern INSIDE the planner: a
user-defined source declares a schema and a partition list, and each
partition generates its rows executor-side, so a synthetic/external feed
parallelizes and prunes like any other scan (no driver-side row loop, no
collect-and-parallelize).

``LedgerDataSource`` is the deterministic proof instance: ``n`` rows of an
arithmetic ledger split over ``parts`` partitions by round-robin.  Every
value is a pure function of the row id, so a DuckDB ``range(n)`` query
reproduces the table bit-for-bit — which is what lets the driver gate
hash-check a *source*, not just operators over parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LEDGER_SCHEMA = "id BIGINT, bucket BIGINT, amount BIGINT"
#: Default row count / parallelism for the proof query (kept modest: the
#: point is the API shape, not volume — scale comes from `parts`).
LEDGER_ROWS = 100_000
LEDGER_PARTS = 8


def _make_datasource_class():
    """Build the DataSource subclass lazily so importing this module never
    requires the (Spark 4-only) datasource API at import time."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _LedgerPartition(InputPartition):
        def __init__(self, index: int, n: int, parts: int):
            self.index, self.n, self.parts = index, n, parts

    class _LedgerReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", LEDGER_ROWS))
            self.parts = int(options.get("parts", LEDGER_PARTS))

        def partitions(self):
            return [_LedgerPartition(i, self.n, self.parts) for i in range(self.parts)]

        def read(self, partition):
            # Executor-side generation: each partition walks its
            # round-robin residue class — no shared state, no driver loop.
            for i in range(partition.index, partition.n, partition.parts):
                yield (i, i % 10, (i * i) % 9973)

    class LedgerDataSource(DataSource):
        @classmethod
        def name(cls):
            return "graft_ledger"

        def schema(self):
            return LEDGER_SCHEMA

        def reader(self, schema):
            return _LedgerReader(self.options)

    return LedgerDataSource


_REGISTERED_SESSIONS: set[int] = set()


def register_ledger_source(spark: SparkSession) -> None:
    """Register the source once per session (re-registration is an error
    in some Spark versions; memoized on session identity)."""
    key = id(spark)
    if key not in _REGISTERED_SESSIONS:
        spark.dataSource.register(_make_datasource_class())
        _REGISTERED_SESSIONS.add(key)


def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated proof query: scan the Python-defined source and fold
    it to a per-bucket report.  ``sf_dir`` is unused (the source is
    synthetic) but kept for the uniform (spark, sf_dir) registry shape."""
    from pyspark.sql import functions as F

    register_ledger_source(spark)
    df = (
        spark.read.format("graft_ledger")
        .option("n", str(LEDGER_ROWS))
        .option("parts", str(LEDGER_PARTS))
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.sum("amount").alias("total_amount"),
        F.max("id").alias("max_id"),
    )
