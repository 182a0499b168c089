"""Ad-hoc query CLI — the working analog of the reference's dangling
``query-ch`` entry point (/root/reference/pyproject.toml:33 declares
``scripts.query_clickhouse:main`` but the file does not exist).

    python -m realtime_analytics_with_kafka_clickhouse_spark.cli --list
    python -m realtime_analytics_with_kafka_clickhouse_spark.cli q1_pricing_summary
    python -m realtime_analytics_with_kafka_clickhouse_spark.cli hourly_trend --explain
    python -m realtime_analytics_with_kafka_clickhouse_spark.cli --sql "SELECT count(*) FROM events"
    python -m realtime_analytics_with_kafka_clickhouse_spark.cli --maintain /data/orders \
        --kind partitioned --ttl-cutoff "2025-01-01 00:00:00"

``--sql`` registers every testdata table as a temp view first, so raw SQL
works like the Metabase path (SURVEY.md §3.3).  ``--maintain`` runs one
scheduled-maintenance pass (storage.maintenance: swap repair + TTL +
compaction, or txlog OPTIMIZE + VACUUM) — the runnable analog of the
reference's declarative TTL/merge settings
(/root/reference/clickhouse/init/01_init.sql:28-31).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run a named engine query or ad-hoc SQL")
    p.add_argument("query", nargs="?", help="query name from the registry")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="testdata directory")
    p.add_argument("--list", action="store_true", help="list available queries")
    p.add_argument("--explain", action="store_true", help="print the formatted plan instead of rows")
    p.add_argument("--sql", help="run raw SQL over the registered testdata views")
    p.add_argument("--limit", type=int, default=20, help="max rows to show")
    m = p.add_argument_group("maintenance (storage.maintenance.run_maintenance)")
    m.add_argument("--maintain", metavar="TABLE_PATH", help="run one maintenance pass over a table")
    m.add_argument("--kind", choices=["partitioned", "txlog"], default="partitioned")
    m.add_argument("--ttl-cutoff", help="ISO timestamp; rows older than this expire (partitioned)")
    m.add_argument("--ttl-group-by", help="comma-separated keys: expired rows ROLL UP per key instead of deleting")
    m.add_argument("--ttl-sum-cols", help="comma-separated measure columns summed by the rollup TTL")
    m.add_argument("--target-file-bytes", type=int, default=128 * 1024 * 1024)
    m.add_argument("--sort-cols", help="comma-separated sort columns for compaction locality")
    m.add_argument("--keep-versions", type=int, default=2, help="txlog versions vacuum keeps")
    return p


def main(argv: list[str] | None = None) -> int:
    from .operators import registry

    args = build_parser().parse_args(argv)
    queries = registry()

    if args.list:
        for name in sorted(queries):
            print(name)
        return 0

    from .session import get_spark
    from .sources.tables import load_table
    from .schemas import TESTDATA_TABLES

    spark = get_spark("cli")
    if args.maintain:
        import json

        from .storage.maintenance import run_maintenance

        report = run_maintenance(
            spark,
            args.maintain,
            kind=args.kind,
            ttl_cutoff=args.ttl_cutoff,
            ttl_group_by=args.ttl_group_by.split(",") if args.ttl_group_by else None,
            ttl_sum_cols=args.ttl_sum_cols.split(",") if args.ttl_sum_cols else None,
            target_file_bytes=args.target_file_bytes,
            sort_cols=args.sort_cols.split(",") if args.sort_cols else None,
            keep_versions=args.keep_versions,
        )
        print(json.dumps(report))
        return 0
    if args.sql:
        for t in TESTDATA_TABLES:
            load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        df = spark.sql(args.sql)
    elif args.query:
        if args.query not in queries:
            print(f"unknown query: {args.query} (use --list)")
            return 2
        df = queries[args.query](spark, args.sf_dir)
    else:
        build_parser().print_help()
        return 2

    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
