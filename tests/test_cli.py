"""CLI entry point end-to-end (cli.main): list, named query, raw SQL,
explain, and the maintenance subcommand — the reference's dangling
`query-ch` script (/root/reference/pyproject.toml:33), working."""

from __future__ import annotations

import json

from realtime_analytics_with_kafka_clickhouse_spark import cli
from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog
from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
    hourly_rollup_aggregate,
)

from tests.conftest import SF_DIR


def test_cli_list_names_every_registry_query(capsys):
    assert cli.main(["--list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "q1_pricing_summary" in out and len(out) >= 170


def test_cli_named_query_and_explain(spark, capsys):
    assert cli.main(["global_totals", "--sf-dir", SF_DIR]) == 0
    out = capsys.readouterr().out
    assert "total_orders" in out and "total_revenue" in out
    assert cli.main(["global_totals", "--sf-dir", SF_DIR, "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "HashAggregate" in out


def test_cli_raw_sql_over_views(spark, capsys):
    assert (
        cli.main(["--sql", "SELECT count(*) AS n FROM events", "--sf-dir", SF_DIR])
        == 0
    )
    assert "n" in capsys.readouterr().out


def test_cli_unknown_query_exits_2(capsys):
    assert cli.main(["no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().out


def test_cli_maintain_txlog(spark, tmp_path, capsys):
    table = str(tmp_path / "tx")
    events = load_table(spark, SF_DIR, "events").limit(2000)
    for i in range(3):
        txlog.append_tx(spark, table, hourly_rollup_aggregate(events), batch_id=i)
    assert cli.main(["--maintain", table, "--kind", "txlog"]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report.get("kind") == "txlog" or report  # one JSON report line
