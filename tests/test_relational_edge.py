"""Non-vacuous coverage for logic the shared fixture can't exercise.

The sf fixtures give every customer at least one order, so on them
q22_idle_rich_customers / customers_without_orders verify trivially (0 rows
hash-matches 0 rows without touching the anti-join or the scalar-subquery
filter).  Here the tables are synthetic frames planted with order-less
customers, patched in through ``load_table``, so the logic itself is pinned.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.operators import relational, timeseries


@pytest.fixture
def planted_tables(spark):
    """customer/orders with order-less customers at every balance level."""
    cust = spark.createDataFrame(
        [
            # custkey, name, mktsegment, acctbal
            (1, "c1", "BUILDING", 9000.0),   # rich, has orders
            (2, "c2", "BUILDING", 8000.0),   # rich, NO orders  -> q22
            (3, "c3", "MACHINERY", 7000.0),  # rich, NO orders  -> q22
            (4, "c4", "MACHINERY", 100.0),   # poor, NO orders  -> anti only
            (5, "c5", "HOUSEHOLD", -50.0),   # negative bal, no orders
            (6, "c6", "HOUSEHOLD", 50.0),    # poor, has orders
        ],
        "c_custkey long, c_name string, c_mktsegment string, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [
            # c1: recent orders; c6: only a PRE-cutoff order (idle under the
            # 1999-01-01 recency window, but still "with orders" ever)
            (100, 1, 10.0, "2000-01-01 00:00:00"),
            (101, 1, 20.0, "2000-06-01 00:00:00"),
            (102, 6, 30.0, "1996-01-01 00:00:00"),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    tables = {"customer": cust, "orders": orders}
    return lambda _spark, _sf, name: tables[name]


def test_q22_idle_rich_customers_non_vacuous(spark, planted_tables, monkeypatch):
    monkeypatch.setattr(relational, "load_table", planted_tables)
    got = {
        (r["c_mktsegment"], r["n_customers"], float(r["total_balance"]))
        for r in relational.q22_idle_rich_customers(spark, "ignored").collect()
    }
    # avg positive balance = (9000+8000+7000+100+50)/5 = 4830; rich = c1,c2,c3;
    # idle rich = c2 (BUILDING), c3 (MACHINERY).
    assert got == {("BUILDING", 1, 8000.0), ("MACHINERY", 1, 7000.0)}


def test_customers_without_orders_non_vacuous(spark, planted_tables, monkeypatch):
    monkeypatch.setattr(relational, "load_table", planted_tables)
    got = {r["c_custkey"] for r in relational.customers_without_orders(spark, "x").collect()}
    # c6's only order predates the recency cutoff -> idle under the window
    assert got == {2, 3, 4, 5, 6}
    with_orders = {r["c_custkey"] for r in relational.customers_with_orders(spark, "x").collect()}
    assert with_orders == {1, 6}


def test_event_feature_map_survives_colliding_props_keys(spark, monkeypatch):
    """A props bag carrying 'type'/'bucket' keys must not throw under
    spark.sql.mapKeyDedupPolicy=EXCEPTION: the built keys win, the
    colliding props entries are filtered out before map_concat."""
    rows = [
        (1, "purchase", json.dumps({"k": "7", "type": "EVIL", "bucket": "99", "z": "1"})),
        (2, "view", json.dumps({"k": "3"})),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    monkeypatch.setattr(timeseries, "load_table", lambda s, d, t: df)
    got = {r["event_id"]: r.asDict() for r in timeseries.event_feature_map(spark, "x").collect()}
    assert got[1]["type_val"] == "purchase"  # built key won
    assert got[1]["keys_sorted"] == "bucket,k,type,z"
    assert got[1]["n_keys"] == 4
    assert got[2]["keys_sorted"] == "bucket,k,type"
    assert got[2]["k_val"] == 3
