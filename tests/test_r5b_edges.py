"""Edge coverage for the late-round-5 operators (EWMA, anomaly flags, HLL
sketch rollup, UDTF expansion) on planted frames patched through
``load_table`` — behaviors the shared fixtures can't pin."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.operators import (
    text,
    timeseries,
    windows,
)


def _patch(monkeypatch, module, tables):
    monkeypatch.setattr(module, "load_table", lambda _s, _d, name: tables[name])


def _orders(spark, day_prices):
    rows = [
        (i, datetime.datetime(2024, 1, d), float(p))
        for i, (d, p) in enumerate(day_prices)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )


def test_ewma_first_day_equals_revenue(spark, monkeypatch):
    """Day 1 has only its own weight (1.0): the EWMA equals the revenue
    itself, floor-truncated at 6 places."""
    _patch(monkeypatch, windows, {"orders": _orders(spark, [(1, 100.0), (2, 50.0)])})
    rows = {r["order_date"].isoformat(): r
            for r in windows.ewma_daily_revenue(spark, "x").collect()}
    assert rows["2024-01-01"]["revenue_ewma"] == 100.0
    # day 2: (0.5*100 + 1*50) / 1.5 = 66.666666... -> floored at 6 places
    assert rows["2024-01-02"]["revenue_ewma"] == 66.666666


def test_ewma_converges_to_constant_series(spark, monkeypatch):
    """A constant series must have EWMA == the constant on every day (all
    weights cancel) — catches any normalization drift."""
    _patch(monkeypatch, windows, {"orders": _orders(spark, [(d, 10.0) for d in range(1, 26)])})
    for r in windows.ewma_daily_revenue(spark, "x").collect():
        assert r["revenue_ewma"] == 10.0


def test_anomaly_needs_three_trailing_days(spark, monkeypatch):
    """n_trailing < 3 can never flag (variance undefined/degenerate)."""
    _patch(monkeypatch, windows, {"orders": _orders(spark, [(1, 10.0), (2, 99999.0), (3, 10.0)])})
    rows = sorted(windows.revenue_anomaly_days(spark, "x").collect(),
                  key=lambda r: r["order_date"])
    assert [r["n_trailing"] for r in rows] == [0, 1, 2]
    assert not any(r["is_anomaly"] for r in rows)


def test_anomaly_flags_spike_and_zero_variance(spark, monkeypatch):
    """A flat baseline (zero variance) followed by any deviation is an
    anomaly: lhs > 0 = rhs; the flat days themselves are not (0 > 0 fails)."""
    prices = [(d, 10.0) for d in range(1, 8)] + [(8, 11.0)]
    _patch(monkeypatch, windows, {"orders": _orders(spark, prices)})
    rows = {r["order_date"].isoformat(): r["is_anomaly"]
            for r in windows.revenue_anomaly_days(spark, "x").collect()}
    assert rows["2024-01-08"] is True
    assert rows["2024-01-07"] is False


def test_sketch_rollup_contract_holds(spark, monkeypatch):
    """Planted frame: 2 days x 2 hours with overlapping users — the merged
    daily estimate must satisfy the 2% contract and the exact counts are
    the per-day distincts."""
    rows = []
    eid = 0
    for day in (1, 2):
        for hour in (3, 4):
            for u in range(1, 8):
                rows.append((eid, datetime.datetime(2024, 1, day, hour), u * day))
                eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    _patch(monkeypatch, timeseries, {"events": events})
    out = {r["day"].isoformat(): r
           for r in timeseries.sketch_rollup_distinct_users(spark, "x").collect()}
    assert out["2024-01-01"]["exact_users"] == 7
    assert out["2024-01-02"]["exact_users"] == 7
    assert all(r["merged_sketch_within_2pct"] for r in out.values())


def test_split_sentences_udtf_empty_and_dense_ix(spark, monkeypatch):
    """Docs with empty text or consecutive separators: no empty sentences
    emitted, indices stay dense from 0 per doc."""
    docs = spark.createDataFrame(
        [(1, "a. b.. c. "), (2, ""), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    _patch(monkeypatch, text, {"documents": docs})
    out = text.split_sentences_udtf(spark, "x").collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["sentence_ix"])):
        by_doc.setdefault(r["doc_id"], []).append(r["sentence"])
    # "a. b.. c. ".split(". ") == ["a", "b.", "c", ""] — the empty tail drops
    assert by_doc[1] == ["a", "b.", "c"]
    assert 2 not in by_doc and 3 not in by_doc
    assert by_doc[4] == ["solo"]
    for doc_id, sents in by_doc.items():
        ixs = [r["sentence_ix"] for r in out if r["doc_id"] == doc_id]
        assert sorted(ixs) == list(range(len(sents)))
