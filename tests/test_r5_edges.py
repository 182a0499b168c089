"""Edge coverage for the round-5 operators: behaviors the shared fixtures
can't exercise (degenerate distributions, single groups, boundary windows),
pinned on planted frames patched through ``load_table``."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.operators import (
    curation,
    dedup,
    text,
    timeseries,
)


def _patch(monkeypatch, module, tables):
    monkeypatch.setattr(module, "load_table", lambda _s, _d, name: tables[name])


def test_value_histogram_degenerate_single_value(spark, monkeypatch):
    """All-equal values: the 1e-30 width guard must put every row in bin 0
    instead of dividing by zero."""
    events = spark.createDataFrame(
        [(i, 7.5) for i in range(5)], "event_id long, value double"
    )
    _patch(monkeypatch, timeseries, {"events": events})
    rows = timeseries.value_histogram(spark, "ignored").collect()
    assert len(rows) == 1
    assert rows[0]["bin"] == 0 and rows[0]["n_events"] == 5


def test_value_histogram_max_clamps_into_last_bin(spark, monkeypatch):
    events = spark.createDataFrame(
        [(i, float(i)) for i in range(11)], "event_id long, value double"
    )  # values 0..10, width 1 per bin; value 10 would index bin 10 -> clamp 9
    _patch(monkeypatch, timeseries, {"events": events})
    by_bin = {r["bin"]: r["n_events"] for r in timeseries.value_histogram(spark, "x").collect()}
    assert by_bin[9] == 2  # values 9 and 10 share the last bin
    assert sum(by_bin.values()) == 11


def test_temperature_mix_weights_single_language(spark, monkeypatch):
    """One language: weight must normalize to exactly 1.0 and expected
    docs to the full corpus."""
    docs = spark.createDataFrame(
        [(i, "en", "s", "a b") for i in range(4)],
        "doc_id long, lang string, source string, text string",
    )
    _patch(monkeypatch, curation, {"documents": docs})
    (row,) = curation.temperature_mix_weights(spark, "ignored").collect()
    assert row["mix_weight"] == 1.0 and row["expected_docs"] == 4


def test_funnel_steps_window_boundary_inclusive(spark, monkeypatch):
    """A step event EXACTLY at t_prev + 24h still counts (inclusive
    boundary), one microsecond past does not."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    day = dt.timedelta(hours=24)
    us = dt.timedelta(microseconds=1)
    events = spark.createDataFrame(
        [
            # user 1: view exactly at the boundary -> completes step 2
            (1, t0, 1, "signup"), (2, t0 + day, 1, "view"),
            # user 2: view one microsecond past -> stuck at step 1
            (3, t0, 2, "signup"), (4, t0 + day + us, 2, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    _patch(monkeypatch, timeseries, {"events": events})
    got = {
        r["steps_completed"]: r["n_users"]
        for r in timeseries.funnel_steps(spark, "ignored").collect()
    }
    assert got == {1: 1, 2: 1}


def test_cohort_retention_offsets(spark, monkeypatch):
    """Two cohorts, partial return: retention fractions exact."""
    import datetime as dt

    def ts(d, h=0):
        return dt.datetime(2026, 1, d, h)

    rows = [
        # cohort day 1: users 1,2 buy; only user 1 returns on day 3
        (1, ts(1), 1, "purchase"), (2, ts(1, 5), 2, "purchase"),
        (3, ts(3), 1, "purchase"),
        # cohort day 2: user 3
        (4, ts(2), 3, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    _patch(monkeypatch, timeseries, {"events": events})
    got = {
        (r["day_offset"], r["cohort_users" if False else "active_users"], r["retention"])
        for r in timeseries.cohort_retention(spark, "ignored").collect()
        if r["day_offset"] > 0
    }
    assert got == {(2, 1, 0.5)}  # day-1 cohort of 2, 1 back at offset 2


def test_union_find_merges_chains_to_min_label(spark):
    labels = dict(dedup.union_find_labels([(5, 3), (3, 1), (9, 7), (7, 5)]))
    assert labels == {1: 1, 3: 1, 5: 1, 7: 1, 9: 1}
    labels = dict(dedup.union_find_labels([(2, 2), (4, 6)]))
    assert labels == {2: 2, 4: 4, 6: 4}


def test_bm25_zero_hit_docs_excluded(spark, monkeypatch):
    """Documents containing no query term score 0 and must be filtered."""
    docs = spark.createDataFrame(
        [(1, "spark table join fast"), (2, "nothing relevant here"), (3, "join join")],
        "doc_id long, text string",
    )
    _patch(monkeypatch, text, {"documents": docs})
    got = {r["doc_id"] for r in text.bm25_topk(spark, "ignored").collect()}
    assert got == {1, 3}


def test_vocab_oov_rate_all_in_vocab(spark, monkeypatch):
    """A corpus with <= VOCAB_TOP distinct words has zero OOV everywhere."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    _patch(monkeypatch, text, {"documents": docs})
    rates = [r["oov_rate"] for r in text.vocab_oov_rate(spark, "ignored").collect()]
    assert rates == [0.0, 0.0]
