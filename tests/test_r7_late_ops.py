"""Semantics pins for the r7-late operators (beyond the DuckDB parity
suite, which proves cross-engine equality but not the CLAIMED semantics).

- event_sequence_counts rests on "greedy first-A-then-first-B scan ==
  non-overlapping lazy-regex count of 'A.*?B'": prove it against a
  literal state-machine reference over exhaustive short strings and
  random long ones.
- source_quota_cap: char budget respected, under-quota sources pass
  through whole, capped iff over the mean char volume — and the fixture
  must exercise BOTH branches or the flag is decorative.
- customer_blocking_linkage: canonical a<b, distance bound respected,
  and pairs never cross a block boundary.
- leakage_safe_split: zero cross-split near-dup pairs by construction,
  while the naive per-doc split demonstrably leaks.
"""

from __future__ import annotations

import itertools
import random
import re

from tests.conftest import SF_DIR as SF_DIR_SMALL


def _greedy_scan_count(s: str) -> int:
    """ClickHouse sequenceCount's scan: first A, then first B after it,
    count, reset."""
    count, want = 0, "A"
    for ch in s:
        if ch == want:
            if want == "A":
                want = "B"
            else:
                count += 1
                want = "A"
    return count


def test_lazy_regex_equals_greedy_scan_exhaustive():
    for n in range(0, 10):
        for tup in itertools.product("AB", repeat=n):
            s = "".join(tup)
            assert len(re.findall("A.*?B", s)) == _greedy_scan_count(s), s


def test_lazy_regex_equals_greedy_scan_random_long():
    rng = random.Random(7)
    for _ in range(200):
        s = "".join(rng.choice("AB") for _ in range(rng.randint(50, 400)))
        assert len(re.findall("A.*?B", s)) == _greedy_scan_count(s)


def test_spark_regexp_count_is_nonoverlapping_lazy(spark):
    from pyspark.sql import functions as F

    cases = ["", "B", "A", "AB", "ABAB", "AABB", "ABBA", "BAAB", "AABBAB"]
    df = spark.createDataFrame([(s,) for s in cases], ["s"]).select(
        "s", F.regexp_count("s", F.lit("A.*?B")).alias("n")
    )
    got = {r["s"]: r["n"] for r in df.collect()}
    assert got == {s: _greedy_scan_count(s) for s in cases}


def test_source_quota_cap_invariants(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.curation import (
        source_quota_cap,
    )

    rows = source_quota_cap(spark, SF_DIR_SMALL).collect()
    assert rows  # every source appears (capped-to-zero sources included)
    for r in rows:
        assert r["kept_chars"] <= r["quota_chars"]  # budget respected
        assert r["kept_docs"] <= r["total_docs"]
        assert r["capped"] == int(r["total_chars"] > r["quota_chars"])
        if not r["capped"]:  # under-quota sources pass through whole
            assert r["kept_docs"] == r["total_docs"]
            assert r["kept_chars"] == r["total_chars"]
        else:
            assert r["kept_chars"] < r["total_chars"]
    # the fixture must exercise BOTH branches or the flag is decorative
    flags = {r["capped"] for r in rows}
    assert flags == {0, 1}


def test_blocking_linkage_pair_contract(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.relational import (
        ER_EDIT_MAX,
        customer_blocking_linkage,
    )

    rows = customer_blocking_linkage(spark, SF_DIR_SMALL).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["custkey_a"] < r["custkey_b"]  # canonical, no mirror dupes
        assert 0 <= r["edit_distance"] <= ER_EDIT_MAX
        key = (r["custkey_a"], r["custkey_b"])
        assert key not in seen
        seen.add(key)


def test_event_type_transitions_conservation(spark):
    """Total transitions == total events minus one per user with >= 1
    event — the adjacency-count conservation law."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        event_type_transitions,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    total = (
        event_type_transitions(spark, SF_DIR_SMALL)
        .agg(F.sum("n_transitions"))
        .collect()[0][0]
    )
    ev = load_table(spark, SF_DIR_SMALL, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_leakage_safe_split_guarantees(spark):
    """Safe split: zero cross-split near-dup pairs, while the naive
    per-doc split leaks some (else the operator is decorative); doc
    counts conserve the corpus."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.curation import (
        leakage_safe_split,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    rows = leakage_safe_split(spark, SF_DIR_SMALL).collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    assert all(r["safe_leaky_pairs"] == 0 for r in rows)
    assert all(r["naive_leaky_pairs"] > 0 for r in rows)
    n_docs = load_table(spark, SF_DIR_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
