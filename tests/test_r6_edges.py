"""Round-6 edge and plan-regression tests.

Pins the round-6 scale fixes as plan facts:
- ngram_jaccard_pairs broadcasts the FREQUENT shingle set via left_anti
  (never the corpus-sized rare set);
- keyed-merge (Replacing/Collapsing/VersionedCollapsing) rewrites only the
  hash buckets present in a micro-batch, leaving other bucket dirs
  untouched on disk.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from realtime_analytics_with_kafka_clickhouse_spark.plans.inspect import formatted_plan

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_jaccard_anti_join_broadcasts_frequent_set(spark, queries):
    # The dropped (frequent, df > cap) set is bounded at shingle_rows/cap
    # members and is the ONLY safe broadcast side; the kept rare set is
    # vocabulary-sized.  Pin: the df-cap is applied as a broadcast
    # LeftAnti with the frequent set on the build side.
    df = queries["ngram_jaccard_pairs"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan
