"""Driver-side memo (_memo.py): correctness of the fingerprint-keyed cache.

The memo serves k-means fits and CC labels across queries; the one way it
can be WRONG is serving a stale artifact after the underlying parquet was
rewritten at the same path.  These tests pin the invalidation contract.
"""

from __future__ import annotations

import shutil
import time

from realtime_analytics_with_kafka_clickhouse_spark.operators import _memo

from tests.conftest import SF_DIR


def test_memo_hits_without_recompute(tmp_path):
    d = str(tmp_path)
    shutil.copy(f"{SF_DIR}/documents.parquet", f"{d}/documents.parquet")
    calls = []
    v1 = _memo.memo_get("t_hit", d, ("documents",), lambda: calls.append(1) or "a")
    v2 = _memo.memo_get("t_hit", d, ("documents",), lambda: calls.append(1) or "b")
    assert v1 == v2 == "a"
    assert len(calls) == 1


def test_memo_invalidates_on_rewrite(tmp_path):
    d = str(tmp_path)
    shutil.copy(f"{SF_DIR}/documents.parquet", f"{d}/documents.parquet")
    v1 = _memo.memo_get("t_inval", d, ("documents",), lambda: "old")
    # Rewrite the file with different bytes (size changes -> fingerprint
    # changes even on filesystems with coarse mtime resolution).
    time.sleep(0.01)
    shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{d}/documents.parquet")
    v2 = _memo.memo_get("t_inval", d, ("documents",), lambda: "new")
    assert v1 == "old" and v2 == "new"


def test_memo_single_slot_per_kind(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", str(a / "documents.parquet"))
    shutil.copy(f"{SF_DIR}/documents.parquet", str(b / "documents.parquet"))
    _memo.memo_get("t_slot", str(a), ("documents",), lambda: "va")
    _memo.memo_get("t_slot", str(b), ("documents",), lambda: "vb")  # evicts a
    assert sum(1 for k in _memo._MEMO if k[0] == "t_slot") == 1
    # a's entry was evicted -> recompute, not a stale hit
    again = _memo.memo_get("t_slot", str(a), ("documents",), lambda: "va2")
    assert again == "va2"


def test_kmeans_fit_is_memoized(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators import similarity

    f1 = similarity._kmeans_fit(spark, SF_DIR)
    t0 = time.perf_counter()
    f2 = similarity._kmeans_fit(spark, SF_DIR)
    assert time.perf_counter() - t0 < 0.1  # pure cache hit, no Spark job
    assert f1 is f2


def test_exact_ann_ground_truth_is_memoized(spark):
    """The 5 recall gates share ONE exact-baseline derivation per
    embeddings fingerprint: second call must be a pure memo hit (the
    pair list is reused; only a createDataFrame on the driver runs)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators import _memo, similarity

    n_q1, df1 = similarity._exact_cosine_ground_truth(spark, SF_DIR)
    hit = _memo.memo_peek("exact_cosine_topk_pairs", SF_DIR, ("embeddings",))
    assert not _memo.is_miss(hit)
    t0 = time.perf_counter()
    n_q2, _ = similarity._exact_cosine_ground_truth(spark, SF_DIR)
    assert time.perf_counter() - t0 < 0.5  # no Spark job on the hit path
    assert n_q1 == n_q2 and n_q1 > 0
    assert df1.count() == hit["n_pairs"]

    similarity._exact_l2_ground_truth(spark, SF_DIR)
    l2 = _memo.memo_peek("exact_l2_topk_pairs", SF_DIR, ("embeddings",))
    assert not _memo.is_miss(l2) and l2["n_pairs"] > 0
