"""Semantic invariants for the curation operators (oracle parity lives in
test_oracle_parity.py; these pin the properties parity can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.operators.curation import (
    SHARD_TOKEN_BUDGET,
    dedup_keep_best,
    lang_balance_resample,
    pack_training_shards,
)
from realtime_analytics_with_kafka_clickhouse_spark.operators.dedup import (
    near_dup_clusters,
)
from realtime_analytics_with_kafka_clickhouse_spark.operators.text import quality_score
from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

from tests.conftest import SF_DIR_ORACLE


def test_pack_shards_are_budget_bounded_and_contiguous(spark):
    rows = pack_training_shards(spark, SF_DIR_ORACLE).orderBy("doc_id").collect()
    # Global cumsum is strictly increasing and consistent with n_tokens.
    cum = 0
    for r in rows:
        cum += r.n_tokens
        assert r.cum_tokens == cum
    # A shard's preceding-token span fits the budget definition: the shard
    # index is the budget-quotient of the tokens packed before the doc.
    for r in rows:
        assert r.shard_id == (r.cum_tokens - r.n_tokens) // SHARD_TOKEN_BUDGET
    # Shard ids are contiguous from 0.
    shard_ids = sorted({r.shard_id for r in rows})
    assert shard_ids == list(range(len(shard_ids)))


def test_dedup_keep_best_one_survivor_per_cluster(spark):
    kept = dedup_keep_best(spark, SF_DIR_ORACLE)
    clusters = near_dup_clusters(spark, SF_DIR_ORACLE)
    quality = quality_score(spark, SF_DIR_ORACLE)
    n_docs = load_table(spark, SF_DIR_ORACLE, "documents").count()
    n_members = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    # Every cluster contributes exactly one doc; loners pass through.
    assert kept.count() == n_docs - n_members + n_clusters
    assert kept.select("doc_id").distinct().count() == kept.count()
    # The survivor has the max quality of its cluster (doc_id tiebreak).
    best = {
        r.cluster_id: (r.quality_score, r.doc_id)
        for r in kept.join(clusters.select("doc_id").distinct(), "doc_id").collect()
    }
    members = clusters.join(quality.select("doc_id", "quality_score"), "doc_id")
    for m in members.collect():
        q, d = best[m.cluster_id]
        assert (q, -d) >= (m.quality_score, -m.doc_id)


def test_lang_balance_moves_toward_uniform(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {
        r.lang: r.n
        for r in lang_balance_resample(spark, SF_DIR_ORACLE)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    min_before = min(before.values())
    # Every language is downsampled toward the minority count: kept counts
    # land within hash-sampling noise of min_before (binomial, n <= 218).
    for lang, n_after in after.items():
        assert n_after <= before[lang]
        assert abs(n_after - min_before) <= 25, (lang, n_after, min_before)
    # The dominant language was actually reduced.
    dominant = max(before, key=before.get)
    assert after[dominant] < before[dominant] * 0.55


def test_ann_recall_vs_exact_baseline(spark):
    """Quality contract for the approximate ANN family: recall@5 against
    the exact brute-force baseline.

    The fixture embeddings are near-ISOTROPIC (measured: every k-means
    cell contains all 10 labels, and label-cell IVF recall is ~0.10 —
    there is no geometric cluster structure to exploit), so any
    partition-based index is bounded near probe/K on this data.  The
    contract is therefore relative, not absolute: the TRAINED quantizer
    with probe=2 must (a) clear the probe/K floor with headroom — i.e.
    the learned cells beat random partitioning — and (b) beat the
    label-cell probe-1 index.  On a corpus with real cluster structure
    the same index recalls far higher; this pins that the machinery
    works, on the hardest distribution."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators import similarity

    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity.ann_cosine_topk(spark, SF_DIR_ORACLE).collect()
    }
    ivf = {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity.ann_ivf_kmeans(spark, SF_DIR_ORACLE).collect()
    }
    lab = {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity.ann_ivf_topk(spark, SF_DIR_ORACLE).collect()
    }
    recall_ivf = len(exact & ivf) / len(exact)
    recall_lab = len(exact & lab) / len(exact)
    floor = 2.0 / similarity.KMEANS_K  # probe/K — random-partition expectation
    assert recall_ivf >= floor + 0.1, (
        f"trained IVF no better than random cells: {recall_ivf:.3f}"
    )
    assert recall_ivf > recall_lab, (
        f"trained quantizer ({recall_ivf:.3f}) must beat "
        f"label cells ({recall_lab:.3f})"
    )


def test_cc_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The adaptive CC must produce identical components whichever side of
    the CC_DRIVER_MAX_EDGES bound the measured pair count lands on."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators import dedup

    via_driver = sorted(
        map(tuple, near_dup_clusters(spark, SF_DIR_ORACLE).collect())
    )
    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", -1)  # force the loop
    via_loop = sorted(
        map(tuple, near_dup_clusters(spark, SF_DIR_ORACLE).collect())
    )
    assert via_driver == via_loop
    assert via_driver, "fixture must produce at least one near-dup cluster"
