"""Semantics pins for the r8 work (beyond the DuckDB parity suite).

- Trained PQ codebooks: the fit returns the full PQ_M x PQ_K shape
  (emptied codewords keep their previous centroid — never dropped, so
  code ids stay positional in both engines), training actually MOVES
  the codebook off its sampled init, and recall@5 clears a floor the
  untrained variant measurably missed (~0.16 on this fixture).
- Residual IVFPQ: member codes are computed on (vector - own-cell
  centroid) residuals; every residual component is round-6 by
  definition (the exact-decimal-fold portability convention).
"""

from __future__ import annotations

from tests.conftest import SF_DIR as SF_DIR_SMALL
from tests.conftest import SF_DIR_ORACLE

PQ_TRAINED_RECALL_FLOOR = 0.25  # untrained sampled-init measured ~0.16


def test_pq_fit_full_shape_and_moves(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUB,
        _pq_fit,
        _pq_src,
    )

    for residual in (False, True):
        cbs = _pq_fit(spark, SF_DIR_SMALL, residual=residual)
        assert len(cbs) == PQ_M
        assert all(len(cb_m) == PQ_K for cb_m in cbs)
        assert all(len(cw) == PQ_SUB for cb_m in cbs for cw in cb_m)
    # training must move the raw codebook off the sampled init
    init = sorted(
        _pq_src(spark, SF_DIR_SMALL, residual=False)
        .orderBy("vec_id")
        .limit(PQ_K)
        .collect(),
        key=lambda r: r["vec_id"],
    )
    init_cb0 = [list(r["vecd"][:PQ_SUB]) for r in init]
    trained = _pq_fit(spark, SF_DIR_SMALL, residual=False)
    assert trained[0] != init_cb0


def test_pq_trained_recall_floor(spark):
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        ann_pq_recall_at_k,
    )

    mean_recall = (
        ann_pq_recall_at_k(spark, SF_DIR_ORACLE)
        .agg(F.avg("recall_at_k"))
        .collect()[0][0]
    )
    assert mean_recall >= PQ_TRAINED_RECALL_FLOOR, mean_recall


def test_ivfpq_residuals_round6(spark):
    """Member residuals are round-6 by definition: re-rounding must be
    the identity."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        _pq_src,
    )

    src = _pq_src(spark, SF_DIR_SMALL, residual=True)
    n_bad = src.filter(
        F.exists(
            F.transform("vecd", lambda x: F.round(x, 6) != x), lambda b: b
        )
    ).count()
    assert n_bad == 0
