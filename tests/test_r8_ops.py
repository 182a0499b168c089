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


def test_scd2_stored_merge_replay_idempotent(spark):
    """The stored SCD2 history: out-of-order epoch merges converge to
    the one-shot derivation (append+merge == derive), and REPLAYING an
    epoch leaves the table row-for-row unchanged (the fold dedups by
    (key, seq))."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.relational import (
        cdc_scd2_history,
        scd2_change_log,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        _epoch_bucket_map,
        _fresh_rollup_dir,
        merge_scd2,
    )

    changes = scd2_change_log(spark, SF_DIR_SMALL).select(
        "order_id",
        F.col("seq").cast("long").alias("seq"),
        "op",
        "price",
        F.col("seq").cast("long").alias("valid_from_seq"),
        F.lit(None).cast("long").alias("valid_to_seq"),
        F.lit(True).alias("is_current"),
    )
    table_dir = _fresh_rollup_dir("scd2_replay_test")
    em = _epoch_bucket_map(changes, F.col("seq"), ["order_id"])
    for i in (1, 2, 0):
        merge_scd2(
            spark, table_dir, changes.filter(F.col("seq") == i),
            touched=em.get(i, []),
        )
    cols = ["order_id", "seq", "op", "price",
            "valid_from_seq", "valid_to_seq", "is_current"]
    before = sorted(map(tuple, spark.read.parquet(table_dir).select(*cols).collect()))
    # replay epoch 1 — must be a no-op on stored rows
    merge_scd2(
        spark, table_dir, changes.filter(F.col("seq") == 1),
        touched=em.get(1, []),
    )
    after = sorted(map(tuple, spark.read.parquet(table_dir).select(*cols).collect()))
    assert before == after
    # converged == one-shot derivation
    derived = sorted(
        map(tuple, cdc_scd2_history(spark, SF_DIR_SMALL)
            .select("order_id", "price", "valid_from_seq", "valid_to_seq", "is_current")
            .collect())
    )
    stored = sorted(
        (r[0], r[3], r[4], r[5], r[6]) for r in after if r[2] != "D"
    )
    assert stored == derived


def test_zorder_skewed_column_cannot_collapse_other_dimension(spark, tmp_path):
    """compact_tx_zorder's equi-depth rank claim under HEAVY skew: with
    90% of rows sharing one value of the first clustering column, the
    second (uniform) column's pruning must stay tight — skew in one
    dimension must not collapse the other — and a range prune on the
    skewed column's tail must still skip directories.  Exactness holds
    under both prunes."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        # 90% of rows pile on skew_key=7; the tail spreads over 8..500
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise((F.col("id") % 493) + 8)
        .cast("long")
        .alias("skew_key"),
        (F.col("id") % 1000).cast("double").alias("uniform_val"),
    )
    table = str(tmp_path / "zorder_skew")
    txlog.append_tx(
        spark, table, df, batch_id=0, stats_cols=["skew_key", "uniform_val"]
    )
    txlog.compact_tx_zorder(
        spark, table, ["skew_key", "uniform_val"], n_buckets=8, levels=8
    )

    def dirs(df_):
        return {f.rsplit("/", 2)[-2] for f in df_.inputFiles()}

    total = len(dirs(txlog.read_table(spark, table)))
    assert total >= 4
    # uniform column prunes tightly despite the other column's skew
    un = txlog.read_table(spark, table, prune={"uniform_val": (0.0, 100.0)})
    assert len(dirs(un)) <= total / 2, (len(dirs(un)), total)
    # the skewed column's tail range still skips directories
    tail = txlog.read_table(spark, table, prune={"skew_key": (400, 500)})
    assert len(dirs(tail)) < total, (len(dirs(tail)), total)
    # exactness under each prune (both result sets non-empty)
    full = txlog.read_table(spark, table)
    for pr, flt in (
        ({"uniform_val": (0.0, 100.0)}, F.col("uniform_val") <= 100.0),
        (
            {"skew_key": (400, 500)},
            (F.col("skew_key") >= 400) & (F.col("skew_key") <= 500),
        ),
    ):
        pruned = txlog.read_table(spark, table, prune=pr)
        got = sorted(r["rid"] for r in pruned.filter(flt).collect())
        want = sorted(r["rid"] for r in full.filter(flt).collect())
        assert got == want and want, pr


def test_ivfpq_rerank_recovers_recall(spark):
    """The exact re-rank stage must not lose recall vs taking the ADC
    ranking at face value: recall(rerank top-k) >= recall(ADC top-k)
    within the same probed shortlist."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        _recall_vs_exact_l2,
        ann_ivfpq_rerank_topk,
        ann_ivfpq_topk,
    )
    from pyspark.sql import functions as F

    def mean_recall(approx):
        return (
            _recall_vs_exact_l2(spark, SF_DIR_ORACLE, approx)
            .agg(F.avg("recall_at_k"))
            .collect()[0][0]
        )

    adc = mean_recall(
        ann_ivfpq_topk(spark, SF_DIR_ORACLE).select("vec_id", "neighbor_id")
    )
    rr = mean_recall(
        ann_ivfpq_rerank_topk(spark, SF_DIR_ORACLE).select("vec_id", "neighbor_id")
    )
    assert rr >= adc, (rr, adc)


def test_minhash_index_ingest_index_complete_and_falsifiable(spark):
    """The stored-LSH ingest proof: the post-ingest index holds exactly
    the full-corpus signature rows (build + append == one-shot), the
    discovered pair set is non-empty and batch-touching only, and every
    batch-touching pair of the full LSH result is found (no recall loss
    from probing a stored index instead of self-joining)."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators import dedup
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    got = dedup.minhash_index_ingest(spark, SF_DIR_ORACLE).collect()
    assert got, "fixture must produce batch-touching near-dup pairs"
    m = dedup.INGEST_BATCH_MOD
    for r in got:
        assert r["doc_a"] % m == 0 or r["doc_b"] % m == 0
    full = dedup.minhash_near_dup(spark, SF_DIR_ORACLE).collect()
    want = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in full
        if r["doc_a"] % m == 0 or r["doc_b"] % m == 0
    )
    assert len(want) < len(full), "batch restriction must be a strict subset"
    assert sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in got) == want
    # index completeness: stored rows == full-corpus signatures
    sh = dedup._frequent_shingles_removed(
        dedup._doc_shingles(load_table(spark, SF_DIR_ORACLE, "documents"))
    )
    sig_all = sorted(map(tuple, dedup._minhash_signatures(sh).collect()))
    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        _fresh_rollup_dir,
    )

    # rebuild a fresh index the same way and verify content + replay no-op
    is_batch = F.col("doc_id") % m == 0
    idx = _fresh_rollup_dir("minhash_lsh_index_test")
    txlog.append_tx(spark, idx, dedup._minhash_signatures(sh.filter(~is_batch)), batch_id=0)
    txlog.append_tx(spark, idx, dedup._minhash_signatures(sh.filter(is_batch)), batch_id=1)
    assert not txlog.append_tx(  # replayed batch id must skip
        spark, idx, dedup._minhash_signatures(sh.filter(is_batch)), batch_id=1
    )
    stored = sorted(
        map(tuple, txlog.read_table(spark, idx).select("doc_id", "band", "sig").collect())
    )
    assert stored == sig_all


def test_global_shuffle_decorrelates_and_is_a_permutation(spark):
    """The shuffled order must be a true permutation (positions 0..n-1,
    each doc once) and actually DECORRELATE doc order: consecutive
    positions hold far-apart doc_ids on average, and every full shard
    draws from many sources."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.curation import (
        SHUFFLE_DOCS_PER_SHARD,
        global_shuffle_shards,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    out = global_shuffle_shards(spark, SF_DIR_ORACLE)
    rows = out.collect()
    n = len(rows)
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(n))
    assert len({r["doc_id"] for r in rows}) == n
    # decorrelation: mean adjacent doc_id gap ~ n/3 for a random
    # permutation; sequential order would give 1.  Assert >> sequential.
    by_pos = sorted(rows, key=lambda r: r["shuffle_pos"])
    gaps = [
        abs(b["doc_id"] - a["doc_id"])
        for a, b in zip(by_pos, by_pos[1:])
    ]
    assert sum(gaps) / len(gaps) > n / 10
    # every FULL shard mixes sources
    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "source")
    mix = (
        out.join(docs, "doc_id")
        .groupBy("shard_id")
        .agg(F.count("*").alias("n"), F.countDistinct("source").alias("ns"))
        .filter(F.col("n") == SHUFFLE_DOCS_PER_SHARD)
        .collect()
    )
    assert mix and all(r["ns"] >= 3 for r in mix)


# ---------------------------------------------------------------- r8c ops


def test_window_funnel_strict_binds_and_covers_all_levels(spark):
    """Falsifiability: the 24h window must BIND (distribution differs from
    the unbounded-window strict funnel) and all of levels 1..4 must occur
    at sf0.01 (probed: 12/102/31/5); user total conserved vs funnel_steps.

    NOTE strict counts are NOT dominated by funnel_steps': the min-chain
    funnel commits to each step's FIRST qualifying event, while strict
    scores every signup as a chain start — a later adjacent chain can
    outrank a stale first-signup anchor."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        _window_funnel_strict,
        funnel_steps,
        window_funnel_strict,
    )

    dist = {
        r["steps_completed"]: r["n_users"]
        for r in window_funnel_strict(spark, SF_DIR_ORACLE).collect()
    }
    assert set(dist) >= {1, 2, 3, 4}
    total_strict = sum(dist.values())
    total_minchain = (
        funnel_steps(spark, SF_DIR_ORACLE)
        .agg(F.sum("n_users").alias("n")).collect()[0]["n"]
    )
    assert total_strict == total_minchain
    unbounded = {
        r["steps_completed"]: r["n_users"]
        for r in _window_funnel_strict(
            spark, SF_DIR_ORACLE, "INTERVAL 3650 DAYS"
        ).collect()
    }
    assert dist != unbounded  # the 24h constraint prunes real chains
    # tightening the window can only LOWER each user's level: the
    # cumulative-from-above counts must dominate windowed ones.
    for k in (1, 2, 3, 4):
        windowed_ge = sum(v for lv, v in dist.items() if lv >= k)
        unbounded_ge = sum(v for lv, v in unbounded.items() if lv >= k)
        assert windowed_ge <= unbounded_ge, (k, windowed_ge, unbounded_ge)


def test_max_concurrent_intervals_sweep_invariants(spark):
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        ACTIVE_DAYS,
        max_concurrent_intervals,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    rows = max_concurrent_intervals(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 5  # one per region
    orders = load_table(spark, SF_DIR_ORACLE, "orders")
    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).collect()[0]
    n_orders = orders.count()
    for r in rows:
        # peak is attainable: positive, no larger than the region's orders,
        # and its date lies inside the swept horizon.
        assert 1 <= r["peak_concurrent"] <= n_orders
        assert lo <= r["peak_date"]
        assert (r["peak_date"] - hi).days <= ACTIVE_DAYS
        # a peak bounded by interval arithmetic: at most ACTIVE_DAYS'
        # worth of starts can overlap one instant, so the peak must be
        # strictly below the corpus total (falsifiable at sf0.01).
        assert r["peak_concurrent"] < n_orders


def test_weighted_percentiles_ordered_and_weighted_vs_unweighted(spark):
    """wp25<=wp50<=wp75, and the quantity weighting must MOVE at least one
    flag's median off the unweighted row-median (falsifiability: the
    weight is not a constant)."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        weighted_value_percentiles,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    rows = weighted_value_percentiles(spark, SF_DIR_ORACLE).collect()
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}
    for r in rows:
        assert r["wp25"] <= r["wp50"] <= r["wp75"]
        assert r["total_weight"] > 0
    li = load_table(spark, SF_DIR_ORACLE, "lineitem")
    unweighted = {
        r["l_returnflag"]: r["m"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
        .collect()
    }
    assert any(
        abs(r["wp50"] - unweighted[r["l_returnflag"]]) > 1e-9 for r in rows
    )
    # scale-shape pin: the row-level cumsum window partitions on
    # (flag, band) — never a per-flag global sort (3 tasks at 100 TB).
    plan = (
        weighted_value_percentiles(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    import re

    row_windows = [
        m for m in re.findall(r"windowspecdefinition\([^)]*\)", plan)
        if "l_extendedprice" in m  # the row-level cumsum spec
    ]
    assert row_windows and all("band" in m for m in row_windows), row_windows


def test_conditional_agg_rollup_branches_fire(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.rollups import (
        conditional_agg_rollup,
    )

    rows = conditional_agg_rollup(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["n_final"] > 0 and r["open_customers"] > 0
        assert r["open_revenue"] > 0 and r["max_urgent_price"] > 0
        assert r["avg_final_price"] > 0


def test_ngram_novelty_both_branches_and_bounds(spark):
    """df==1 and df>1 shingles must BOTH exist (novelty strictly between
    the degenerate all-unique / none-unique corpora), and ppm is the exact
    integer floor."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.dedup import (
        ngram_novelty_score,
    )

    rows = ngram_novelty_score(spark, SF_DIR_ORACLE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["novelty_ppm"] <= 1_000_000
        assert r["novelty_ppm"] == (r["n_unique"] * 1_000_000) // r["n_shingles"]
        assert r["n_unique"] <= r["n_shingles"]
    assert any(r["n_unique"] > 0 for r in rows)
    assert any(r["n_unique"] < r["n_shingles"] for r in rows)


def test_linear_probe_training_reduces_loss(spark):
    """The GD trainer must actually LEARN on the fixture: loss strictly
    drops from the zero-weight init, every weight moves off zero, and the
    learned MSE beats predicting the base rate only via the features
    (falsifiability: a no-op trainer would return mse_final == mse_init)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.curation import (
        quality_linear_probe_train,
    )

    row = quality_linear_probe_train(spark, SF_DIR_ORACLE).collect()[0]
    assert row["mse_final"] < row["mse_init"]
    for c in ("wb", "w1", "w2", "w3", "w4"):
        assert row[c] != 0.0, c
    # squared-loss floor sanity: MSE of any predictor is >= 0 and the
    # zero-init MSE equals the positive-class base rate avg(y^2)=avg(y).
    assert 0.0 <= row["mse_final"] < row["mse_init"] <= 1.0


def test_audio_vad_segments_invariants(spark):
    """Both VAD states and multi-segment docs must exist on the fixture
    (probed: 523 voiced / 279 unvoiced / 276 segments over 166 wav docs),
    and the per-doc counting identities must hold."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.multimodal import (
        audio_vad_segments,
    )

    rows = audio_vad_segments(spark, SF_DIR_ORACLE).collect()
    assert rows and all(r["doc_id"] % 3 == 2 for r in rows)  # wav rows only
    for r in rows:
        assert 0 <= r["n_voiced"] <= r["n_frames"]
        assert r["n_segments"] <= r["n_voiced"] or r["n_voiced"] == 0
        assert r["longest_voiced_run"] <= r["n_voiced"]
        if r["n_segments"] > 0:
            assert r["longest_voiced_run"] >= 1
            # pigeonhole: longest run >= avg voiced per segment
            assert r["longest_voiced_run"] * r["n_segments"] >= r["n_voiced"]
    assert any(r["n_voiced"] < r["n_frames"] for r in rows)  # unvoiced exist
    assert any(r["n_voiced"] > 0 for r in rows)              # voiced exist
    assert any(r["n_segments"] >= 2 for r in rows)           # merge logic fires


def test_error_recovery_asof_three_states(spark):
    """All three outcomes must exist on the fixture (probed: 672
    recovered / 1179 late / 163 never at sf0.01), recovery latency is
    within the 24h tolerance, and the strictly-after rule holds
    (latency > 0 unless the next purchase shares the error's (ts) —
    strictly-following ROWS frame admits equal-ts successors)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        error_recovery_asof,
    )

    rows = error_recovery_asof(spark, SF_DIR_ORACLE).collect()
    rec = [r for r in rows if r["recovered"]]
    not_rec = [r for r in rows if not r["recovered"]]
    assert rec and not_rec
    for r in rec:
        assert r["latency_sec"] is not None
        assert 0 <= r["latency_sec"] <= 24 * 3600
    assert all(r["latency_sec"] is None for r in not_rec)


def test_percentile_mv_append_merge_equals_one_shot(spark):
    """The quantile-MV lifecycle: compaction must actually reduce stored
    state rows (4 epochs of equal keys fold to one row per key), and the
    served percentiles equal the one-shot derivation from raw events —
    associativity of count addition, pinned end to end."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators import registry
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        PCTL_MV_BUCKET,
        percentile_merge_mv,
    )

    served = {
        r["day"]: (r["n_events"], r["p50_lo"], r["p90_lo"], r["p99_lo"])
        for r in percentile_merge_mv(spark, SF_DIR_SMALL).collect()
    }
    ev = load_table(spark, SF_DIR_SMALL, "events")
    import math

    by_day: dict = {}
    for r in ev.select(F.to_date("ts").alias("day"), "value").collect():
        by_day.setdefault(r["day"], []).append(
            math.floor(r["value"] / PCTL_MV_BUCKET)
        )
    assert set(served) == set(by_day)
    for day, buckets in by_day.items():
        buckets.sort()
        n = len(buckets)
        def q_lo(num, den):
            # smallest bucket lower edge where cw*den >= num*n
            seen = 0
            from collections import Counter
            for b, c in sorted(Counter(buckets).items()):
                seen += c
                if seen * den >= num * n:
                    return b * PCTL_MV_BUCKET
            raise AssertionError
        assert served[day] == (n, q_lo(1, 2), q_lo(9, 10), q_lo(99, 100)), day


def test_delta_sum_counter_semantics(spark):
    """deltaSum invariants + a pure-Python recompute of one user."""
    from decimal import Decimal

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        delta_sum_counters,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    rows = {r["user_id"]: r for r in delta_sum_counters(spark, SF_DIR_SMALL).collect()}
    assert rows
    # sum(all deltas) telescopes to net_change, so dropping the negative
    # ones can only increase the total: delta_sum >= max(net_change, 0).
    assert all(r["delta_sum"] >= max(r["net_change"], 0.0) for r in rows.values())
    # the fixture's values are non-monotone per user: resets must fire
    assert any(r["n_resets"] > 0 for r in rows.values())
    uid = min(rows)
    ev = sorted(
        load_table(spark, SF_DIR_SMALL, "events")
        .filter(f"user_id = {uid}")
        .select("ts", "event_id", "value")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    vals = [Decimal(str(round(r["value"], 6))) for r in ev]
    deltas = [b - a for a, b in zip(vals, vals[1:])]
    got = rows[uid]
    assert got["n_samples"] == len(vals)
    assert got["n_resets"] == sum(1 for d in deltas if d < 0)
    assert got["delta_sum"] == float(sum(d for d in deltas if d > 0))
    assert got["net_change"] == float(vals[-1] - vals[0])


def test_interval_union_length_invariants(spark):
    """Coverage-union invariants + falsifiability: both the merged-overlap
    and the multi-island branches must actually fire on the fixture."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        ACTIVE_DAYS,
        interval_union_length,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    res = {r["o_custkey"]: r for r in interval_union_length(spark, SF_DIR_SMALL).collect()}
    n_orders = {
        r["o_custkey"]: r["n"]
        for r in load_table(spark, SF_DIR_SMALL, "orders")
        .groupBy("o_custkey")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(res) == set(n_orders)
    for ck, r in res.items():
        # each island is >= one window long; union <= sum of windows
        assert ACTIVE_DAYS <= r["longest_island_days"] <= r["covered_days"]
        assert r["covered_days"] <= n_orders[ck] * ACTIVE_DAYS
        assert r["n_islands"] <= n_orders[ck]
        # islands are disjoint and each >= ACTIVE_DAYS
        assert r["covered_days"] >= r["n_islands"] * ACTIVE_DAYS
    # falsifiability: overlap-merge fires (covered < n*window) and
    # multi-island customers exist
    assert any(r["covered_days"] < n_orders[ck] * ACTIVE_DAYS for ck, r in res.items())
    assert any(r["n_islands"] > 1 for r in res.values())


def test_summap_arrays_aligned_and_reconcile(spark):
    """sumMap arrays: sorted unique keys, positional alignment, and the
    per-day map totals reconcile against the flat aggregate."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        summap_event_values,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = summap_event_values(spark, SF_DIR_SMALL).collect()
    assert rows
    flat = {
        (r["day"], r["event_type"]): r["n"]
        for r in load_table(spark, SF_DIR_SMALL, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        keys = r["keys_csv"].split(",")
        counts = [int(x) for x in r["counts_csv"].split(",")]
        sums = r["sums_csv"].split(",")
        assert keys == sorted(set(keys))
        assert len(keys) == len(counts) == len(sums)
        for k, n in zip(keys, counts):
            assert flat[(r["day"], k)] == n


def test_argminmax_battery_matches_bruteforce(spark):
    """Struct-extremum argMax/argMin vs a pure-Python recompute."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        argminmax_battery,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in argminmax_battery(spark, SF_DIR_SMALL).collect()}
    ev = load_table(spark, SF_DIR_SMALL, "events").select(
        "event_type", "value", "ts", "event_id", "user_id"
    ).collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(got) == set(by_type)
    for et, rows in by_type.items():
        top = max(rows, key=lambda r: (r["value"], r["ts"], r["event_id"]))
        bot = min(rows, key=lambda r: (r["value"], r["ts"], r["event_id"]))
        first = min(rows, key=lambda r: (r["ts"], r["event_id"]))
        last = max(rows, key=lambda r: (r["ts"], r["event_id"]))
        g = got[et]
        assert (g["top_user"], g["top_value"]) == (top["user_id"], top["value"])
        assert g["bottom_user"] == bot["user_id"]
        assert g["first_user"] == first["user_id"]
        assert g["last_value"] == last["value"]
        assert g["n_events"] == len(rows)


def test_quality_pr_sweep_curve_shape(spark):
    """PR-curve invariants: cells partition the corpus at every threshold,
    recall is monotone non-increasing in the threshold, and the fixture
    exercises all four confusion cells at some threshold."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.text import (
        QPR_THRESHOLDS,
        quality_pr_sweep,
    )

    rows = sorted(quality_pr_sweep(spark, SF_DIR_SMALL).collect(), key=lambda r: r["threshold"])
    assert [r["threshold"] for r in rows] == QPR_THRESHOLDS
    totals = {r["tp"] + r["fp"] + r["fn"] + r["tn"] for r in rows}
    assert len(totals) == 1  # every threshold sees the whole corpus
    recalls = [r["recall"] for r in rows]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    assert any(min(r["tp"], r["fp"], r["fn"], r["tn"]) > 0 for r in rows)
    # boundary behavior: the lowest threshold predicts everything positive
    assert rows[0]["fn"] == rows[0]["tn"] == 0 and rows[0]["recall"] == 1.0


def test_robust_outlier_days_both_branches_and_median_robustness(spark):
    """MAD flag: both branches fire; flags agree with a pure-Python
    median/MAD recompute."""
    import statistics

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        MAD_K,
        robust_outlier_days,
    )

    rows = robust_outlier_days(spark, SF_DIR_SMALL).collect()
    assert rows
    flags = {r["day"]: r["is_outlier"] for r in rows}
    assert any(flags.values()) and not all(flags.values())
    vals = {r["day"]: r["daily_value"] for r in rows}
    med = statistics.median(vals.values())
    mad = statistics.median(abs(v - med) for v in vals.values())
    for day, v in vals.items():
        assert flags[day] == (abs(v - med) > MAD_K * mad)


def test_group_array_moving_sum_semantics(spark):
    """Arrays are time-ordered; moving3 equals the trailing-3 fold of the
    price array, recomputed in pure Python decimals."""
    from decimal import Decimal

    from realtime_analytics_with_kafka_clickhouse_spark.operators.windows import (
        group_array_moving_sum,
    )

    rows = group_array_moving_sum(spark, SF_DIR_SMALL).collect()
    assert rows
    saw_full_window = False
    for r in rows:
        prices = [Decimal(p) for p in r["prices_csv"].split(",")]
        moving3 = [Decimal(m) for m in r["moving3_csv"].split(",")]
        assert len(prices) == len(moving3) == r["n_orders"]
        for i, m in enumerate(moving3):
            lo = max(0, i - 2)
            assert m == sum(prices[lo : i + 1])
            saw_full_window |= i >= 2
    assert saw_full_window  # some customer has >= 3 orders


def test_funnel_step_latency_consistent_with_funnel_counts(spark):
    """Pair conversions must equal the funnel's reached-step tallies, and
    every latency stat respects the funnel window bound."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        funnel_step_latency,
        funnel_steps,
    )

    lat = {
        (r["step_from"], r["step_to"]): r
        for r in funnel_step_latency(spark, SF_DIR_SMALL).collect()
    }
    counts = {
        r["steps_completed"]: r["n_users"]
        for r in funnel_steps(spark, SF_DIR_SMALL).collect()
    }
    # users converting step k->k+1 == users who reached >= k+1
    for k in (1, 2, 3):
        reached = sum(n for s, n in counts.items() if s >= k + 1)
        assert lat[(k, k + 1)]["n_converted"] == reached
    for r in lat.values():
        assert 0.0 <= r["p50_sec"] <= r["p90_sec"] <= r["max_sec"] <= 24 * 3600.0


def test_welch_ttest_matches_scipy_style_recompute(spark):
    """t statistic and Welch df vs a pure-Python recompute with sample
    variance; partition-count invariance pins merge-order independence."""
    import math

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        welch_ttest_values,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in welch_ttest_values(spark, SF_DIR_SMALL).collect()}
    vals: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    allv = [v for vs in vals.values() for v in vs]
    for et, sample in vals.items():
        rest = [v for o, vs in vals.items() if o != et for v in vs]
        n1, n2 = len(sample), len(rest)
        m1, m2 = sum(sample) / n1, sum(rest) / n2
        v1 = sum((x - m1) ** 2 for x in sample) / (n1 - 1)
        v2 = sum((x - m2) ** 2 for x in rest) / (n2 - 1)
        se1, se2 = v1 / n1, v2 / n2
        t = (m1 - m2) / math.sqrt(se1 + se2)
        df = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
        g = got[et]
        assert g["n_sample"] == n1 and g["n_rest"] == n2 == len(allv) - n1
        assert abs(g["t_stat"] - t) < 1e-4, (et, g["t_stat"], t)
        assert abs(g["welch_df"] - df) < max(1e-3 * df, 1e-3)
    # merge-order independence: same result at a different parallelism
    re = {r["event_type"]: r for r in
          welch_ttest_values(spark, SF_DIR_SMALL).repartition(3).collect()}
    assert {k: (v["t_stat"], v["welch_df"]) for k, v in got.items()} == {
        k: (v["t_stat"], v["welch_df"]) for k, v in re.items()
    }


def test_mann_whitney_u_matches_rank_recompute(spark):
    """U and z vs a pure-Python midrank recompute (scipy-style, tie
    corrected)."""
    import math

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        mann_whitney_u,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in mann_whitney_u(spark, SF_DIR_SMALL).collect()}
    rows = load_table(spark, SF_DIR_SMALL, "events").select("event_type", "value").collect()
    allv = sorted(r["value"] for r in rows)
    # midranks
    from collections import Counter

    cnt = Counter(allv)
    midrank, below = {}, 0
    for v in sorted(cnt):
        midrank[v] = below + (cnt[v] + 1) / 2.0
        below += cnt[v]
    n_total = len(allv)
    tie_t = sum(c**3 - c for c in cnt.values())
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, sample in by_type.items():
        n1, n2 = len(sample), n_total - len(sample)
        r1 = sum(midrank[v] for v in sample)
        u = r1 - n1 * (n1 + 1) / 2.0
        mu = n1 * n2 / 2.0
        var = n1 * n2 / 12.0 * ((n_total + 1) - tie_t / (n_total * (n_total - 1.0)))
        z = (u - mu) / math.sqrt(var)
        g = got[et]
        assert g["u_stat"] == u  # integer-exact midrank sums
        assert abs(g["z_score"] - z) < 1e-5
        assert (g["n_sample"], g["n_rest"]) == (n1, n2)
