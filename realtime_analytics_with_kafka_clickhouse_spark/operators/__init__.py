"""Operator registry: every driver-visible query in one place.

``registry()`` returns {name: callable(spark, sf_dir) -> DataFrame}, the
backing store for ``__spark_entry__.queries()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    curation,
    dedup,
    multimodal,
    relational,
    rollups,
    similarity,
    text,
    timeseries,
    windows,
)
from ..sources import files as _sources_files
from ..sources import pydatasource as _sources_pyds
from ..storage import bucketing as _storage_bucketing
from ..storage import layout as _storage_layout
from ..streaming import pipeline as _streaming_pipeline

# Ordered (module, names) blocks.  ORDER MATTERS: the driver's correctness
# gate checks the first 50 registry entries, so the order is a ROTATION
# LEDGER — entries sorted by (1) changed this round, (2) staleness of
# their last green driver row.  Each round: sections that just earned
# green rows rotate to the tail; the stalest promote into the gate, so
# no entry goes 2 rounds unchecked.
#
# r11 pass: the r10 gate went 48/50 — BOTH red rows were hash-only
# oracle-portability misses (SURVEY §5 class 4) and lead this gate with
# engine-build-proof rewrites (distinct_agg_battery -> exact integer
# micros; rolling_median -> explicit sorted-list order statistic),
# followed by the class-4 sweep rewrites (dsir family, bigram_fluency),
# the NEW incremental-IVF op + the refactored persisted serve, the
# runtime_broadcast representatives (the four r10 probe regressions:
# embedding_near_dup / ann_lsh_bucketed / minhash_contamination /
# dedup_keep_best), and the request-size-capped collects.  Then the
# r4-evidence spill the r10 ledger queued (part_type_stats ..
# embedding_quantize_int8) and the round-7 section fill the 50 exactly;
# the r7 remainder (customer_order_rank onward) leads the r12 gate,
# with
# r5/r6/r8/r9 behind it and every r10-green row last.  Five more
# r11-new ops joined section 1 after the rotation was cut (sparkbar,
# ntile bands, URL battery, power iteration, hopping-window MV), then
# twelve late r11 ops (-Resample, proportions z-test, min-sample-size,
# PASTE/ANY JOIN, chi2 coefficients, derivative battery, asof
# tolerance, WITH TIES, bitmap algebra, array set ops,
# groupArrayIntersect, string battery, EXPLAIN ESTIMATE) — the
# overflow fills the gate with changed/new entries, so the queued
# r4-evidence spill could not ALL fit: two low-fragility section-1
# entries are demoted (ann_ivf_persisted, ann_query_broadcast_topk —
# their changed code paths are gated through sharing ops) to pull the
# stalest r4 rows toward the gate tail; the final two additions
# (bag_set_ops_battery, and the stream_curation_ingest lifecycle proof
# — a streaming op whose evidence MUST be a driver row) fill the last
# slots, so the whole r4 spill (part_type_stats onward) plus the r7
# section leads the r12 gate.  Late metadata-only/low-fragility ops
# (schema_introspection_card, dedup_audit_sample, avg_map,
# unicode battery) are parked past 50 by the same priority rule.
_NAMES = [
    # -- 1. CHANGED/NEW this round (r11): the two r10-red rows with
    #    engine-build-proof oracles (integer micros / explicit order
    #    statistic), the class-4 sweep rewrites (dsir family, bigram
    #    fluency), the NEW incremental-IVF maintenance op + the
    #    refactored persisted serve it shares, the runtime_broadcast
    #    representatives (the four r10 probe regressions), and the two
    #    request-size-capped serving collects --
    (timeseries, [
        "distinct_agg_battery",
        "sparkbar_hourly_revenue",  # NEW r11: ClickHouse sparkbar parity
        "bounding_ratio_battery",  # NEW r11: boundingRatio endpoints slope
        "quantile_timing_battery",  # NEW r11: quantileTiming accuracy contract
        "ip_functions_battery",  # NEW r11: IPv4 family, hash-spread fleet
        "l_diversity_report",  # NEW r11: homogeneity-attack privacy gate
        "prometheus_histogram_quantile",  # NEW r11: le-bucket interpolation
        "date_functions_battery",  # NEW r11: ISO week/quarter/month-age keys
        "resample_combinator_battery",  # NEW r11: -Resample banded aggregates
        "proportions_ztest_cohorts",  # NEW r11: two-proportion z + CI
        "min_sample_size_conversion",  # NEW r11: A/B sample-size planning
        "contingency_coefficients",  # NEW r11: contingency C + Tschuprow T
        "derivative_battery",  # NEW r11: runningDifference / nonNegDerivative
        "asof_tolerance_enrich",  # NEW r11: merge_asof tolerance semantics
        "limit_with_ties_card",  # NEW r11: FETCH FIRST ... WITH TIES peers
        "bitmap_set_algebra",  # NEW r11: groupBitmapAnd/Or/Xor pair algebra
        "array_set_ops_battery",  # NEW r11: arrayIntersect/Union/Except
        "group_array_intersect",  # NEW r11: per-user every-week type fold
        "bag_set_ops_battery",  # NEW r11: INTERSECT ALL / EXCEPT ALL
    ]),
    (windows, [
        "rolling_median_daily_revenue",
        "ntile_value_bands",  # NEW r11: ntile quartile banding
        "group_array_moving_avg",  # NEW r11: groupArrayMovingAvg micros CSV
        "array_transform_battery",  # NEW r11: arrayCumSum/Difference/Compact
    ]),
    (text, [
        "dsir_importance",
        "dsir_resample",
        "bigram_fluency",
        "contamination_check",
        "url_functions_battery",  # NEW r11: URL function-family parity
        "token_diversity_simpson",  # NEW r11: log-free lexical diversity
        "string_functions_battery",  # NEW r11: countSubstrings/multiSearch/...
    ]),
    (similarity, [
        "embedding_top_pc_power_iter",  # NEW r11: distributed power iteration
        "ann_ivf_delete_vectors",  # NEW r11: tombstone delete + OPTIMIZE FINAL
        "stream_ivf_index_ingest",  # NEW r11: foreachBatch epoch-id appends
        "ann_ivf_incremental",
        # ann_ivf_persisted demoted below position 50: its changed serve
        # path (_ivf_probe_serve) is gated through ann_ivf_incremental /
        # ann_ivf_delete_vectors, which exercise the same code plus the
        # maintenance legs — low fragility, r6+r10 green history.
        "embedding_near_dup",
        "ann_lsh_bucketed",
        "hard_negative_mining",
        # ann_query_broadcast_topk demoted below position 50: its change
        # is the same collect_request_sized cap hard_negative_mining
        # gates, with a dedicated oversized-batch pytest.
    ]),
    (dedup, [
        "minhash_contamination",
    ]),
    (curation, [
        "dedup_keep_best",
        "corpus_mix_report",
        "pack_training_shards",
        "span_corruption_plan",  # NEW r11: T5 denoising span plan
    ]),
    (_streaming_pipeline, [
        "stream_sliding_rollup_events",  # NEW r11: hopping-window MV proof
        "optimize_deduplicate_rollup",  # NEW r11: OPTIMIZE ... DEDUPLICATE
        "explain_estimate_scan",  # NEW r11: metadata-only planner card
        "stream_curation_ingest",  # NEW r11: gate->DLQ->dedup-on-ingest
    ]),
    (rollups, [
        "status_unpivot_roundtrip",  # NEW r11: melt/UNPIVOT surface
    ]),
    (relational, [
        "dq_expectations_report",  # NEW r11: GE-style trust card, FK edges
        "paste_join_battery",  # NEW r11: positional PASTE JOIN
        "any_join_battery",  # NEW r11: LEFT ANY strictness, min-tiebreak
    ]),
    # -- 2. r4-evidence spill (stalest driver rows; queued by the r10
    #    ledger to lead this gate) --
    (relational, [
        "part_type_stats",
        "customer_name_features",
        "order_date_features",
        "price_band_join",
        "priority_status_cube",
        # NEW r11 but deliberately parked past position 50: metadata-only
        # catalog card (no data job), pytest + 3-SF local parity on
        # arrival; the gate slots go to changed engine paths first.
        "schema_introspection_card",
        # NEW r11, parked past the gate: per-group pagination window —
        # same shape class as the gate-resident rank windows.
        "limit_by_battery",
    ]),
    (timeseries, [
        "session_window_rollup",
        "sliding_hourly_trend",
        "median_value_grouped_udf",
        "dashboard_cards_sql",
        "value_percentiles",
        # NEW r11, parked past the gate (schema_introspection_card
        # rationale): the Map-family mean — siblings hold gate history.
        "avg_map_event_values",
        # NEW r11, parked past the gate: SQL-standard NULL wiring proof
        # (both engines implement the standard; low build fragility).
        "null_semantics_battery",
        # NEW r11, parked past the gate: 15-min/30-min/time-of-day
        # bucket grains — one integer epoch chain, low fragility.
        "time_bucket_battery",
    ]),
    (similarity, [
        "embedding_quantize_int8",
    ]),
    # -- 3. round-7 section (next-stalest; entries past position 50
    #    spill to lead the r12 gate) --
    (_sources_files, [
        "xml_roundtrip_stats",
    ]),
    (windows, [
        "cumulative_daily_revenue",
        "order_gaps_per_customer",
        "customer_order_rank",
    ]),
    (multimodal, [
        "decode_features",
    ]),
    (timeseries, [
        "events_props_normalize",
        "event_feature_map",
        "revenue_union_ledger",
        "approx_distinct_users",
    ]),
    (windows, [
        "top_parts_per_brand",
        "moving_avg_daily_revenue",
    ]),
    (dedup, [
        # NEW r11 but parked past position 50 (same rationale as
        # schema_introspection_card): its candidate kernel is the
        # gate-resident capped-shingle path; pytest + 3-SF local parity
        # on arrival.
        "dedup_audit_sample",
        "dedup_exact",
        "simhash_near_dup",
        "substring_dedup_docs",
        "simhash_fingerprints",
    ]),
    (text, [
        # NEW r11, parked past the gate: map-only Unicode battery
        # (pytest + 3-SF local parity on arrival).
        "unicode_functions_battery",
        # NEW r11, parked past the gate: eval card over the gate-resident
        # language_id chain.
        "langid_confusion_matrix",
        "token_stats",
        "bpe_token_stats",
        "quality_score",
        "language_id",
        "doc_fingerprint",
        "deterministic_sample",
        "stratified_sample",
        "tfidf_top_terms",
        "quality_filter_pipeline",
        "chunk_documents",
        "best_doc_per_source",
        "pii_scrub",
        "repetition_score",
        "gopher_quality_rules",
        "boilerplate_spans",
        "bpe_merge_topk",
    ]),
    (similarity, [
        "ann_ivf_persisted",  # demoted from the r11 gate (see section 1)
        "ann_query_broadcast_topk",  # demoted from the r11 gate (see section 1)
        "ann_cosine_topk",
        "ann_ivf_topk",
        "label_centroids",
        "ann_quantized_topk",
    ]),
    (multimodal, [
        "media_metadata_stats",
        "frame_sample_features",
        "resize_thumbnail",
        "media_phash",
    ]),
    (curation, [
        "lang_balance_resample",
    ]),
    (windows, [
        "order_value_distribution",
    ]),
    (relational, [
        "q4_late_shipment_priority",
        "q7_nation_volume_shipping",
    ]),
    # -- 4. round-5 section --
    (_streaming_pipeline, [
        "compacted_rollup_txlog",
        "incremental_rollup_txlog",
        "hourly_trend_from_rollup",
        "stream_sessionize_events",
        "txlog_time_travel",
        "stream_windowed_rollup_events",
        "stream_join_orders_acks",
        "stream_join_orders_acks_outer",
        "txlog_pruned_read",
        "stream_dedup_events",
        "stream_running_totals_events",
        "incremental_nation_rollup",
        "txlog_schema_evolution",
        "txlog_bloom_pruned_read",
        "stream_static_enrich",
        "aggregating_merge_sketch_mv",
        "txlog_changes_feed",
    ]),
    (_storage_layout, [
        "gdpr_delete_audit",
    ]),
    (_storage_bucketing, [
        "bucketed_orders_lineitem_join",
        "top_orders_per_priority_salted",
    ]),
    (timeseries, [
        "user_sessionization",
        "last_purchase_asof",
    ]),
    (relational, [
        "customers_without_orders",
    ]),
    (multimodal, [
        "media_phash_near_dup",
        "scene_change_flags",
    ]),
    (similarity, [
        "kmeans_train",
        "ann_ivf_kmeans",
        "semantic_dedup",
        "embedding_norm_arrow",
        "embedding_random_projection",
        "ann_rp_topk",
    ]),
    (dedup, [
        "near_dup_clusters",
        "near_dup_pagerank",
        "near_dup_triangles",
    ]),
    (curation, [
        "weighted_sample_aes",
    ]),
    (relational, [
        "brand_basket_lift",
        "cdc_apply",
    ]),
    (rollups, [
        "rollup_cascade",
    ]),
    (windows, [
        "value_rank_battery",
    ]),
    (text, [
        "build_inverted_index",
        "bm25_topk",
        "bpe_train_merges",
        "bpe_tokenize_stats",
        "split_sentences_udtf",
    ]),
    # -- 5. round-6 section --
    (dedup, [
        "ngram_jaccard_pairs",
    ]),
    (_streaming_pipeline, [
        "replacing_merge_latest",
        "replacing_merge_tombstone",
        "collapsing_merge_net",
        "versioned_collapse_current",
        "dedup_ingest_documents",
        "statestore_inspect",
    ]),
    (_sources_files, [
        "orc_roundtrip_stats",
        "json_roundtrip_rollup",
        "csv_roundtrip_stats",
    ]),
    (timeseries, [
        "variant_props_rollup",
        "user_overlap_matrix",
        "sketch_rollup_distinct_users",
        "winsorized_value_stats",
        "funnel_steps",
        "cohort_retention",
        "value_quantity_correlation",
        "value_histogram",
        "value_equidepth_histogram",
        "interpolated_hourly_series",
        "daily_revenue_trend",
        "dense_hourly_series",
        "approx_value_percentiles",
        "top_event_types_sketch",
        "value_dispersion",
    ]),
    (similarity, [
        "arrow_grouped_label_profile",
        "hybrid_search_topk",
        "embedding_prototypicality",
    ]),
    (relational, [
        "recursive_decay_ladder",
        "lateral_top_customer_per_nation",
        "similar_customer_names",
        "priority_status_grouping_sets",
        "order_event_days_full_outer",
    ]),
    (_sources_pyds, [
        "python_datasource_scan",
    ]),
    (_storage_layout, [
        "dynamic_partition_backfill",
    ]),
    (curation, [
        "shard_packing_efficiency",
        "train_test_split",
        "temperature_mix_weights",
    ]),
    (rollups, [
        "events_column_profile",
        "mv_consistency_report",
    ]),
    (text, [
        "vocab_oov_rate",
    ]),
    (multimodal, [
        "media_phash_clusters",
    ]),
    (windows, [
        "ewma_daily_revenue",
        "revenue_anomaly_days",
        "trailing_30d_revenue",
    ]),
    # -- 6. round-8 section --
    (_streaming_pipeline, [
        "incremental_hourly_rollup",
        "incremental_daily_region_rollup",
        "txlog_zorder_pruned_read",
    ]),
    (_sources_pyds, [
        "python_stream_datasource_rollup",
        "python_stream_datasource_sink_rollup",
    ]),
    (similarity, [
        "ann_pq_adc_topk",
        "ann_ivfpq_topk",
    ]),
    (text, [
        "ngram_phrases_udtf",
    ]),
    (relational, [
        "cdc_scd2_history",
        "scd2_asof_lookup",
        "join_size_estimate",
    ]),
    (_storage_bucketing, [
        "join_key_skew_report",
    ]),
    (curation, [
        "source_quota_cap",
        "leakage_safe_split",
    ]),
    (timeseries, [
        "event_sequence_counts",
        "event_type_transitions",
    ]),
    (relational, [
        "customer_blocking_linkage",
    ]),
    (_streaming_pipeline, [
        "scd2_stored_history",
        "percentile_merge_mv",
    ]),
    (similarity, [
        "ann_ivfpq_rerank_topk",
    ]),
    (dedup, [
        "minhash_index_ingest",
    ]),
    (curation, [
        "global_shuffle_shards",
    ]),
    (timeseries, [
        "window_funnel_strict",
        "max_concurrent_intervals",
        "weighted_value_percentiles",
        "error_recovery_asof",
        "delta_sum_counters",
        "interval_union_length",
        "argminmax_battery",
        "robust_outlier_days",
        "funnel_step_latency",
        "welch_ttest_values",
        "mann_whitney_u",
        "ks_test_statistic",
        "simple_linreg_trend",
        "skew_kurt_battery",
        "cramers_v_assoc",
        "retention_conditions",
        "sequence_next_node",
        "student_ttest_values",
        "lttb_downsample_daily",
    ]),
    (rollups, [
        "conditional_agg_rollup",
    ]),
    (dedup, [
        "ngram_novelty_score",
    ]),
    (curation, [
        "quality_linear_probe_train",
    ]),
    (text, [
        "quality_pr_sweep",
    ]),
    (multimodal, [
        "audio_vad_segments",
    ]),
    # -- 7. round-9 section --
    (timeseries, [
        "summap_event_values",
    ]),
    (windows, [
        "group_array_moving_sum",
    ]),
    (similarity, [
        "ann_recall_at_k",
        "ann_pq_recall_at_k",
        "ann_ivfpq_recall_at_k",
    ]),
    (dedup, [
        "minhash_scurve_report",
    ]),
    (timeseries, [
        "dau_wau_stickiness",
        "corr_matrix_daily",
    ]),
    (similarity, [
        "mrl_truncation_recall",
        "ann_mrl_adaptive_rerank",
    ]),
    (timeseries, [
        "holt_linear_forecast",
        "spearman_rank_corr",
        "kendall_tau_b",
        "revenue_concentration",
        "cohort_ltv_curve",
        "cusum_changepoint",
        "seasonal_dow_index",
        "weekday_anova_f",
        "daily_revenue_acf",
        "window_funnel_default",
        "topk_weighted_users",
    ]),
    (_streaming_pipeline, [
        "percentile_kll_mv",
    ]),
    (similarity, [
        "ann_hamming_topk",
        "ann_hamming_recall_at_k",
    ]),
    (timeseries, [
        "minmax_map_event_values",
        "uniq_upto_battery",
        "quantile_conventions_battery",
    ]),
    (similarity, [
        "embedding_source_drift",
    ]),
    (timeseries, [
        "bitwise_agg_battery",
        "daily_ohlc_bars",
        "hourly_gap_fill_locf",
        "ab_assignment_srm",
        "k_anonymity_report",
        "conversion_rate_wilson_ci",
        "split_gini_gain",
        "rfm_segments",
    ]),
    (_storage_layout, [
        "order_update_mutation",
    ]),
    (_streaming_pipeline, [
        "stream_ohlc_bars",
    ]),
    (similarity, [
        "ann_hamming_rerank_topk",
    ]),
    (multimodal, [
        "media_exact_dedup",
    ]),
    (text, [
        "tokenizer_fertility_by_source",
        "vocab_growth_curve",
    ]),
    (similarity, [
        "embedding_quality_audit",
    ]),
    (_streaming_pipeline, [
        "txlog_vacuum_retention",
    ]),
    (timeseries, [
        "session_path_topk",
        "yoy_monthly_growth",
        "new_vs_returning_daily",
    ]),
    # -- 8. round-10-green evidence (freshest driver rows: the r10
    #    gate block incl. the refreshed r4 dashboard/TPC-H family) --
    (timeseries, [
        "window_funnel_strict_dedup",
        "sequence_match_gap_battery",
    ]),
    (curation, [
        "epoch_mixture_schedule",
    ]),
    (multimodal, [
        "media_shard_packing",
    ]),
    (similarity, [
        "ann_ivf_nprobe_sweep",
    ]),
    (dedup, [
        "lsh_band_autotune",
        "near_dup_threshold_sweep",
        "minhash_near_dup",
        "near_dup_source_matrix",
    ]),
    (_storage_layout, [
        "ttl_move_tiering",
    ]),
    (_streaming_pipeline, [
        "table_parts_report",
        "txlog_restore_version",
    ]),
    (timeseries, [
        "power_user_curve",
    ]),
    (relational, [
        "q22_idle_rich_customers",
    ]),
    (rollups, [
        "hourly_category_rollup",
        "daily_region_rollup",
        "global_totals",
        "category_revenue_share",
        "region_revenue_sorted",
        "hourly_trend",
    ]),
    (relational, [
        "q1_pricing_summary",
        "q2_min_cost_supplier",
        "q3_shipping_priority",
        "q5_region_supplier_volume",
        "q6_forecast_revenue",
        "q8_market_share",
        "q9_product_type_profit",
        "q10_returned_items",
        "q11_important_parts",
        "q12_ship_channel_priority",
        "q13_customer_order_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_supplier_part_counts",
        "q17_small_quantity_revenue",
        "q18_large_volume_customers",
        "q19_bracket_predicates",
        "q20_promotion_suppliers",
        "q21_waiting_suppliers",
        "market_segment_totals",
        "customers_with_orders",
        "top_customers_by_revenue",
        "distinct_customers_per_nation",
        "repeat_customers_both_years",
        "one_year_only_customers",
        "priority_status_rollup",
        "status_pivot",
    ]),
]



def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod, names in _NAMES:
        for n in names:
            if n in out:
                raise ValueError(f"duplicate registry entry: {n}")
            out[n] = getattr(mod, n)
    return out
