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
# r8 pass: the r7 gate (the promotion round) went 50/50 green, so its
# entries rotate to the tail.  The r8 gate, in the order the r7 verdict
# directed: (a) the two r3 spills incremental_hourly_rollup /
# incremental_daily_region_rollup FIRST, (b) the SIXTEEN r7-new
# entries (pytest-parity green at 3 SFs, no driver row yet), (c) any
# r8-new entries, (d) the stalest remaining sections — the r4-evidence
# block (q22, the dashboard rollup family, TPC-H q1..q21 + derived
# relational picks) — filling the 50 slots.  After this gate no
# entry's freshest driver evidence predates r4, and the r4 section's
# remainder leads the r9 gate.
_NAMES = [
    # -- 1. the two r3-evidence spills from the r7 promotion round --
    (_streaming_pipeline, [
        "incremental_hourly_rollup",
        "incremental_daily_region_rollup",
    ]),
    # -- 2. the sixteen r7-new entries (ledger-ordered) --
    (_streaming_pipeline, [
        "txlog_zorder_pruned_read",  # OPTIMIZE ZORDER multi-col skipping
    ]),
    (_sources_pyds, [
        "python_stream_datasource_rollup",  # streaming Python DataSource
        "python_stream_datasource_sink_rollup",  # + Python sink 2-phase commit
    ]),
    (similarity, [
        "ann_pq_adc_topk",  # product quantization + ADC search
        "ann_ivfpq_topk",   # IVF coarse cells + PQ codes (IVFADC)
        "ann_pq_recall_at_k",  # PQ acceptance gate vs exact L2
    ]),
    (text, [
        "ngram_phrases_udtf",  # polymorphic analyze() UDTF
    ]),
    (relational, [
        "cdc_scd2_history",  # SCD type-2 intervals from the CDC log
        "scd2_asof_lookup",  # point-in-time interval-probe join
        "join_size_estimate",  # Selinger cardinality estimate vs truth
    ]),
    (_storage_bucketing, [
        "join_key_skew_report",  # heavy-hitter / salt-factor diagnosis
    ]),
    (curation, [
        "source_quota_cap",  # per-domain anti-dominance quota
        "leakage_safe_split",  # cluster-keyed split + leak audit
    ]),
    (timeseries, [
        "event_sequence_counts",  # sequenceMatch/sequenceCount parity
        "event_type_transitions",  # per-user Markov transition counts
    ]),
    (relational, [
        "customer_blocking_linkage",  # ER blocking + Levenshtein pairs
    ]),
    # -- 3. NEW in r8 (inside the gate: fresh code needs driver rows;
    #    each addition demotes the tail of section 4 below the gate) --
    (_streaming_pipeline, [
        "scd2_stored_history",  # SCD2 merged INTO storage, served from it
        "percentile_merge_mv",  # mergeable quantile-histogram MV
    ]),
    (similarity, [
        "ann_ivfpq_rerank_topk",  # ADC shortlist -> exact re-rank top-k
        "ann_ivfpq_recall_at_k",  # probe-loss recall gate for IVFADC
    ]),
    (dedup, [
        "minhash_index_ingest",  # dedup-on-arrival vs the stored LSH index
    ]),
    (curation, [
        "global_shuffle_shards",  # deterministic global shuffle -> shards
    ]),
    (timeseries, [
        "window_funnel_strict",  # windowFunnel 'strict_order' via lead()
        "max_concurrent_intervals",  # maxIntersections sweep-line
        "weighted_value_percentiles",  # quantileExactWeighted analog
        "error_recovery_asof",  # forward as-of join with tolerance
        "delta_sum_counters",  # deltaSum/runningDifference counter fold
        "interval_union_length",  # intervalLengthSum coverage islands
        "summap_event_values",  # sumMap/countMap Map-combinator arrays
        "argminmax_battery",  # argMax/argMin/anyLast struct extrema
        "robust_outlier_days",  # median/MAD robust anomaly flag
        "funnel_step_latency",  # step-to-step conversion latency pctls
        "welch_ttest_values",  # welchTTest one-vs-rest A/B statistic
        "mann_whitney_u",  # rank-sum U with midrank ties, integer-exact
        "ks_test_statistic",  # two-sample KS D, integer-exact argmax
        "simple_linreg_trend",  # least-squares trend from power sums
        "skew_kurt_battery",  # skewPop/kurtPop via 3rd/4th moments
        "cramers_v_assoc",  # chi2 + cramersV(BiasCorrected) ordered fold
        "retention_conditions",  # retention() base-AND-cond flags
        "sequence_next_node",  # sequenceNextNode windowed next-event
        "student_ttest_values",  # pooled-variance Student t, df=n-2
        "lttb_downsample_daily",  # largestTriangleThreeBuckets walk
    ]),
    (windows, [
        "group_array_moving_sum",  # groupArrayMovingSum ordered arrays
    ]),
    (rollups, [
        "conditional_agg_rollup",  # ClickHouse -If combinator battery
    ]),
    (dedup, [
        "ngram_novelty_score",  # corpus-unique shingle share (ppm)
    ]),
    (curation, [
        "quality_linear_probe_train",  # data-parallel GD linear probe
    ]),
    (text, [
        "quality_pr_sweep",  # precision/recall threshold sweep (-If shape)
    ]),
    (multimodal, [
        "audio_vad_segments",  # energy-gated VAD, the audio leg
    ]),
    # ---- driver gate boundary (exactly 50: ends at audio_vad_segments) ----
    # -- 4. r8-new spill (positions 51-64: r8-new entries past the 50-slot
    #    gate, pytest-parity green at 3 SFs — they lead the r9 gate) --
    (dedup, [
        "minhash_scurve_report",  # LSH (b,r) tuning curve off real candidates
    ]),
    (timeseries, [
        "dau_wau_stickiness",  # sliding-window distinct via island sweep-line
        "corr_matrix_daily",  # corrMatrix of the daily metric triple
    ]),
    (similarity, [
        "mrl_truncation_recall",  # Matryoshka prefix-dim recall gate
        "ann_mrl_adaptive_rerank",  # 8-dim shortlist -> full-dim re-rank
    ]),
    (timeseries, [
        "holt_linear_forecast",  # double-exponential level+trend walk
        "spearman_rank_corr",  # rankCorr via doubled midranks, integer-exact
        "kendall_tau_b",  # 2-D prefix-sum concordance, tie-corrected
        "revenue_concentration",  # Gini / HHI / Pareto-80 whale report
        "cohort_ltv_curve",  # cumulative cohort revenue by age-in-weeks
        "cusum_changepoint",  # exact scaled-CUSUM level-shift argmax
        "seasonal_dow_index",  # ratio-to-MA weekday seasonality
        "weekday_anova_f",  # one-way ANOVA F across weekday groups
        "daily_revenue_acf",  # lag-1/2/7 autocorrelation, decimal-exact
    ]),
    # -- 5. r4-evidence remainder (leads the r9 gate) --
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
        "part_type_stats",
        "customer_name_features",
        "order_date_features",
        "price_band_join",
        "priority_status_cube",
    ]),
    (timeseries, [
        "session_window_rollup",
        "sliding_hourly_trend",
        "median_value_grouped_udf",
        "dashboard_cards_sql",
        "value_percentiles",
    ]),
    (similarity, [
        "embedding_quantize_int8",
    ]),
    # -- 6. green in round 7 (the promotion-round gate, 50/50) --
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
        "dedup_exact",
        "simhash_near_dup",
        "substring_dedup_docs",
        "simhash_fingerprints",
    ]),
    (curation, [
        "dedup_keep_best",
    ]),
    (text, [
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
        "contamination_check",
        "repetition_score",
        "bigram_fluency",
        "gopher_quality_rules",
        "boilerplate_spans",
        "dsir_importance",
        "bpe_merge_topk",
    ]),
    (similarity, [
        "ann_cosine_topk",
        "ann_lsh_bucketed",
        "ann_ivf_topk",
        "embedding_near_dup",
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
        "pack_training_shards",
        "lang_balance_resample",
    ]),
    (windows, [
        "order_value_distribution",
    ]),
    (relational, [
        "q4_late_shipment_priority",
        "q7_nation_volume_shipping",
    ]),
    # -- 7. green in round 5 — freshest evidence, rotate forward in r7 --
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
        "ann_recall_at_k",
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
        "corpus_mix_report",
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
    # -- 9. green in round 6 (the full r6 gate, 50/50) — freshest
    #    evidence, last in line --
    (dedup, [
        "ngram_jaccard_pairs",
        "minhash_near_dup",
        "minhash_contamination",
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
        "ann_ivf_persisted",
        "ann_query_broadcast_topk",
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
        "dsir_resample",
    ]),
    (multimodal, [
        "media_phash_clusters",
    ]),
    (windows, [
        "ewma_daily_revenue",
        "revenue_anomaly_days",
        "trailing_30d_revenue",
    ]),
]



def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod, names in _NAMES:
        for n in names:
            assert n not in out, f"duplicate registry entry: {n}"
            out[n] = getattr(mod, n)
    return out
