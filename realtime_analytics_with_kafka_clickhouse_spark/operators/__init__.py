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
# r6 pass: the r5 gate went 50/50 green, so those entries rotate to the
# tail.  The gate now takes (a) everything NEW or REWRITTEN in r6 — the
# bucket-pruned keyed merges (+ dedup-on-ingest riding them), the
# jaccard-cap/broadcast fix (which also feeds minhash via the shared
# shingle CTE), fuzzy decontamination, ORC + VARIANT — then (b) all 28
# entries that have NEVER had a driver row, then (c) the r2-stale rows
# as far as the 50 slots reach (through value_dispersion; the r6
# surface grew by 14 brand-new operators, so the remaining 8 r2 window/
# sketch entries spill just past — new code outranks stale-but-proven
# classes whose siblings are green in r4/r5).  decode_features (default
# path semantically unchanged) and xml_roundtrip_stats (same class as
# the in-gate json/csv rows) were demoted for the same reason; r7 must
# promote the 8 spilled r2 entries + these two FIRST, with the remaining r3
# section behind them.
_NAMES = [
    # -- 1. CHANGED in round 6 (bucketed keyed merges, jaccard cap fix,
    #    decoder seam) — first green rows needed for the new shapes --
    (dedup, [
        "ngram_jaccard_pairs",
        "minhash_near_dup",
        "minhash_contamination",  # NEW r6: fuzzy benchmark decontamination
    ]),
    (_streaming_pipeline, [
        "replacing_merge_latest",
        "replacing_merge_tombstone",
        "collapsing_merge_net",
        "versioned_collapse_current",
        "dedup_ingest_documents",  # NEW r6: dedup-on-ingest via bucketed merge
        "statestore_inspect",      # NEW r6: state-store reader audit
    ]),
    (_sources_files, [
        "orc_roundtrip_stats",  # NEW r6: third lake format round-trip
    ]),
    (timeseries, [
        "variant_props_rollup",  # NEW r6: VARIANT-type semi-structured path
    ]),
    (similarity, [
        "arrow_grouped_label_profile",  # NEW r6: applyInArrow grouped leg
        "ann_ivf_persisted",            # NEW r6: index-as-table IVF serving
        "ann_query_broadcast_topk",     # NEW r6: broadcast-query serving shape
    ]),
    (relational, [
        "recursive_decay_ladder",  # NEW r6: recursive CTE (Spark 4.1)
        "lateral_top_customer_per_nation",  # NEW r6: correlated LATERAL
    ]),
    (_sources_pyds, [
        "python_datasource_scan",  # NEW r6: Python DataSource API source
    ]),
    (_storage_layout, [
        "dynamic_partition_backfill",  # NEW r6: dynamic-overwrite correction
    ]),
    (curation, [
        "shard_packing_efficiency",  # NEW r6: packing data-card report
    ]),
    # -- 2. never driver-checked (added r5; pytest-oracle evidence only) --
    (_sources_files, [
        "json_roundtrip_rollup",
        "csv_roundtrip_stats",
    ]),
    (timeseries, [
        "user_overlap_matrix",
        "sketch_rollup_distinct_users",
        "winsorized_value_stats",
        "funnel_steps",
        "cohort_retention",
    ]),
    (rollups, [
        "events_column_profile",
        "mv_consistency_report",
    ]),
    (curation, [
        "train_test_split",
        "temperature_mix_weights",
    ]),
    (text, [
        "vocab_oov_rate",
        "dsir_resample",
    ]),
    (relational, [
        "similar_customer_names",
    ]),
    (multimodal, [
        "media_phash_clusters",
    ]),
    (similarity, [
        "hybrid_search_topk",
        "embedding_prototypicality",
    ]),
    (relational, [
        "priority_status_grouping_sets",
    ]),
    (windows, [
        "ewma_daily_revenue",
        "revenue_anomaly_days",
        "trailing_30d_revenue",
    ]),
    (relational, [
        "order_event_days_full_outer",
    ]),
    (timeseries, [
        "value_quantity_correlation",
        "value_histogram",
        "value_equidepth_histogram",
        "interpolated_hourly_series",
        "daily_revenue_trend",
        "dense_hourly_series",
    ]),
    # -- 3. last green in round 2 — stalest driver evidence --
    (timeseries, [
        "approx_value_percentiles",
        "top_event_types_sketch",
        "value_dispersion",
        "events_props_normalize",
        "event_feature_map",
        "revenue_union_ledger",
        "approx_distinct_users",
    ]),
    (windows, [
        "top_parts_per_brand",
        "moving_avg_daily_revenue",
        "cumulative_daily_revenue",
        "order_gaps_per_customer",
        "customer_order_rank",
    ]),
    # -- 4. first past the gate: low-risk r6 entries demoted to fit all
    #    12 r2-stale rows in (decode_features' default path is
    #    semantically unchanged; xml shares the round-trip class with the
    #    in-gate json/csv rows) --
    (multimodal, [
        "decode_features",
    ]),
    (_sources_files, [
        "xml_roundtrip_stats",  # NEW r6: XML source (Spark 4 core)
    ]),
    # -- 5. round-3 fragile-hash picks --
    (dedup, [
        "dedup_exact",
        "simhash_near_dup",
        "substring_dedup_docs",
    ]),
    # ---- driver gate boundary (~50) ----
    # -- 5. remaining round-3 entries (next in line for r7) --
    (curation, [
        "dedup_keep_best",
    ]),
    (dedup, [
        "simhash_fingerprints",
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
    (_streaming_pipeline, [
        "incremental_hourly_rollup",
        "incremental_daily_region_rollup",
    ]),
    (windows, [
        "order_value_distribution",
    ]),
    (relational, [
        "q4_late_shipment_priority",
        "q7_nation_volume_shipping",
    ]),
    # -- 6. green in round 4 --
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
]



def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod, names in _NAMES:
        for n in names:
            assert n not in out, f"duplicate registry entry: {n}"
            out[n] = getattr(mod, n)
    return out
