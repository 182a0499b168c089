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
from ..streaming import pipeline as _streaming_pipeline

# Ordered (module, names) blocks.  ORDER MATTERS: the driver's correctness
# gate checks the first 50 registry entries, so the order is a ROTATION
# LEDGER — entries sorted by staleness of their last green driver row:
#
#   1. never driver-checked (or red last round)   ← always lead
#   2. new this round                             ← need their first row
#   3. last green in round 1/2 (oldest evidence)  ← fill the gate
#   4. green in round 3 (freshest)                ← tail; rotate back next round
#
# Each round: move the sections that just got green rows to the tail and
# promote the stalest, so no entry goes 2 rounds unchecked.
_NAMES = [
    # -- 1. never checked in any round's gate (registry slots 51-59 in r03) --
    (relational, [
        "q2_min_cost_supplier",
        "q8_market_share",
        "q9_product_type_profit",
        "q11_important_parts",
        "q12_ship_channel_priority",
        "q15_top_supplier",
        "q16_supplier_part_counts",
        "q20_promotion_suppliers",
        "q21_waiting_suppliers",
    ]),
    # -- red in r03 (array<int> output; reshaped to quant_csv this round) --
    (similarity, [
        "embedding_quantize_int8",
    ]),
    # -- 2. new in round 4 --
    (multimodal, [
        "media_phash_near_dup",
    ]),
    (_streaming_pipeline, [
        "compacted_rollup_txlog",
    ]),
    # -- 3. last green in round 1/2 — stalest evidence, fill the gate --
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
        "q3_shipping_priority",
        "q5_region_supplier_volume",
        "q6_forecast_revenue",
        "q10_returned_items",
        "q14_promo_revenue",
        "q18_large_volume_customers",
        "q19_bracket_predicates",
        "q13_customer_order_distribution",
        "q17_small_quantity_revenue",
        "q22_idle_rich_customers",
        "market_segment_totals",
        "customers_with_orders",
        "customers_without_orders",
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
        "user_sessionization",
        "session_window_rollup",
        "sliding_hourly_trend",
        "median_value_grouped_udf",
        "dashboard_cards_sql",
        "last_purchase_asof",
        "value_percentiles",
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
    (relational, [
        "q4_late_shipment_priority",
        "q7_nation_volume_shipping",
    ]),
    # -- 4. green in round 3 — freshest evidence, promoted again in r05 --
    (dedup, [
        "dedup_exact",
        "ngram_jaccard_pairs",
        "minhash_near_dup",
        "near_dup_clusters",
        "simhash_fingerprints",
        "simhash_near_dup",
        "substring_dedup_docs",
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
        "kmeans_train",
        "ann_ivf_kmeans",
    ]),
    (multimodal, [
        "media_metadata_stats",
        "decode_features",
        "frame_sample_features",
        "resize_thumbnail",
        "media_phash",
    ]),
    (curation, [
        "pack_training_shards",
        "dedup_keep_best",
        "lang_balance_resample",
    ]),
    (_streaming_pipeline, [
        "incremental_hourly_rollup",
        "incremental_daily_region_rollup",
        "incremental_rollup_txlog",
        "hourly_trend_from_rollup",
    ]),
    (windows, [
        "order_value_distribution",
    ]),
]


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod, names in _NAMES:
        for n in names:
            assert n not in out, f"duplicate registry entry: {n}"
            out[n] = getattr(mod, n)
    return out
