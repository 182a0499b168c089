"""Physical-plan regression tests (SURVEY.md §4): the scale properties —
pushdown, pruning, broadcast, shuffle minimality — asserted as plan facts.
A failure here is a would-be cluster meltdown caught at test time."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from realtime_analytics_with_kafka_clickhouse_spark.plans.inspect import (
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_q1_filter_pushed_to_scan(spark, queries):
    df = queries["q1_pricing_summary"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed


def test_q1_column_pruning(spark, queries):
    df = queries["q1_pricing_summary"](spark, SF_DIR)
    (cols,) = read_schema_columns(df)
    assert cols == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }  # 7 of 11 columns: projection must prune the scan


def test_dim_joins_broadcast(spark, queries):
    for name in (
        "q3_shipping_priority",
        "q5_region_supplier_volume",
        "market_segment_totals",
        "top_customers_by_revenue",
    ):
        df = queries[name](spark, SF_DIR)
        assert has_broadcast_join(df), f"{name}: dimension join must broadcast"
        plan = formatted_plan(df)
        assert "SortMergeJoin" not in plan, f"{name}: no sort-merge for dims at this SF"


def test_q6_predicates_pushed_and_pruned(spark, queries):
    # Q6 is the minimal-scan shape: every predicate at the scan, only the
    # 4 referenced columns read.
    df = queries["q6_forecast_revenue"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} must push to the scan"
    (cols,) = read_schema_columns(df)
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_new_fact_dim_joins_broadcast(spark, queries):
    for name in ("q10_returned_items", "q18_large_volume_customers"):
        df = queries[name](spark, SF_DIR)
        assert has_broadcast_join(df), f"{name}: dimension join must broadcast"


def test_rollup_single_shuffle(spark, queries):
    # One aggregation = exactly one shuffle (partial -> exchange -> final).
    df = queries["daily_region_rollup"](spark, SF_DIR)
    assert count_shuffles(df) == 1


def test_rollup_has_partial_aggregation(spark, queries):
    # Map-side combine: two HashAggregate rounds around the exchange.
    plan = formatted_plan(queries["daily_region_rollup"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2


def test_scan_filter_pushdown_events(spark, queries):
    df = queries["daily_region_rollup"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    assert "event_type" in pushed and "purchase" in pushed


def test_maponly_text_ops_no_shuffle(spark, queries):
    # simhash_fingerprints included: the whole fingerprint folds per row
    # (HOF aggregate), so it must plan as a pure scan+project stage.
    for name in (
        "token_stats",
        "bpe_token_stats",
        "quality_score",
        "doc_fingerprint",
        "part_type_stats",
        "simhash_fingerprints",
        "frame_sample_features",
        "resize_thumbnail",
        "media_metadata_stats",
        "decode_features",
    ):
        df = queries[name](spark, SF_DIR)
        assert count_shuffles(df) == 0, f"{name}: map-only operator must not shuffle"


def test_round3_dim_joins_broadcast(spark, queries):
    # q7/q8: nation (25 rows) and the other dims must broadcast; the only
    # sort-merge-eligible shuffles are fact|x|fact.
    for name in ("q7_nation_volume_shipping", "q8_market_share"):
        df = queries[name](spark, SF_DIR)
        assert has_broadcast_join(df), f"{name}: dimension joins must broadcast"


def test_q4_semi_join_not_inner(spark, queries):
    # The EXISTS must plan as a semi join (one output row per order),
    # never an inner join + dedup.
    plan = formatted_plan(queries["q4_late_shipment_priority"](spark, SF_DIR))
    assert "LeftSemi" in plan
    df = queries["q4_late_shipment_priority"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed  # quarter filter reaches the orders scan


def test_simhash_near_dup_no_text_in_join_schema(spark, queries):
    # Shuffle discipline: the band join carries (band, byte, fingerprint),
    # never the document text — text must not appear in any exchange.
    plan = formatted_plan(queries["simhash_near_dup"](spark, SF_DIR))
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text#" not in m.group(0), "document text must not ride the shuffle"


def test_quality_filter_predicates_reach_scan(spark, queries):
    # The min-length + quality predicates are map-side: they must evaluate
    # in the scan stage (Filter directly over FileScan), not post-join.
    df = queries["quality_filter_pipeline"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan  # representative check is a semi join
    assert count_shuffles(df) <= 2  # text-hash agg + the semi join, nothing more


def test_wholestage_codegen_in_hot_path(spark, queries):
    # simple-mode plan marks codegen stages with '*(n)'; AQE finalizes the
    # plan only on execution, so run the query first.
    df = queries["q1_pricing_summary"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan and "*(" in plan


def test_tpch_round3_analogs_broadcast_dims(spark, queries):
    # q2/q9/q21: every dimension (part/supplier/nation/region) broadcasts;
    # the only shuffle-eligible joins are fact-fact or aggregate-aggregate.
    for name in ("q2_min_cost_supplier", "q9_product_type_profit", "q21_waiting_suppliers"):
        df = queries[name](spark, SF_DIR)
        assert has_broadcast_join(df), f"{name}: dimension joins must broadcast"


def test_q16_anti_join_planned(spark, queries):
    # The deficit-supplier exclusion must plan as an anti join, never a
    # NOT IN subquery materialization.
    plan = formatted_plan(queries["q16_supplier_part_counts"](spark, SF_DIR))
    assert "LeftAnti" in plan


def test_q20_semi_join_planned(spark, queries):
    plan = formatted_plan(queries["q20_promotion_suppliers"](spark, SF_DIR))
    assert "LeftSemi" in plan


def test_q12_single_join_single_agg(spark, queries):
    # One fact-fact join + one aggregation: at most 3 exchanges (two join
    # sides + the 3-group aggregate), with map-side partial aggregation.
    df = queries["q12_ship_channel_priority"](spark, SF_DIR)
    assert count_shuffles(df) <= 3
    assert formatted_plan(df).count("HashAggregate") >= 2


def test_pii_and_repetition_map_only(spark, queries):
    # Text-hygiene passes are scan-stage transforms: zero shuffles.
    for name in ("pii_scrub", "repetition_score"):
        df = queries[name](spark, SF_DIR)
        assert count_shuffles(df) == 0, f"{name}: map-only operator must not shuffle"


def test_contamination_bench_side_broadcast(spark, queries):
    # The benchmark gram set must broadcast — the training corpus must
    # never shuffle on the gram key at scale.
    df = queries["contamination_check"](spark, SF_DIR)
    assert has_broadcast_join(df)


def test_lang_balance_broadcast_no_corpus_shuffle(spark, queries):
    # The per-lang counts and global min are tiny aggregates; the corpus
    # side must receive them by broadcast and never shuffle itself.
    df = queries["lang_balance_resample"](spark, SF_DIR)
    assert has_broadcast_join(df)
    # Only bounded-key aggregates shuffle (the per-lang count subtree is
    # instantiated twice: broadcast side + under the global min).
    assert count_shuffles(df) <= 3


def test_pack_training_shards_no_global_corpus_window(spark, queries):
    # The corpus-wide running sum must be bucket-partitioned; the only
    # unpartitioned window runs over the |buckets|-row offsets frame.
    plan = formatted_plan(queries["pack_training_shards"](spark, SF_DIR))
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in plan"
    partitioned = [s for s in specs if s.strip().startswith("pid")]
    assert partitioned, f"corpus window must partition by pid: {specs}"


def test_gopher_rules_map_only(spark, queries):
    df = queries["gopher_quality_rules"](spark, SF_DIR)
    assert count_shuffles(df) == 0, "gopher rules are pure scan+project"


def test_boilerplate_and_substring_no_text_in_exchange(spark, queries):
    # Corpus-frequency ops shuffle span keys and counts — never the raw
    # document text (an exchange carrying `text` would move the whole
    # corpus per round at 100 TB).
    for name in ("boilerplate_spans", "substring_dedup_docs"):
        plan = formatted_plan(queries[name](spark, SF_DIR))
        assert "text#" not in " ".join(
            line for line in plan.splitlines() if "Exchange" in line
        ), f"{name}: raw text must not ride an exchange"


def test_kmeans_assignment_broadcasts_centroids(spark, queries):
    # The argmin is computed map-side: the quantizer is a closure constant
    # of the vectorized assignment kernel (r15 — one MapInPandas pass; the
    # K x DIM fold no longer runs as an interpreted HOF ladder behind a
    # BroadcastNestedLoopJoin), round-6 + the (d, c) sort stay Catalyst
    # expressions, and the DERIVATION must not shuffle.
    # (r14: the registry query serves the scratch-memoized ranking, so the
    # derivation shape is pinned on the underlying frame and the served
    # plan is separately pinned exchange-free below.)
    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        _kmeans_fit,
        _with_ranked_cells,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    derivation = formatted_plan(_with_ranked_cells(emb, _kmeans_fit(spark, SF_DIR)))
    assert "MapInPandas" in derivation, "vectorized assignment kernel missing"
    assert "Exchange hashpartitioning" not in derivation, (
        "map-side assignment must not shuffle"
    )
    served = formatted_plan(queries["kmeans_train"](spark, SF_DIR))
    assert "Exchange hashpartitioning" not in served, (
        "served assignment (memoized ranking scan) must not shuffle"
    )
    assert "spark_graft_memo" in served, (
        "kmeans_train must serve the scratch-memoized ranking artifact"
    )


def test_ann_recall_eval_never_exchanges_embeddings(spark, queries):
    # The recall eval joins (vec_id, neighbor_id) pairs only — the
    # embedding arrays must never appear in an exchange of the eval plan.
    plan = formatted_plan(queries["ann_recall_at_k"](spark, SF_DIR))
    assert "embedding#" not in " ".join(
        line for line in plan.splitlines() if "Exchange" in line
    ), "recall eval must shuffle id pairs, not vectors"


def test_corpus_mix_report_broadcasts_dup_membership(spark, queries):
    # The near-dup membership frame is candidate-bounded (tiny vs. the
    # corpus) but JOIN-DERIVED, so its size gate is AQE's runtime
    # SMJ->broadcast conversion (r11: a static limit-probe would re-run
    # the near-dup pipeline once per call) — the dup flag must come out
    # of EXECUTION as a broadcast lookup, and the raw text must never
    # ride an exchange (token counts are computed map-side).
    df = queries["corpus_mix_report"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "text#" not in " ".join(
        line for line in plan.splitlines() if "Exchange" in line
    ), "raw text must not ride an exchange"
    df.collect()
    executed = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert (
        "BroadcastHashJoin" in executed
        or "BroadcastNestedLoopJoin" in executed
    ), executed


def test_dsir_vocab_join_no_cartesian(spark, queries):
    plan = formatted_plan(queries["dsir_importance"](spark, SF_DIR))
    # the totals crossJoin is a broadcast of ONE row; the vocab join must
    # be a real equi-join (no cartesian product of token x vocab)
    assert "CartesianProduct" not in plan


def test_train_test_split_map_only(spark, queries):
    df = queries["train_test_split"](spark, SF_DIR)
    assert count_shuffles(df) == 0, "hash split must stay inside the scan stage"
    (cols,) = read_schema_columns(df)
    assert cols == {"doc_id"}, "split reads only doc_id"


def test_bm25_distributed_topk_no_global_sort_exchange(spark, queries):
    df = queries["bm25_topk"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, "top-k must be TakeOrdered, not a sort"
    assert count_shuffles(df) == 1, "only the one-row stats agg may exchange"


def test_vocab_oov_scoring_pass_map_only(spark, queries):
    df = queries["vocab_oov_rate"](spark, SF_DIR)
    assert count_shuffles(df) == 0, "vocab folds back as a literal; scoring is map-only"


def test_semantic_dedup_single_cell_shuffle(spark, queries):
    df = queries["semantic_dedup"](spark, SF_DIR)
    # one groupBy(cluster) exchange; the assignment is served from the
    # scratch-memoized ranking (r14), whose own derivation shape is pinned
    # by test_kmeans_assignment_broadcasts_centroids — here the contract
    # is that the cell-blocked dedup adds exactly ONE exchange on top.
    assert count_shuffles(df) == 1


def test_prototypicality_exchanges_triples_only(spark, queries):
    df = queries["embedding_prototypicality"](spark, SF_DIR)
    plan = formatted_plan(df)
    # the window shuffle carries (vec_id, cluster, dist) — never embeddings
    import re
    for m in re.findall(r"Exchange hashpartitioning[^\n]*", plan):
        assert "embedding" not in m


def test_bucketed_join_no_join_exchange(spark, queries):
    # At tiny SF Catalyst rightly broadcasts; disable that to reveal the
    # bucketed shape a big-big join would use: SMJ with NO exchange on
    # either side (the only shuffle is the final aggregate's).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = queries["bucketed_orders_lineitem_join"](spark, SF_DIR)
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan
        assert count_shuffles(df) == 1, "bucketed join must not exchange either side"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_txlog_pruned_read_touches_one_dir(spark, queries):
    df = queries["txlog_pruned_read"](spark, SF_DIR)
    dirs = {f.rsplit("/", 2)[-2] for f in df.inputFiles()}
    assert len(dirs) == 1, f"zone maps must prune 3 of 4 dirs, scanned: {dirs}"


def test_ewma_single_window_exec(spark, queries):
    # All 20 lags share one window spec -> exactly one Window node (a
    # second would mean the lags split specs and re-sort the daily series).
    import re

    plan = formatted_plan(queries["ewma_daily_revenue"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1


def test_anomaly_single_window_exec(spark, queries):
    import re

    plan = formatted_plan(queries["revenue_anomaly_days"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1


def test_grouping_sets_single_expand_single_scan(spark, queries):
    # GROUPING SETS must be one Expand over one scan — not a scan per set.
    import re

    plan = formatted_plan(queries["priority_status_grouping_sets"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Expand\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_sketch_rollup_partial_aggregation(spark, queries):
    # The mergeable-state property the operator demonstrates, as plan
    # facts: hourly sketches build with a map-side partial
    # (partial_hll_sketch_agg), and the daily level merges hourly sketch
    # STATES (hll_union_agg over sk), never re-touching raw user_ids.
    plan = formatted_plan(queries["sketch_rollup_distinct_users"](spark, SF_DIR))
    assert "partial_hll_sketch_agg" in plan
    assert "partial_hll_union_agg" in plan
    assert "hll_sketch_estimate" in plan


def test_column_profile_single_scan_single_expand(spark, queries):
    # 5 exact COUNT(DISTINCT)s must compile to ONE Expand over ONE scan
    # (a scan per profiled column is the naive profiling anti-pattern).
    import re

    plan = formatted_plan(queries["events_column_profile"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1


def test_random_projection_map_only(spark, queries):
    """JL projection is a pure map: no exchange anywhere in the plan."""
    df = queries["embedding_random_projection"](spark, SF_DIR)
    assert count_shuffles(df) == 0, formatted_plan(df)


def test_brand_basket_lift_single_fact_shuffle(spark, queries):
    """The basket build is the ONLY shuffle touching fact-sized data: one
    orderkey exchange + the two tiny brand/brands² aggregates, never the
    old okey self-join's extra exchanges."""
    df = queries["brand_basket_lift"](spark, SF_DIR)
    # 5 exchanges, but only the basket build (cached, runs once) carries
    # fact-sized rows; co/na/nb/totals aggregate the cached basket arrays
    # into brands²-, brands-, and 1-row outputs.
    assert count_shuffles(df) <= 5, formatted_plan(df)
    assert has_broadcast_join(df)  # part dim + stats rows broadcast


def test_cdc_apply_single_aggregate_exchange(spark, queries):
    """The log-compaction fold is one hash aggregate keyed on order_id:
    a single exchange, map-side partial max_by before it."""
    df = queries["cdc_apply"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 1, plan
    assert "max_by" in plan


def test_value_rank_battery_single_window_exchange(spark, queries):
    """All four analytic functions share ONE window spec: one exchange on
    the partition key, one sort, no per-function re-shuffle."""
    df = queries["value_rank_battery"](spark, SF_DIR)
    assert count_shuffles(df) == 1, formatted_plan(df)
    assert formatted_plan(df).count("Window") <= 2  # node + its detail


def test_rollup_cascade_reaggregates_partials_only(spark, queries):
    """The cascade's upper levels exchange O(groups) partial rows: one
    raw scan feeds 4 aggregate exchanges (base rollup, the two-phase
    daily distinct-hour count, monthly) — re-aggregation never rescans."""
    df = queries["rollup_cascade"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) == 1, plan  # exactly one scan
    assert count_shuffles(df) == 4, plan


def test_stream_static_dim_is_broadcast(spark, queries):
    """The stream-static enrichment must broadcast the dimension (checked
    on the batch-equivalent plan: same join, same hint)."""
    from pyspark.sql import functions as F
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    df = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert has_broadcast_join(df)


def test_scene_change_map_only(spark, queries):
    """Frame fan-out + sequential pairing all happen inside the Arrow
    batch: zero exchanges."""
    df = queries["scene_change_flags"](spark, SF_DIR)
    assert count_shuffles(df) == 0, formatted_plan(df)


def test_file_roundtrips_single_agg_exchange(spark, queries):
    """The JSON/CSV fidelity queries are scan -> hash agg: one exchange,
    and the scan is the matching file format (not parquet)."""
    j = queries["json_roundtrip_rollup"](spark, SF_DIR)
    assert count_shuffles(j) == 1, formatted_plan(j)
    assert "Scan json" in formatted_plan(j)
    c = queries["csv_roundtrip_stats"](spark, SF_DIR)
    assert count_shuffles(c) == 1, formatted_plan(c)
    assert "Scan csv" in formatted_plan(c)


def test_blocking_linkage_equi_join_on_rank(spark, queries):
    """The ER sorted-neighborhood join must carry the rank IN the
    equi-key (n*w candidates however large a block grows) — never a
    block-key-only join whose within-group comparison is quadratic,
    and never a nested-loop fallback."""
    df = queries["customer_blocking_linkage"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # rn must appear among the join keys (hash or sort-merge, either is
    # fine — the point is rank-equality routes the match).
    import re
    keys = re.findall(r"(?:Arguments|Left keys|Right keys).*?\[(.*?)\]", plan)
    joined = " ".join(keys)
    assert "rn" in joined, plan


def test_keyed_merge_fold_single_exchange(spark):
    """The bucketed keyed-merge fold must be ONE shuffle: repartition by
    bucket, then a groupBy that includes bucket reuses that partitioning
    (hash on a subset of the group keys satisfies the clustered
    distribution) — no second exchange before the partitioned write."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("version")
    )
    tagged = df.withColumn(
        "bucket", F.pmod(F.xxhash64("k"), F.lit(8)).cast("int")
    ).repartition(8, "bucket")
    folded = tagged.groupBy("k", "bucket").agg(F.max("version").alias("v"))
    assert count_shuffles(folded) == 1, formatted_plan(folded)
    # partial+final aggregation in one stage, no exchange between
    assert formatted_plan(folded).count("HashAggregate") >= 2


def test_skew_report_single_scan(spark, queries):
    """The grand-total denominator must reuse the per-key aggregate's
    exchange, not rescan events.  AQE materializes the reuse at runtime,
    so assert on the executed final plan: the totals branch hangs off a
    ReusedExchange of the per-key count's hashpartitioning(user_id)
    exchange — the events scan runs once."""
    df = queries["join_key_skew_report"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan


def test_similar_names_equi_join_on_rank(spark, queries):
    """The fuzzy-name SNM join must carry the rank in the equi-key —
    same sub-quadratic pin as customer_blocking_linkage."""
    df = queries["similar_customer_names"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    import re
    keys = re.findall(r"(?:Arguments|Left keys|Right keys).*?\[(.*?)\]", plan)
    assert "rn" in " ".join(keys), plan


def test_delta_sum_single_exchange(spark, queries):
    """The lag window and the per-user aggregate share the user_id hash
    partitioning: ONE shuffle end to end."""
    df = queries["delta_sum_counters"](spark, SF_DIR)
    assert count_shuffles(df) == 1, formatted_plan(df)


def test_interval_union_windows_share_one_sort(spark, queries):
    """All sweep-line windows ride the (o_custkey, d) exchange of the
    delta aggregate; the island and per-customer aggregates re-use the
    same partitioning — 2 shuffles total (union->delta agg, then
    nothing new: windows and final aggs are key-compatible)."""
    df = queries["interval_union_length"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert count_shuffles(df) <= 2, plan
    # three chained Window nodes (cumsum, lead/lag, island id), each
    # appearing as tree node + detail block — but NO extra exchange
    assert plan.count("Window") <= 6


def test_summap_two_level_aggregate(spark, queries):
    """(day, key) partial+final then per-day collect: 2 aggregate
    exchanges, one scan, no window."""
    df = queries["summap_event_values"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) == 1, plan
    assert count_shuffles(df) == 2, plan
    assert "Window" not in plan


def test_argminmax_single_aggregate_no_window(spark, queries):
    """Struct extrema are plain mergeable aggregates: one exchange on the
    group key, zero windows.  Spark compiles struct min/max to a
    SortAggregate (structs aren't hash-agg compatible) — the partial
    aggregate BEFORE the exchange is the map-side-combine proof; the
    local sort is on the tiny group key, not a global sort."""
    df = queries["argminmax_battery"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 1, plan
    assert "Window" not in plan
    assert "partial_max" in plan  # map-side combine survives the struct agg


def test_quality_pr_sweep_single_scan_single_agg(spark, queries):
    """All 72 conditional counters live in ONE aggregate over ONE scan;
    the threshold unpivot adds no exchange (1-row input)."""
    df = queries["quality_pr_sweep"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) == 1, plan
    assert count_shuffles(df) <= 1, plan


def test_group_array_moving_sum_single_exchange(spark, queries):
    """Moving-sum window and the per-customer collect share the customer
    hash partitioning: one shuffle end to end."""
    df = queries["group_array_moving_sum"](spark, SF_DIR)
    assert count_shuffles(df) == 1, formatted_plan(df)


def test_skew_kurt_single_exchange_partial_agg(spark, queries):
    """Five moment accumulators ride ONE partial-agg shuffle on the group
    key; the scan reads only (event_type, value)."""
    df = queries["skew_kurt_battery"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 1, plan
    assert read_schema_columns(df) == [{"event_type", "value"}], plan
    assert "partial_sum" in plan  # map-side combine carries the moments


def test_simple_linreg_two_exchanges_one_scan(spark, queries):
    """Daily grain then per-type power sums: exactly the two aggregation
    exchanges, one corpus scan, nothing else."""
    df = queries["simple_linreg_trend"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 2, plan
    assert read_schema_columns(df) == [{"event_type", "ts", "value"}], plan


def test_ks_statistic_single_corpus_scan_runtime(spark, queries):
    """Every KS frame (value grid, per-type counts, totals, the grid join
    side) derives from ONE (value, event_type) partial agg; at runtime
    AQE must collapse the branches onto that exchange — the FINAL plan
    holds exactly one FileScan and >=3 ReusedExchange (the
    join_key_skew_report discipline)."""
    df = queries["ks_test_statistic"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan") == 1, final
    assert final.count("ReusedExchange") >= 3, final


def test_cramers_v_single_scan_partial_agg(spark, queries):
    """The contingency table is ONE partial-agg shuffle of the corpus;
    row/column/grand totals and the ordered fold run on the 35-row cell
    grid (windows + one global agg), never rescanning events."""
    df = queries["cramers_v_assoc"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert read_schema_columns(df) == [{"event_type", "user_id"}], plan
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan


def test_retention_two_exchanges_one_scan(spark, queries):
    """Per-user indicator flags then the one-row global sum: two
    aggregation exchanges, one corpus scan, map-side combine on both."""
    df = queries["retention_conditions"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 2, plan
    assert len(read_schema_columns(df)) == 1, plan


def test_sequence_next_node_three_pruned_scans(spark, queries):
    """The 3-stage chain reads the corpus exactly three times — the
    signup slice, the purchase slice (both type-filter-pushed), and the
    next-event pass — with '(end)' padding riding the SAME left join
    (no fourth derivation for the total, which is a window over the
    |type|+1 grouped rows)."""
    df = queries["sequence_next_node"](spark, SF_DIR)
    plan = formatted_plan(df)
    scans = read_schema_columns(df)
    assert len(scans) == 3, plan
    pushed = " ".join(pushed_filters(df))
    assert pushed.count("event_type") >= 2, pushed  # both slices pushed


def test_student_ttest_single_corpus_aggregate(spark, queries):
    """Same contract as welch: one power-sum partial agg over the corpus;
    the global totals are a broadcast one-row frame."""
    df = queries["student_ttest_values"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) <= 2, plan
    # the one-row totals frame rides a broadcast nested-loop (keyless) join
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_lttb_one_scan_fold_on_one_row(spark, queries):
    """The LTTB walk is a Catalyst expression over the one-row series
    frame: one corpus scan to the daily grain (partial agg), then the
    sorted collect — no joins, no windows, no per-point shuffles."""
    df = queries["lttb_downsample_daily"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) == 1, plan
    assert count_shuffles(df) == 2, plan  # daily grain + the 1-row collect
    assert "Join" not in plan and "Window" not in plan


def test_minhash_scurve_no_text_in_exchanges(spark, queries):
    """The s-curve report rides the same shuffle discipline as the
    near-dup pipeline: exchanges carry signatures/components only —
    document text never shuffles."""
    plan = formatted_plan(queries["minhash_scurve_report"](spark, SF_DIR))
    import re as _re

    for mt in _re.finditer(r"Exchange [^\n]*", plan):
        assert "text#" not in mt.group(0), "document text must not ride the shuffle"


def test_dau_wau_no_explode_no_range_join(spark, queries):
    """Sliding-window distinct must NOT plan as a range join or a
    per-active-day explode: the user-day dedup + island aggregation +
    the date-domain sweep are plain hash aggregates/windows; the only
    join is the day-grain full-outer merge of deltas with DAU."""
    df = queries["dau_wau_stickiness"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Generate" not in plan, plan  # no explode
    assert "BroadcastNestedLoopJoin" not in plan  # no range join
    # exactly one join node (formatted plans print tree + detail sections):
    # the day-grain delta|x|dau full-outer merge
    join_nodes = [
        ln for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Join" in ln
    ]
    assert len(join_nodes) == 1, join_nodes
    # all three branches (delta starts, delta ends, DAU) share the one
    # (user, day) dedup exchange: runtime final plan = ONE corpus scan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    assert final.count("FileScan") == 1, final
    assert final.count("ReusedExchange") >= 2, final


def test_corr_matrix_two_exchanges(spark, queries):
    """Daily grain (count+dsum+distinct) then the one-row power-sum
    reduce: the distinct-user leg costs one extra expand-free exchange,
    nothing else; the 6-cell explode adds no shuffle."""
    df = queries["corr_matrix_daily"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert count_shuffles(df) <= 3, plan
    assert len(read_schema_columns(df)) == 1, plan
    assert "Join" not in plan


def test_mrl_recall_id_pairs_only_in_shuffles(spark, queries):
    """The recall semi-joins carry (vec_id, neighbor_id) id pairs only —
    the embedding arrays never ride an exchange."""
    plan = formatted_plan(queries["mrl_truncation_recall"](spark, SF_DIR))
    import re as _re

    for mt in _re.finditer(r"Exchange [^\n]*", plan):
        assert "embedding#" not in mt.group(0), "embeddings must not ride the shuffle"


def test_mrl_rerank_no_cartesian(spark, queries):
    """The full-precision work is confined to the shortlist equi-joins:
    no nested-loop/cartesian anywhere — the n^2 stage exists only inside
    the Arrow matmul helper, never as a join."""
    plan = formatted_plan(queries["ann_mrl_adaptive_rerank"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_holt_one_scan_fold_on_one_row(spark, queries):
    """Like LTTB: one corpus scan to the daily grain, the walk is a
    Catalyst expression on the one-row series frame — no joins, no
    windows."""
    df = queries["holt_linear_forecast"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) == 1, plan
    assert count_shuffles(df) == 2, plan
    assert "Join" not in plan and "Window" not in plan


def test_spearman_windows_on_frequency_tables_only(spark, queries):
    """Both midrank windows walk domain-bounded frequency tables
    (partitioned by event_type — never an unpartitioned corpus window);
    the rank tables broadcast back onto the corpus."""
    df = queries["spearman_rank_corr"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert has_broadcast_join(df), plan
    assert "SortMergeJoin" not in plan


def test_kendall_grid_windows_two_scans(spark, queries):
    """The O(n^2) statistic must plan as grid windows, not a pair join:
    no cartesian, the cumsum windows partition by (type, hr)/(type,
    value), and the runtime plan holds exactly two map-combined corpus
    scans (cells + the column-pruned vals branch) with the cells
    exchange reused by every marginal."""
    df = queries["kendall_tau_b"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    assert final.count("FileScan") == 2, final
    assert final.count("ReusedExchange") >= 3, final


def test_revenue_concentration_region_partitioned_windows(spark, queries):
    """No global sort: every window partitions by region (the Gini sort
    parallelizes across regions); one corpus scan feeds the customer
    grain."""
    df = queries["revenue_concentration"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "rangepartitioning" not in plan, plan  # no global ORDER BY
    assert len(read_schema_columns(df)) <= 2, plan


def test_cusum_single_daily_shuffle(spark, queries):
    """One (type, day) partial-agg shuffle; every window partitions by
    event_type over the day-domain frame — no corpus windows, no joins."""
    df = queries["cusum_changepoint"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert len(read_schema_columns(df)) == 1, plan


def test_seasonal_dow_single_daily_shuffle(spark, queries):
    """One shuffle to the daily grain; the centered window and the fold
    ride the bounded date domain (one corpus scan, no joins)."""
    df = queries["seasonal_dow_index"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert len(read_schema_columns(df)) == 1, plan


def test_window_funnel_default_no_window_bounded_fold(spark, queries):
    """The default-mode funnel is a per-user collect + Catalyst HOF fold:
    no window function anywhere, scan pruned to the 4 fold columns."""
    df = queries["window_funnel_default"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert {"user_id", "ts", "event_id", "event_type"} in read_schema_columns(df)


def test_topk_weighted_no_global_sort(spark, queries):
    """Both legs take top-k WITHOUT a global sort: the exact leg's
    orderBy+limit compiles to TakeOrderedAndProject, and the candidate
    leg's window partitions by salt — no RangePartitioning exchange."""
    df = queries["topk_weighted_users"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    # both legs' scans prune to the 2 aggregate columns
    assert all(c == {"user_id", "value"} for c in read_schema_columns(df)), plan


def test_quantile_conventions_single_scan_domain_windows(spark, queries):
    """One value-frequency aggregate off one scan; the cumulative windows
    ride the |distinct values| domain, and all 12 order statistics come
    from ONE conditional-min aggregate — no joins, no global sort."""
    df = queries["quantile_conventions_battery"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert len(read_schema_columns(df)) == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_ann_hamming_codes_only_shuffle(spark, queries):
    """The Hamming search joins CODES (2 longs/vector) against a
    broadcast query batch: raw embeddings never ride a join, and the
    only window partitions by query id."""
    df = queries["ann_hamming_topk"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert plan.count("posexplode") == 0, plan
