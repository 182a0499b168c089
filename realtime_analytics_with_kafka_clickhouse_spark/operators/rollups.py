"""Reference-parity rollups + dashboard aggregations (SURVEY.md §2.3 A1-A8).

The reference declares two incremental rollups over the sales-order stream
(/root/reference/clickhouse/init/01_init.sql:63-74 hourly-by-category,
:77-87 daily-by-region, both filtered to completed orders) and five dashboard
aggregates on top (Sample_Dashboard.png / README.md:89-92).

The driver testdata maps sales orders onto ``events``
(FIXTURES.md §3: ts -> order_timestamp, event_type -> status/category key,
value -> total_amount, props.k -> quantity-like measure, user_id -> customer).
All aggregations use ``dsum`` (decimal-exact sums — functions.scalars) so the
results are bit-stable at any parallelism.

Scale notes (100 TB): each rollup is a single hash-aggregate with map-side
partial aggregation; grouping keys are low-cardinality (hours x 5 types,
days x 7 buckets) so the shuffle carries only partial aggregates — bytes
shuffled is O(partitions x groups), independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.scalars import dsum, to_start_of_hour
from ..sources.tables import load_table


# "valid event" predicate — the F1 analog of WHERE order_status = 'completed'
# (/root/reference/clickhouse/init/01_init.sql:73,86).  Lazy because Column
# construction needs an active session in classic PySpark.
def completed():
    return F.col("event_type") == "purchase"


def quantity_key():
    """Quantity-like measure: props.k (FIXTURES.md §3), defaulted to 0."""
    return F.coalesce(F.get_json_object("props", "$.k").cast("long"), F.lit(0))


def category_key():
    """Category dimension independent of the status column — a props-derived
    bucket (cat_0..cat_4), the analog of A2's user-bucket region.  Keeping
    category separate from event_type lets A1 carry the reference MV's real
    WHERE order_status = 'completed' filter (01_init.sql:73)."""
    return F.concat(F.lit("cat_"), (quantity_key() % 5).cast("string"))


def hourly_category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: hourly rollup by category over completed orders only — the MV of
    01_init.sql:63-74 (toStartOfHour x category -> count/revenue/quantity,
    WHERE order_status = 'completed')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(completed())
        .groupBy(
            to_start_of_hour("ts").alias("hour"),
            category_key().alias("category"),
        )
        .agg(
            F.count("*").alias("order_count"),
            dsum("value").alias("total_revenue"),
            F.sum(quantity_key()).alias("total_quantity"),
        )
    )


def daily_region_rollup_aggregate(batch: DataFrame) -> DataFrame:
    """The A2 aggregation over any events batch (also the per-micro-batch
    partial for the incremental MERGE path)."""
    return (
        batch.filter(completed())
        .groupBy(
            F.to_date("ts").alias("date"),
            F.concat(F.lit("region_"), (F.col("user_id") % 7).cast("string")).alias("region"),
        )
        .agg(
            F.count("*").alias("order_count"),
            dsum("value").alias("total_revenue"),
        )
    )


def daily_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: daily rollup by region (user_id bucket), completed only
    (01_init.sql:77-87)."""
    return daily_region_rollup_aggregate(load_table(spark, sf_dir, "events"))


def global_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: dashboard single-value cards — total orders / total revenue."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(completed()).agg(
        F.count("*").alias("total_orders"),
        dsum("value").alias("total_revenue"),
    )


def category_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: revenue share by category (the dashboard donut) — per-category
    revenue over grand total via an empty-frame window, completed orders
    only (the dashboard reads the A1 rollup)."""
    ev = load_table(spark, sf_dir, "events")
    per_cat = ev.filter(completed()).groupBy(category_key().alias("category")).agg(
        dsum("value").alias("revenue")
    )
    total = F.sum("revenue").over(Window.partitionBy())
    return per_cat.select(
        "category",
        "revenue",
        F.round(F.col("revenue") / total * 100, 4).alias("revenue_share_pct"),
    )


def region_revenue_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: revenue by region, sorted descending (the dashboard bar chart)."""
    return daily_region_rollup(spark, sf_dir).groupBy("region").agg(
        F.sum("order_count").alias("order_count"),
        dsum("total_revenue").alias("total_revenue"),
    ).orderBy(F.desc("total_revenue"))


def hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: hourly orders + revenue trend (dual-axis time series) — A1
    re-aggregated across categories, demonstrating rollup-as-accelerator
    (reads the A1 rollup, not the raw events)."""
    a1 = hourly_category_rollup(spark, sf_dir)
    return a1.groupBy("hour").agg(
        F.sum("order_count").alias("order_count"),
        dsum("total_revenue").alias("total_revenue"),
    )


PROFILE_COLUMNS = ["event_id", "user_id", "event_type", "value", "props"]


def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (the Deequ/dbt-style data-quality report):
    per column — row count, non-null count, exact distinct count — computed
    in a SINGLE aggregate over a single scan.  Multiple COUNT(DISTINCT)s
    compile to one Expand + two-phase hash aggregate (plan-pinned), not a
    scan per column; at 100 TB swap the exact distincts for
    ``approx_count_distinct`` states (the ``approx_distinct_users``
    pattern) and the pass stays map-side-partial.

    The wide 1-row aggregate unpivots to the long (column, metric) report
    shape with a map-only inline explode — no second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n_rows")]
    for c in PROFILE_COLUMNS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = ev.agg(*aggs)
    entries = ", ".join(
        f"struct('{c}' AS column, n_rows, nn_{c} AS n_nonnull, nd_{c} AS n_distinct)"
        for c in PROFILE_COLUMNS
    )
    return wide.select(
        F.expr(f"inline(array({entries}))")
    ).select("column", "n_rows", "n_nonnull", "n_distinct")


def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical continuous aggregates (TimescaleDB continuous-aggregate /
    cascading-MV pattern on the reference's SummingMergeTree rollups,
    /root/reference/clickhouse/init/01_init.sql:44,56): the monthly summary
    is computed strictly from DAILY partials, which come from the HOURLY A1
    partials — raw events are scanned exactly once, at the bottom of the
    cascade.  Each level carries the child-bucket count (n_hours, n_days)
    so a broken re-aggregation is visible in the driver row, not just in
    the sums.

    Scale shape: group cardinality shrinks monotonically up the cascade
    (hours x categories -> days -> months), so every re-aggregation above
    the base is a near-free partial-combine shuffle of O(groups) rows.
    ``dsum`` keeps all three levels bit-exact under any partial order."""
    hourly = hourly_category_rollup(spark, sf_dir)
    daily = hourly.groupBy(F.to_date("hour").alias("date")).agg(
        F.sum("order_count").alias("order_count"),
        dsum("total_revenue").alias("total_revenue"),
        F.sum("total_quantity").alias("total_quantity"),
        F.countDistinct("hour").alias("n_hours"),
    )
    return daily.groupBy(F.date_format("date", "yyyy-MM").alias("month")).agg(
        F.sum("order_count").alias("order_count"),
        dsum("total_revenue").alias("total_revenue"),
        F.sum("total_quantity").alias("total_quantity"),
        F.sum("n_hours").alias("n_hours"),
        F.count("*").alias("n_days"),
    )


def mv_consistency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV reconciliation audit — the operational check a reference user
    runs when the dashboard disagrees with the raw table: grand totals
    computed three independent ways (raw events, the A1 hourly rollup,
    the A2 daily rollup) in one report row with per-path booleans.
    Decimal-exact sums make the equalities EXACT, not tolerance-based —
    dsum is associative, so rollup-then-total must equal total.

    Scale shape: three independent aggregates (one over raw, two over
    already-tiny rollups) joined on nothing — the raw scan dominates and
    happens once per path; at 100 TB the rollup paths are free and the
    raw path is the audit's cost, run at audit cadence, not query
    cadence."""
    raw = global_totals(spark, sf_dir).select(
        F.col("total_orders").alias("raw_orders"),
        F.col("total_revenue").alias("raw_revenue"),
    )
    a1 = hourly_category_rollup(spark, sf_dir).agg(
        F.sum("order_count").alias("a1_orders"),
        dsum("total_revenue").alias("a1_revenue"),
    )
    a2 = daily_region_rollup(spark, sf_dir).agg(
        F.sum("order_count").alias("a2_orders"),
        dsum("total_revenue").alias("a2_revenue"),
    )
    return (
        raw.crossJoin(a1)
        .crossJoin(a2)
        .select(
            "raw_orders",
            "raw_revenue",
            ((F.col("a1_orders") == F.col("raw_orders"))
             & (F.col("a1_revenue") == F.col("raw_revenue"))).alias("a1_consistent"),
            ((F.col("a2_orders") == F.col("raw_orders"))
             & (F.col("a2_revenue") == F.col("raw_revenue"))).alias("a2_consistent"),
        )
    )


def conditional_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-If`` combinator battery (``countIf`` / ``sumIf`` /
    ``avgIf`` / ``uniqExactIf`` / ``maxIf``) in one per-nation pass:
    conditional aggregates are ``FILTER``-style branches inside ONE
    hash aggregate, never five filtered sub-queries (the anti-pattern
    that re-scans the fact table per metric).

    One customer-key join (dims broadcast upstream of it), one grouped
    aggregate; every money sum folds through DECIMAL(25,6).  The
    distinct-if rides the same exchange as the plain aggregates — Spark
    plans it as a two-phase partial distinct, still a single scan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    price_dec = F.col("o_totalprice").cast("decimal(25,6)")
    is_f = F.col("o_orderstatus") == "F"
    is_o = F.col("o_orderstatus") == "O"
    return joined.groupBy("n_name").agg(
        F.count(F.when(is_f, 1)).cast("long").alias("n_final"),
        F.sum(F.when(is_o, price_dec)).cast("double").alias("open_revenue"),
        (
            F.sum(F.when(is_f, price_dec)).cast("double")
            / F.count(F.when(is_f, 1))
        ).alias("avg_final_price"),
        F.countDistinct(F.when(is_o, F.col("o_custkey"))).cast("long").alias(
            "open_customers"
        ),
        F.max(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))).alias(
            "max_urgent_price"
        ),
    )


def status_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT surface (Spark's ``DataFrame.melt`` / SQL UNPIVOT — the
    inverse of the ``status_pivot`` wide table): pivot order counts wide
    by status, then melt back to long form.  The round-trip must land
    exactly on the plain (priority, status) GROUP BY — which is the
    oracle, so the melt's id/value/variable semantics are value-checked,
    not just type-checked.

    Scale shape: the wide frame is |priorities| x |statuses| (tiny); the
    pivot is the only corpus aggregate, map-side combined."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .fillna(0)
    )
    long = wide.melt(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="order_status",
        valueColumnName="n_orders",
    )
    return long.filter(F.col("n_orders") > 0).select(
        F.col("o_orderpriority").alias("priority"),
        "order_status",
        F.col("n_orders").cast("long").alias("n_orders"),
    )
