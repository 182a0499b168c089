"""Time-series operators over the events stream (SURVEY.md §2.5/§2.7 [EXT]):
sessionization, as-of lookup, percentiles, dispersion — the analytics a
real-time events pipeline needs beyond fixed-window rollups.

Scale notes: everything here windows by ``user_id`` — bounded per-user
state, shuffled once on the partition key.  ``value_dispersion`` computes
variance from decimal-exact power sums instead of streaming M2 so the
result is independent of partial-merge order (bit-stable at any
parallelism, unlike built-in stddev/variance).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve from module globals

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import dsum
from ..sources.tables import load_table

SESSION_GAP_SEC = 1800


def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): running session ids via
    lag + cumulative sum, then per-session aggregates."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        prev_us.isNull()
        | ((F.unix_micros(F.col("ts")) - prev_us) > SESSION_GAP_SEC * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = ev.withColumn("session_id", F.sum(is_new).over(run).cast("long"))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value").alias("session_revenue"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000.0
        ).alias("duration_sec"),
    )


def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` aggregation (SURVEY.md §2.7 [EXT]): the
    streaming-capable session operator, here in batch — merges events into
    sessions while consecutive gaps stay under 30 minutes.

    Semantics pinned: a gap of EXACTLY the gap duration starts a NEW
    session (session_window's window is [start, last+gap)), and the
    reported session_end is last_event_ts + gap, both mirrored in the
    oracle.  ``user_sessionization`` is the lag/cumsum formulation of the
    same operator with closed-boundary semantics; this one state-merges,
    which is what ``withWatermark`` + append mode needs on a live stream."""
    ev = load_table(spark, sf_dir, "events")
    win = F.session_window(F.col("ts"), f"{SESSION_GAP_SEC} seconds")
    return (
        ev.groupBy("user_id", win.alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("session_revenue"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_revenue",
        )
    )


def sliding_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (SURVEY.md §2.7 [EXT] — absent in the
    reference, which has tumbling buckets only): 2-hour windows sliding by
    1 hour via the built-in ``window()``, streaming-capable as-is.  Each
    event lands in exactly two windows; the oracle mirrors that by
    replicating each event to its two containing window starts."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "2 hours", "1 hour")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(win.alias("win"))
        .agg(F.count("*").alias("order_count"), dsum("value").alias("total_revenue"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "order_count",
            "total_revenue",
        )
    )


def last_purchase_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup: for every event, the user's most recent strictly-prior
    purchase timestamp (last-ignore-nulls over an unbounded-preceding frame
    — the composition-of-built-ins as-of join, SURVEY.md §2.4)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_purchase = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        last_purchase.alias("last_purchase_ts"),
        F.when(
            last_purchase.isNotNull(),
            (F.unix_micros(F.col("ts")) - F.unix_micros(last_purchase)) / 1_000_000.0,
        ).alias("secs_since_purchase"),
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


def median_value_grouped_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (SURVEY.md §2.8 — the third UDF shape
    next to grouped-map ``label_centroids`` and ``mapInPandas``
    ``decode_features``): per-type median event value.  Median is an order
    statistic, so the result is independent of Arrow batch/partition order —
    safe for exact cross-engine comparison (numpy and DuckDB interpolate
    the even-n midpoint identically)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        return float(np.median(v.to_numpy(dtype=np.float64)))

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg(), so the row count is a second pandas aggregate.
    @pandas_udf("long")
    def count_udf(v: pd.Series) -> int:
        return int(len(v))

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        median_udf("value").alias("median_value"),
        count_udf("value").alias("n"),
    )


def dashboard_cards_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI entry path (SURVEY.md §3.3): Metabase-style SQL over a
    registered view — ``spark.sql`` text goes through the full Catalyst
    lifecycle (parse -> analyze -> optimize -> codegen), same engine as the
    DataFrame API.  Query = the A5 dashboard cards."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT count(*) AS total_orders,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_order_value
        FROM events_v
        WHERE event_type = 'purchase'
        """
    )


def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch aggregation (``percentile_approx``, Greenwald-Khanna)
    next to the exact interpolated percentiles — at 100 TB the exact
    variant needs a full per-group sort, the sketch is single-pass mergeable
    state.  Same verification contract as ``approx_distinct_users``: the
    driver-checked output carries the exact values plus a boolean asserting
    the sketch landed within 10% relative error (the oracle emits TRUE)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("approx"),
        F.expr("percentile(value, array(0.5, 0.95))").alias("exact"),
    )

    def _ok(i: int):
        a, e = F.element_at("approx", i), F.element_at("exact", i)
        return F.abs(a - e) / F.abs(e) <= 0.1

    return agg.select(
        "event_type",
        F.element_at("exact", 1).alias("p50"),
        F.element_at("exact", 2).alias("p95"),
        (_ok(1) & _ok(2)).alias("sketch_within_10pct"),
    )


def top_event_types_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters sketch (``approx_top_k``) with the exact-plus-tolerance
    contract: output is the EXACT top-3 event types by count
    (deterministic count-desc/key-asc order), plus a boolean asserting the
    sketch recovered the same ranked list.  At fixture cardinality (5 keys,
    sketch capacity 10k) the sketch is lossless, so the boolean is a hard
    invariant, not a flake."""
    ev = load_table(spark, sf_dir, "events")
    exact = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(3)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("event_type"))
        ).cast("long"))
    )
    sketch = ev.agg(F.expr("approx_top_k(event_type, 3)").alias("tk")).select(
        F.posexplode("tk").alias("pos", "entry")
    ).select(
        (F.col("pos") + 1).cast("long").alias("rank"),
        F.col("entry.item").alias("sk_item"),
        F.col("entry.count").alias("sk_cnt"),
    )
    return exact.join(sketch, "rank").select(
        "rank",
        "event_type",
        "cnt",
        ((F.col("sk_item") == F.col("event_type")) & (F.col("sk_cnt") == F.col("cnt"))).alias(
            "sketch_exact"
        ),
    )


def value_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/stddev from decimal-exact power sums — deterministic
    under any partial-aggregation order, unlike streaming-M2 stddev."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return agg.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean_value"),
        F.round(var, 6).alias("var_value"),
        F.round(F.sqrt(var), 6).alias("stddev_value"),
    )


def events_props_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-parity on the events stream: JSON field extraction with defaults,
    casts, and derived buckets (get_json_object + coalesce + cast)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("long"), F.lit(0))
    missing = F.get_json_object("props", "$.missing")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("k"),
        F.coalesce(missing, F.lit("n/a")).alias("missing_field"),
        (k % 10).alias("k_bucket"),
        (F.col("value") * k.cast("double")).alias("weighted_value"),
    )


def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type (NEW r6) —
    the ClickHouse JSON/Object-type analog: ``parse_json`` parses each
    props string ONCE into the binary variant encoding, and every
    ``variant_get`` afterwards is a typed traversal of that encoding —
    unlike ``get_json_object`` (events_props_normalize), which re-parses
    the string per extraction.  At 100 TB the parse-once property is the
    difference between one and K string parses per row for K extracted
    fields; the rollup stays an ordinary partial-agg shuffle."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.coalesce(F.variant_get(v, "$.k", "long"), F.lit(0))
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            F.max("k").alias("max_k"),
        )
    )


def event_feature_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function breadth (SURVEY.md §2.6 extension): JSON -> map,
    map construction, map_concat, map_keys/contains/element_at — the
    feature-bag shape ML pipelines carry per event.  The oracle verifies
    the scalar values the map ops must produce."""
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("long"), F.lit(0))
    props_map = F.coalesce(
        F.from_json("props", "map<string,string>"),
        F.create_map().cast("map<string,string>"),
    )
    built = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("bucket"), (k % 10).cast("string"),
    )
    # map_concat runs under spark.sql.mapKeyDedupPolicy=EXCEPTION by
    # default: a props bag that happens to carry a 'type'/'bucket' key would
    # kill the whole query at runtime.  Filter the built keys out of props
    # first — schema-independent, no session-conf coupling.
    safe_props = F.map_filter(props_map, lambda mk, _v: ~mk.isin("type", "bucket"))
    merged = F.map_concat(built, safe_props)
    return ev.select(
        "event_id",
        F.size(merged).cast("long").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(merged)), ",").alias("keys_sorted"),
        F.element_at(merged, F.lit("type")).alias("type_val"),
        F.element_at(merged, F.lit("k")).cast("long").alias("k_val"),
        F.map_contains_key(merged, F.lit("missing")).alias("has_missing"),
    )


def revenue_union_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op breadth: one ledger from two revenue sources (orders +
    purchase events) via unionByName on a conformed schema."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("source"),
        F.col("o_orderkey").alias("ref_id"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("amount"),
    )
    purchases = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        F.lit("events").alias("source"),
        F.col("event_id").alias("ref_id"),
        F.col("ts"),
        F.col("value").alias("amount"),
    )
    return orders.unionByName(purchases)


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per event type — sketch aggregation
    for 100 TB cardinality estimation.

    HLL sketch values differ across engines, so the driver-visible output
    carries the exact count plus a boolean asserting the sketch landed
    within 10x its configured relative error (rsd=0.01) — the oracle emits
    the same exact count and a literal TRUE, which makes sketch quality
    itself part of the hash-checked contract.  The raw approximate value is
    tolerance-tested in the pytest suite."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    return agg.select(
        "event_type",
        "exact_users",
        (rel_err <= 0.1).alias("approx_within_10x_rsd"),
    )


def value_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between order value and quantity per event type
    — the `corr()` OLAP aggregate, rebuilt from decimal-exact power sums
    (n, Σx, Σy, Σxy, Σx², Σy²) so the result is deterministic under any
    partial-aggregation order (built-in corr folds doubles in shuffle
    order; this one is bit-stable, the value_dispersion discipline).
    Integer sums (quantity) stay in exact longs; double products round
    once into wide decimals.  One hash aggregate, map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    q = F.coalesce(F.get_json_object("props", "$.k").cast("long"), F.lit(0))
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum(q).alias("sy_long"),
        F.sum((F.col("value") * q.cast("double")).cast("decimal(30,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)"))
        .cast("double")
        .alias("sxx"),
        F.sum(q * q).alias("syy_long"),
    )
    n = F.col("n").cast("double")
    sy = F.col("sy_long").cast("double")
    syy = F.col("syy_long").cast("double")
    corr = (n * F.col("sxy") - F.col("sx") * sy) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (n * syy - sy * sy)
    )
    return agg.select(
        "event_type",
        "n",
        F.round(corr, 6).alias("corr_value_quantity"),
    )


HISTOGRAM_BINS = 10


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of the order-value distribution — the
    dashboard distribution panel as one pass: global min/max from a tiny
    aggregate broadcast back, bin index computed MAP-SIDE with the exact
    expression the oracle mirrors (floor of one correctly-rounded IEEE
    chain; the max value clamps into the last bin), then a |bins|-row
    count aggregate."""
    ev = load_table(spark, sf_dir, "events")
    ext = ev.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    width_safe = F.greatest(F.col("mx") - F.col("mn"), F.lit(1e-30))
    bin_ix = F.least(
        F.lit(HISTOGRAM_BINS - 1).cast("double"),
        F.floor((F.col("value") - F.col("mn")) * F.lit(float(HISTOGRAM_BINS)) / width_safe).cast("double"),
    ).cast("long")
    return (
        ev.join(F.broadcast(ext))
        .select(bin_ix.alias("bin"), "value", "mn", "mx")
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


def daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares trend of daily purchase revenue over time —
    the `regr_slope`/`regr_intercept` aggregates from decimal-exact power
    sums.  Two-level: the daily rollup first (date-keyed aggregate), then
    the regression over the |days|-row series — x is exact epoch-day
    integers, y the decimal-exact daily revenue, so both power sums are
    deterministic and the slope/intercept are single correctly-rounded
    IEEE expressions.  Output: one row."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(dsum("value").alias("rev"))
        .select(F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long").alias("x"), "rev")
    )
    agg = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx_long"),
        F.sum(F.col("rev").cast("decimal(25,6)")).cast("double").alias("sy"),
        F.sum((F.col("x").cast("double") * F.col("rev")).cast("decimal(30,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_long"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx_long").cast("double")
    sxx = F.col("sxx_long").cast("double")
    slope = (n * F.col("sxy") - sx * F.col("sy")) / (n * sxx - sx * sx)
    intercept = (F.col("sy") - slope * sx) / n
    return agg.select(
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
    )


def dense_hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: every hour between the corpus min and max
    gets a row, zero-filled where no purchases landed — the densification
    step a dashboard or forecasting job needs (missing hours must read as
    0, not be absent).

    Shape: the dense axis comes from ONE ``sequence()`` row exploded into
    |hours| rows — bounded by the time span, never by data volume — then
    a broadcast-right left join against the hourly aggregate.  At 100 TB
    the aggregate side shrinks to |hours| rows long before the join, so
    both join inputs are axis-sized."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("order_count"), dsum("value").alias("total_revenue"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    axis = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    return axis.join(hourly, "hour", "left").select(
        "hour",
        F.coalesce(F.col("order_count"), F.lit(0)).cast("long").alias("order_count"),
        F.coalesce(F.col("total_revenue"), F.lit(0.0)).alias("total_revenue"),
    )


FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FUNNEL_WINDOW = "INTERVAL 24 HOURS"  # max step-to-step delay


def _funnel_chain(ev: DataFrame) -> list[DataFrame]:
    """The min-chain funnel's per-user step-completion frames: element i
    is (user_id, t{i+1}) for users who completed step i+1.  Shared by
    ``funnel_steps`` and ``funnel_step_latency`` — one chain, one truth."""
    prev = None
    frames = []
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        sliced = ev.filter(F.col("event_type") == step)
        if prev is not None:
            sliced = sliced.join(prev, "user_id").filter(
                (F.col("ts") >= F.col(f"t{i - 1}"))
                & (F.col("ts") <= F.col(f"t{i - 1}") + F.expr(FUNNEL_WINDOW))
            )
        cur = sliced.groupBy("user_id").agg(F.min("ts").alias(f"t{i}"))
        frames.append(cur)
        prev = cur
    return frames


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed sequential conversion funnel (signup -> view -> click ->
    purchase): a user completes step k when an event of step k's type
    occurs within FUNNEL_WINDOW of their step-(k-1) completion time
    (min-chain matching, inclusive boundaries — the standard windowed
    product-analytics funnel; an unwindowed funnel is trivially complete
    on a dense fixture, so the window is also what makes the driver row
    falsifiable).  Output: how many users topped out at each step count
    (0..4) — exact integers.

    Shape: one filtered min-aggregate per step, each joined to the
    previous step's frame on user_id — 4 user-keyed shuffles over
    step-filtered slices (each far smaller than the corpus), never a
    per-user collect.  At 100 TB each stage would co-partition on the
    same user_id key so AQE reuses the exchange."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    users = ev.select("user_id").distinct()
    step_frames = [
        cur.select("user_id", F.lit(i).alias("step"))
        for i, cur in enumerate(_funnel_chain(ev), start=1)
    ]
    reached = users.join(
        step_frames[0].unionByName(step_frames[1])
        .unionByName(step_frames[2])
        .unionByName(step_frames[3]),
        "user_id",
        "left",
    ).groupBy("user_id").agg(
        F.coalesce(F.max("step"), F.lit(0)).cast("long").alias("steps_completed")
    )
    return reached.groupBy("steps_completed").agg(
        F.count("*").cast("long").alias("n_users")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-cohort retention: users grouped by their FIRST
    purchase day (the cohort), counted on every later day they purchased
    again — the retention matrix behind every product-analytics
    dashboard.  Purchases at day granularity are genuinely sparse on the
    fixture (~0.35 user-days), so the curve is non-trivial and the driver
    row falsifiable; offset 0 is retention 1.0 by construction — a
    built-in self-check row.

    All integer/exact: days are epoch-day longs, retention is one
    round-6 division of exact counts.  Shape: first-purchase day is one
    user-keyed min-aggregate joined back; the matrix itself is a
    (cohort, offset)-keyed count of distinct users — bounded by days²,
    not data volume."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
    activity = ev.select("user_id", day.alias("day")).distinct()
    first = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cohort_sizes = first.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_users")
    )
    matrix = (
        activity.join(first, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").cast("long").alias("active_users"))
    )
    return matrix.join(cohort_sizes, "cohort_day").select(
        "cohort_day",
        "day_offset",
        "active_users",
        F.round(
            F.col("active_users").cast("double") / F.col("cohort_users").cast("double"), 6
        ).alias("retention"),
    )


def sketch_rollup_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: the reference's AggregatingMergeTree
    ``uniqState``/``uniqMerge`` pattern (ClickHouse materializes partial
    uniq states per granule and merges them at read), re-expressed with
    Spark's DataSketches HLL — ``hll_sketch_agg`` builds an HOURLY sketch
    per group, ``hll_union_agg`` merges the stored hourly states up to the
    DAILY estimate.  This is THE pattern for 100 TB distinct-count rollups:
    the raw column is touched once, every coarser grain re-aggregates
    O(hours) fixed-size binary states instead of rescanning events.

    Sketch binaries differ across engines, so the driver-visible contract
    is the usual exact-plus-tolerance shape (``approx_distinct_users``):
    exact daily distincts plus a boolean asserting the MERGED estimate
    landed within 2% (at fixture cardinality the sparse-mode sketch is
    lossless; the bound leaves room for dense-mode at larger SFs)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    hourly = ev.groupBy(day, F.date_trunc("hour", "ts").alias("hour")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    merged = hourly.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = ev.groupBy(day).agg(F.countDistinct("user_id").alias("exact_users"))
    rel_err = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    )
    return exact.join(merged, "day").select(
        "day",
        "exact_users",
        (rel_err <= 0.02).alias("merged_sketch_within_2pct"),
    )


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clipped) per-type value statistics — the
    outlier-robust dashboard aggregate, and the broadcast-scalar pattern
    done right at scale: the two global percentiles reduce to ONE tiny row
    that broadcasts back over the fact scan (no self-join, no second
    shuffle of raw data), clipping is map-side, and the per-type aggregate
    is the only real shuffle.  Clipped-row counts make the tail visible.

    Exact interpolated percentiles match across engines (the
    value_percentiles contract); the winsorized sum rides the usual
    decimal-exact dsum."""
    ev = load_table(spark, sf_dir, "events")
    pct = ev.agg(
        F.expr("percentile(value, array(0.05, 0.95))").alias("p")
    ).select(
        F.element_at("p", 1).alias("lo"), F.element_at("p", 2).alias("hi")
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(pct))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_clipped_low"),
            F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_clipped_high"),
            dsum(clipped).alias("winsorized_total"),
        )
    )


EQUIDEPTH_BUCKETS = 10


def value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram (the optimizer-statistics / monitoring
    companion to the equal-width ``value_histogram``): bucket boundaries
    are the exact interpolated deciles, so each bucket holds ~10% of rows
    regardless of skew.

    Scale shape: NOT ntile — a global ntile is a single-reducer sort.
    The 9 boundaries reduce to ONE broadcast row (the winsorized-stats
    discipline); bucket index is computed MAP-SIDE as the count of
    boundaries strictly below the value (deterministic under ties, the
    expression the oracle mirrors); the final aggregate is 10 keys.
    Exact interpolated percentiles match across engines (the
    value_percentiles contract), and double comparisons against them are
    exact."""
    ev = load_table(spark, sf_dir, "events")
    qs = [i / EQUIDEPTH_BUCKETS for i in range(1, EQUIDEPTH_BUCKETS)]
    bounds = ev.agg(
        F.expr(f"percentile(value, array({', '.join(str(q) for q in qs)}))").alias("bs")
    )
    bucket = F.aggregate(
        F.col("bs"),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(F.col("value") > b, 1).otherwise(0),
    )
    return (
        ev.join(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


def interpolated_hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly revenue with LINEAR INTERPOLATION — the
    time-series imputation step (pandas ``interpolate(method='linear')``
    / TimescaleDB ``interpolate()``) where a missing hour reads as the
    straight line between its nearest present neighbors, not as zero.

    Shape: dense axis (sequence-exploded, span-bounded) left-joined to
    the hourly aggregate, then IGNORE-NULLS running last/first over the
    axis pick each gap's neighbors.  The single-partition window is
    AXIS-sized — |hours| rows regardless of data volume — so the
    "no partition" shape is correct here, not a scale bug (a multi-year
    axis would window per month and stitch the seams).

    The lerp prev + (next-prev) * dh/dn runs on exact integer epoch-hour
    deltas with one division — the identical expression tree on both
    engines, so interpolated values are bit-identical; edge hours with
    only one neighbor coalesce to it."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("order_count"), dsum("value").alias("total_revenue"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    axis = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    joined = axis.join(hourly, "hour", "left").select(
        "hour",
        F.coalesce(F.col("order_count"), F.lit(0)).cast("long").alias("order_count"),
        "total_revenue",
        F.expr("unix_seconds(hour) DIV 3600").alias("eh"),
    )
    w_prev = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("hour").rowsBetween(0, Window.unboundedFollowing)
    present_eh = F.when(F.col("total_revenue").isNotNull(), F.col("eh"))
    prev_v = F.last("total_revenue", ignorenulls=True).over(w_prev)
    prev_h = F.last(present_eh, ignorenulls=True).over(w_prev)
    next_v = F.first("total_revenue", ignorenulls=True).over(w_next)
    next_h = F.first(present_eh, ignorenulls=True).over(w_next)
    lerp = prev_v + (next_v - prev_v) * (
        (F.col("eh") - prev_h).cast("double") / (next_h - prev_h).cast("double")
    )
    filled = (
        F.when(F.col("total_revenue").isNotNull(), F.col("total_revenue"))
        .when(prev_h.isNull(), next_v)
        .when(next_h.isNull(), prev_v)
        .otherwise(lerp)
    )
    return joined.select(
        "hour",
        "order_count",
        filled.alias("revenue_filled"),
        F.col("total_revenue").isNull().alias("was_interpolated"),
    )


def user_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix via sketch algebra: for every pair of event
    types, the number of SHARED users estimated by inclusion-exclusion
    over HLL sketches — |A∩B| = |A| + |B| - |A∪B| — with only the 6
    per-type sketch states ever leaving the scan.  This is the
    set-operation face of the mergeable-sketch family: intersections are
    not directly mergeable, but unions are, and inclusion-exclusion turns
    union algebra into overlap analytics (the ClickHouse
    uniqCombined-across-segments pattern).

    Scale shape: ONE pass builds |types| fixed-size states; the pair
    expansion is a broadcast self-join of a 6-row frame.  Driver contract
    is the sketch family's exact-plus-tolerance shape: exact shared
    counts plus a boolean asserting the estimate landed within 5% (three
    compounded estimates; sparse-mode states at fixture cardinality are
    near-lossless)."""
    ev = load_table(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.countDistinct("user_id").alias("n_users"),
    )
    a = sketches.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_users").alias("n_a"),
    )
    b = sketches.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_users").alias("n_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    est_shared = (
        F.hll_sketch_estimate("sk_a") + F.hll_sketch_estimate("sk_b") - est_union
    )
    exact = (
        ev.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            ev.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("user_id").alias("exact_shared"))
    )
    est = pairs.select("type_a", "type_b", est_shared.alias("est_shared"))
    rel_err = F.abs(F.col("est_shared") - F.col("exact_shared")) / F.col("exact_shared")
    return exact.join(est, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_shared",
        (rel_err <= 0.05).alias("sketch_within_5pct"),
    )


SEQ_FIRST, SEQ_THEN = "signup", "purchase"  # the matched pattern, in order


def event_sequence_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch``/``sequenceCount`` parity: per user, did
    a '(?1).*(?2)' pattern (SEQ_FIRST then SEQ_THEN, any gap) occur in
    event-time order, and how many NON-OVERLAPPING times (ClickHouse's
    greedy left-to-right scan: take the first SEQ_FIRST, then the first
    SEQ_THEN after it, count, reset).  That scan is exactly the
    non-overlapping lazy-regex count of 'A.*?B' over the user's symbol
    string, which both Spark (regexp_count, successive find()) and DuckDB
    (regexp_extract_all, RE2 lazy) implement identically — so the oracle
    is value-exact, not a reimplementation.

    Shape: filter to the two event types FIRST (map-side; at 100 TB the
    pushed-down predicate is what keeps the shuffle proportional to the
    pattern-relevant slice, not the firehose), then ONE user-keyed
    aggregate building the per-user symbol string via array_sort on
    (ts, event_id, sym) structs — bounded by per-user event counts, the
    same assumption sessionization makes.  Ties break on event_id so the
    string is deterministic.  Reference analog: the ClickHouse
    sequence-analytics surface over the events firehose of
    /root/reference/clickhouse/init/01_init.sql:24-41."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(SEQ_FIRST, SEQ_THEN)
    )
    sym = F.when(F.col("event_type") == SEQ_FIRST, "A").otherwise("B")
    seqs = (
        ev.select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id"), sym.alias("s")).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list("e")), lambda e: e["s"])
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.regexp_count(F.col("seq"), F.lit("A.*?B")).cast("long").alias("seq_count"),
        (F.regexp_count(F.col("seq"), F.lit("A.*?B")) > 0)
        .cast("long")
        .alias("matched"),
    )


def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event streams:
    for each user's events in (ts, event_id) order, count every adjacent
    (from_type -> to_type) pair — the transition matrix behind user-path
    sankeys and next-action models (ClickHouse does this with
    groupArray + arrayZip over sorted events).

    Shape: ONE window lag partitioned by user (the sessionization
    shuffle), then a tiny (|types|^2)-row count — no per-user collect,
    no driver loop.  The deterministic (ts, event_id) tiebreak makes the
    adjacency — and therefore every count — engine-portable and exact."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy(F.col("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


def window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(24h, 'strict_order')`` analog: the ClickHouse strict
    funnel where ANY intervening event (matching or not) breaks the chain,
    and every chained step must land within FUNNEL_WINDOW of the chain's
    FIRST event (ClickHouse `windowFunnel` anchors the window at step 1;
    the min-chain `funnel_steps` above re-anchors per step — deliberately
    different semantics, both oracle-checked).

    Key identity that makes strict order SQL-expressible WITHOUT a
    per-user fold: because any other event breaks the chain, a level-k
    chain is exactly k CONSECUTIVE rows of the user's (ts, event_id)-
    sorted stream matching steps 1..k in order.  So each signup row's
    attainable level is readable from ``lead()`` columns — one window
    shuffle on user_id, no collect_list, no HOF state machine.  At 100 TB
    this is the sessionization exchange (bounded per-user state), and the
    lead() frame is O(#steps) rows regardless of corpus size."""
    return _window_funnel_strict(spark, sf_dir, FUNNEL_WINDOW)


def _window_funnel_strict(
    spark: SparkSession, sf_dir: str, window_expr: str
) -> DataFrame:
    """Parameterized body — tests call it with an unbounded window to pin
    that the production 24h window actually BINDS on the fixture."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt_t = [F.lead("event_type", i).over(w) for i in (1, 2, 3)]
    nxt_ts = [F.lead("ts", i).over(w) for i in (1, 2, 3)]
    deadline = F.col("ts") + F.expr(window_expr)
    lv = (
        F.when(
            F.col("event_type") == FUNNEL_STEPS[0],
            F.when(
                (nxt_t[0] == FUNNEL_STEPS[1]) & (nxt_ts[0] <= deadline),
                F.when(
                    (nxt_t[1] == FUNNEL_STEPS[2]) & (nxt_ts[1] <= deadline),
                    F.when(
                        (nxt_t[2] == FUNNEL_STEPS[3]) & (nxt_ts[2] <= deadline),
                        F.lit(4),
                    ).otherwise(F.lit(3)),
                ).otherwise(F.lit(2)),
            ).otherwise(F.lit(1)),
        ).otherwise(F.lit(0))
    )
    per_user = ev.withColumn("lv", lv).groupBy("user_id").agg(
        F.max("lv").cast("long").alias("steps_completed")
    )
    return per_user.groupBy("steps_completed").agg(
        F.count("*").cast("long").alias("n_users")
    )


def minmax_map_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``minMap`` / ``maxMap`` combinator analog — completes the Map
    aggregation family next to ``summap_event_values``: per day, the
    sorted event-type key list with positionally-aligned per-key min and
    max values.  Same two-level shape (the wide map never exists
    pre-aggregation; arrays bounded by the key DOMAIN), same CSV
    serialization contract; min/max are SELECTION (no arithmetic), so
    the decimal rendering is exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.min(F.col("value").cast("decimal(25,6)")).alias("mn"),
        F.max(F.col("value").cast("decimal(25,6)")).alias("mx"),
    )
    kv = F.sort_array(F.collect_list(F.struct("event_type", "mn", "mx")))
    return per.groupBy("day").agg(
        F.array_join(
            F.transform(kv, lambda x: x["event_type"]), ","
        ).alias("keys_csv"),
        F.array_join(
            F.transform(kv, lambda x: x["mn"].cast("string")), ","
        ).alias("mins_csv"),
        F.array_join(
            F.transform(kv, lambda x: x["mx"].cast("string")), ","
        ).alias("maxs_csv"),
    )


UNIQ_UPTO_SMALL = 10
UNIQ_UPTO_LARGE = 1000


def uniq_upto_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``uniqUpTo(N)`` analog (ClickHouse's capped exact-distinct): per
    event type, the exact distinct-user count reported as min(distinct,
    N+1) for a small and a large N — the "exactly how many, unless more
    than N" contract dashboards use for threshold alarms.

    Spark's partial aggregation dedupes (type, user) pairs map-side, so
    the distinct shuffle carries |distinct| rows, not the corpus; the
    cap is then a scalar ``least``.  (ClickHouse additionally bounds
    per-state MEMORY at N — in Spark that bounded-state role belongs to
    the sketch family: ``approx_distinct_users`` / the theta/HLL MVs.)
    Both cap branches fire across the SF ladder: N=10 always saturates,
    N=1000 only at sf0.1's 1500 users — falsifiable either way."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("nd"),
        F.count("*").cast("long").alias("n_events"),
    )
    return d.select(
        "event_type",
        "n_events",
        F.least(F.col("nd"), F.lit(UNIQ_UPTO_SMALL + 1))
        .cast("long")
        .alias("uniq_upto_10"),
        F.least(F.col("nd"), F.lit(UNIQ_UPTO_LARGE + 1))
        .cast("long")
        .alias("uniq_upto_1000"),
        (F.col("nd") > UNIQ_UPTO_SMALL).alias("small_cap_hit"),
    )


def hourly_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly order revenue with LAST-OBSERVATION-CARRIED-
    FORWARD — the OTHER fill mode next to ``interpolated_hourly_series``'s
    lerp (TimescaleDB ``locf()`` / pandas ``ffill``): a missing hour
    repeats the last present hour's value, the step-function semantics a
    gauge (inventory level, account balance) needs where interpolation
    would invent readings.  Leading gaps are impossible by construction:
    the dense axis starts at the FIRST observed hour, so every axis row
    has a prior (or same-row) observation to carry.

    Shape: the interpolation op's dense-axis pattern — span-bounded
    sequence explode, one left join, one IGNORE-NULLS running
    last_value over the axis-sized frame (|hours| rows regardless of
    corpus size)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        dsum("value").alias("revenue")
    )
    span = hourly.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    axis = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    filled = axis.join(hourly, "hour", "left").select(
        "hour",
        F.col("revenue").isNotNull().alias("observed"),
        F.last("revenue", ignorenulls=True).over(w).alias("revenue_locf"),
    )
    return filled


AB_VARIANTS = 4  # deterministic hash-assignment arms


def ab_assignment_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B assignment + sample-ratio-mismatch audit — the
    experimentation primitive ClickHouse deployments run with
    cityHash-modulo splits: each user hashes into one of AB_VARIANTS
    arms (md5-based, seedable, engine-portable), and the SRM check
    compares observed arm sizes against the uniform expectation with
    per-arm chi-square contributions (the alarm every A/B platform
    fires before trusting a readout).

    Exactness: assignment is integer md5 arithmetic; expected share is
    one mirrored division; the chi2 contribution (obs-exp)^2/exp is a
    3-op mirrored IEEE chain over exact integers.  ONE distinct-user
    aggregate then a |variants|-row rollup."""
    from ..functions.hashing import stable_hash64

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = F.pmod(stable_hash64(F.concat(F.lit("ab:v1:"), F.col("user_id"))), F.lit(AB_VARIANTS))
    per = users.select(arm.cast("long").alias("variant")).groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users")
    )
    tot = per.agg(F.sum("n_users").cast("long").alias("n_total"))
    exp = F.col("n_total").cast("double") / F.lit(float(AB_VARIANTS))
    dev = F.col("n_users").cast("double") - exp
    return per.crossJoin(F.broadcast(tot)).select(
        "variant",
        "n_users",
        "n_total",
        F.round((dev * dev) / exp, 6).alias("chi2_contrib"),
    )


PATH_TOPK = 10  # most-common event trigram paths kept


def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-event behavior paths (the "what do users do"
    flow report product analytics teams read daily): per user, the
    (ts, event_id)-ordered event-type sequence, sliced into overlapping
    trigrams, counted corpus-wide, ranked.

    Shape: ONE user-keyed sorted collect (bounded by per-user activity,
    the sessionization bound), a map-side HOF slice into trigram
    strings (no second shuffle for the slicing), one vocabulary-keyed
    count, TakeOrderedAndProject for the top-10 — ties broken on the
    path string, so the ranking is deterministic."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda x: x["event_type"],
    )
    per_user = ev.groupBy("user_id").agg(seq.alias("seq"))
    tri = F.transform(
        F.sequence(F.lit(1), F.size("seq") - 2),
        lambda i: F.concat_ws(
            ">",
            F.element_at("seq", i),
            F.element_at("seq", i + 1),
            F.element_at("seq", i + 2),
        ),
    )
    paths = per_user.filter(F.size("seq") >= 3).select(
        F.explode(tri).alias("path")
    )
    w = Window.orderBy(F.desc("n_paths"), F.asc("path"))
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(PATH_TOPK)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def yoy_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the BI staple: each
    month's decimal-exact revenue against the same month one year
    earlier, with the growth ratio (one mirrored division; months
    without a prior-year counterpart report NULL growth rather than a
    fabricated baseline).

    Shape: one month-keyed aggregate, one self-join on the shifted
    month key — both |months|-sized."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(F.count("*").cast("long").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    prior = monthly.select(
        (F.col("ym") + 100).alias("ym"), F.col("revenue").alias("prior_revenue")
    )
    return monthly.join(prior, "ym", "left").select(
        "ym",
        "n_orders",
        "revenue",
        "prior_revenue",
        F.round(F.col("revenue") / F.col("prior_revenue"), 6).alias("yoy_ratio"),
    )


def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users — the growth-accounting split
    every product dashboard leads with: a user is NEW on their first
    active day, RETURNING on any later active day.

    Shape: one (user, day) distinct aggregate; first-day via a per-user
    min that rides the same exchange (partial-agg on a prefix of the
    keys); then a |days|-sized conditional rollup.  All exact
    integers."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n_events")
    )
    w_first = Window.partitionBy("user_id")
    marked = ud.withColumn("first_day", F.min("day").over(w_first))
    return marked.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(F.when(F.col("day") != F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("returning_users"),
        F.count("*").cast("long").alias("dau"),
    )


def power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The power-user curve (Lenny/a16z "L30" engagement histogram): how
    many users were active on exactly k distinct days of the fixture's
    window — the shape that separates a daily-habit product (smile
    curve) from a drive-by one (decay curve).

    Shape: one (user, day) distinct pass, one per-user count, one
    |days|-bounded histogram — three exact-integer aggregates, each
    map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("active_days"))
    )
    return per_user.groupBy("active_days").agg(
        F.count("*").cast("long").alias("n_users")
    )


WILSON_Z = 1.96  # 95% normal quantile, fixed literal (no erf anywhere)


def conversion_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm conversion rate with the WILSON score interval — the A/B
    readout that pairs with ``ab_assignment_srm``: Wilson is the
    interval practitioners use at small n / extreme rates where the
    Wald interval breaks (it never leaves [0,1]).

    Conversion = the user has a purchase event.  The interval
    ((p + z^2/2n) -+ z*sqrt(p(1-p)/n + z^2/4n^2)) / (1 + z^2/n) is a
    composed +,-,*,/,sqrt chain over exact integers with the z literal
    — textually mirrored in the oracle, so value-portable (the
    welch_ttest discipline; no erf/log anywhere).  ONE distinct-user
    aggregate with a conditional max for the converted flag, then a
    |arms|-row projection."""
    from ..functions.hashing import stable_hash64

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    arm = F.pmod(
        stable_hash64(F.concat(F.lit("ab:v1:"), F.col("user_id"))),
        F.lit(AB_VARIANTS),
    )
    g = per_user.select(arm.cast("long").alias("variant"), "converted").groupBy(
        "variant"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    n = F.col("n").cast("double")
    p = F.col("n_converted").cast("double") / n
    z = F.lit(WILSON_Z)
    z2 = z * z
    center = p + z2 / (F.lit(2.0) * n)
    margin = z * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
    denom = F.lit(1.0) + z2 / n
    return g.select(
        "variant",
        "n",
        "n_converted",
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("ci_lo"),
        F.round((center + margin) / denom, 6).alias("ci_hi"),
    )


GINI_SPLITS = tuple(float(x) for x in (20, 40, 60, 80, 100, 150))


def split_gini_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split scoring by GINI IMPURITY — the feature-
    selection primitive (CART / feature-importance reports): for each
    candidate threshold on event value, the weighted child impurity of
    splitting the binary label "is purchase", and the gain vs the root.

    Gini is RATIONAL arithmetic (1 - sum p^2 — no logs, unlike
    entropy/information-gain, which is why it is the portable choice):
    every impurity is built from exact integer counts with composed
    *,/,- chains mirrored textually.  ONE conditional aggregate pulls
    all per-threshold left/right x pos/neg counts in a single pass
    (the quality_pr_sweep shape), then a |thresholds|-row projection."""
    ev = load_table(spark, sf_dir, "events")
    pos = (F.col("event_type") == "purchase").cast("int")
    aggs = [
        F.count("*").cast("long").alias("n_total"),
        F.sum(pos).cast("long").alias("n_pos"),
    ]
    for t in GINI_SPLITS:
        left = F.col("value") < F.lit(t)
        tag = str(int(t))
        aggs.append(F.sum(F.when(left, 1).otherwise(0)).cast("long").alias(f"nl_{tag}"))
        aggs.append(
            F.sum(F.when(left, pos).otherwise(0)).cast("long").alias(f"npl_{tag}")
        )
    g = ev.agg(*aggs)

    def gini(n_pos, n_all):
        p = n_pos.cast("double") / n_all.cast("double")
        return F.lit(1.0) - (p * p + (F.lit(1.0) - p) * (F.lit(1.0) - p))

    root = gini(F.col("n_pos"), F.col("n_total"))
    rows = []
    for t in GINI_SPLITS:
        tag = str(int(t))
        nl, npl = F.col(f"nl_{tag}"), F.col(f"npl_{tag}")
        nr, npr = F.col("n_total") - nl, F.col("n_pos") - npl
        wl = nl.cast("double") / F.col("n_total").cast("double")
        wr = nr.cast("double") / F.col("n_total").cast("double")
        child = wl * gini(npl, nl) + wr * gini(npr, nr)
        rows.append(
            F.struct(
                F.lit(t).alias("threshold"),
                nl.alias("n_left"),
                F.round(root - child, 6).alias("gini_gain"),
            )
        )
    return (
        g.select(F.explode(F.array(*rows)).alias("s"), root.alias("root_gini"))
        .select(
            F.col("s.threshold").alias("threshold"),
            F.col("s.n_left").alias("n_left"),
            F.round(F.col("root_gini"), 6).alias("root_gini"),
            F.col("s.gini_gain").alias("gini_gain"),
        )
    )


RFM_SPEND_BAND = 10000.0  # spend scored at band grain (bounded domain)


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic CRM rollup: days since last order, order count, and
    decimal-exact spend per customer, each scored 1-5 against exact
    quintile THRESHOLDS, then segment sizes + extremes.

    Scale discipline: no global ntile (a partition-less window ships
    every customer to one task).  Each metric is scored on a BOUNDED
    domain — recency in days (calendar-bounded), frequency in order
    counts (small ints), spend at RFM_SPEND_BAND grain (price-range-
    bounded) — via the percentile_merge_mv walk: value-frequency
    aggregate, domain-sized cumulative window, integer cross-multiplied
    quintile thresholds (q_k = min v with cum*5 >= tot*k), broadcast
    back.  Scores are pure integer comparisons; a higher score is
    better on every axis (recency inverted).  Output is <=125 segment
    rows."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("mx"))
    per = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.count("*").cast("long").alias("freq"),
        dsum("o_totalprice").alias("spend"),
    ).crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("mx", "last_d").cast("long").alias("recency_days"),
        "freq",
        (F.floor(F.col("spend") / F.lit(RFM_SPEND_BAND))).cast("long").alias(
            "spend_band"
        ),
        "spend",
    )

    def quintile_thresholds(metric: str):
        vf = per.groupBy(metric).agg(F.count("*").alias("cnt"))
        w_cum = Window.orderBy(metric).rowsBetween(Window.unboundedPreceding, 0)
        cum = vf.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
            "tot", F.sum("cnt").over(Window.partitionBy())
        )
        return cum.agg(
            *[
                F.min(
                    F.when(F.col("cum") * 5 >= F.col("tot") * k, F.col(metric))
                ).alias(f"q{k}")
                for k in (1, 2, 3, 4)
            ]
        )

    def score(metric: str, invert: bool):
        t = quintile_thresholds(metric)
        v = F.col(metric)
        raw = (
            F.lit(1)
            + (v > F.col("q1")).cast("int")
            + (v > F.col("q2")).cast("int")
            + (v > F.col("q3")).cast("int")
            + (v > F.col("q4")).cast("int")
        )
        return t, (F.lit(6) - raw if invert else raw)

    tr, r_sc = score("recency_days", invert=True)  # fresher = higher
    tf, f_sc = score("freq", invert=False)
    tm, m_sc = score("spend_band", invert=False)
    scored = (
        per.crossJoin(F.broadcast(tr.select(*[F.col(f"q{k}").alias(f"q{k}") for k in (1, 2, 3, 4)])))
        .withColumn("r_score", r_sc.cast("long"))
        .drop("q1", "q2", "q3", "q4")
        .crossJoin(F.broadcast(tf))
        .withColumn("f_score", f_sc.cast("long"))
        .drop("q1", "q2", "q3", "q4")
        .crossJoin(F.broadcast(tm))
        .withColumn("m_score", m_sc.cast("long"))
        .drop("q1", "q2", "q3", "q4")
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.max("recency_days").alias("worst_recency_days"),
        F.min("freq").alias("min_orders"),
        dsum("spend").alias("segment_spend"),
    )


K_ANON = 5  # group-size threshold for the k-anonymity audit


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy gate a
    training-data release runs: customers grouped by the
    (nation, market-segment) quasi-identifier tuple; a group smaller
    than k means its members are re-identifiable by those attributes
    alone.  Output per nation: group count, how many groups (and
    people) sit below k, and the minimum group size — the fix list for
    suppression/generalization.

    Shape: one (nation, segment) count aggregate (map-side combined),
    then a |nations|-bounded rollup with conditional sums — all exact
    integers."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    groups = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("gsize"))
    )
    small = F.col("gsize") < K_ANON
    return groups.groupBy(F.col("n_name").alias("nation")).agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0)).cast("long").alias("n_small_groups"),
        F.sum(F.when(small, F.col("gsize")).otherwise(0))
        .cast("long")
        .alias("n_reidentifiable_people"),
        F.min("gsize").cast("long").alias("min_group_size"),
        (F.min("gsize") >= K_ANON).alias("k_anonymous"),
    )


def daily_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars over the event value stream
    — the candlestick rollup ClickHouse demos with argMin/argMax, and
    the downsampled shape any metrics store exports to charting.

    Open/close are value-at-extremum struct aggregates on the total
    (ts, event_id) ordering (the argminmax_battery discipline — merge-
    associative, so they partial-aggregate map-side); high/low are plain
    extrema; volume and the decimal-exact turnover ride the same single
    (day) shuffle.  Output is |days| rows regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    by_time = F.struct("ts", "event_id", "value")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.min(by_time).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(by_time).getField("value").alias("close"),
        F.count("*").cast("long").alias("volume"),
        dsum("value").alias("turnover"),
    )


def bitwise_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBitAnd`` / ``groupBitOr`` / ``groupBitXor`` parity
    (ClickHouse's bitwise aggregates — flag-mask consolidation over
    per-row permission/feature bitmaps): per event type over the
    user_id words, plus the OR of the low byte (a bounded-domain mask a
    dashboard can render).  Bitwise ops are associative+commutative,
    so these partial-aggregate map-side like any sum; exact integers in
    any engine — one shuffle, zero float work."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").cast("long").alias("uid_bit_and"),
        F.bit_or("user_id").cast("long").alias("uid_bit_or"),
        F.bit_xor("user_id").cast("long").alias("uid_bit_xor"),
        F.bit_or(F.col("user_id") % 256).cast("long").alias("low_byte_or"),
        F.count("*").cast("long").alias("n_events"),
    )


def distinct_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``-Distinct`` combinator parity (ClickHouse's ``sumDistinct`` /
    ``avgDistinct`` / ``uniqExact``): per event type, aggregates over the
    DISTINCT value multiset — the dedup-before-aggregate shape metric
    pipelines use when upstream retries duplicate measurements.

    Spark plans distinct aggregates with a map-side-deduped expand: the
    shuffle carries |distinct (type, value)| rows, never the corpus.
    EVERY output is int64 (r12): the distinct sum ships as EXACT INTEGER
    MICROS ``sum_distinct_micros = sum_distinct(value_micros)`` and
    avgDistinct as ``avg_micros = (2*S6 + n) div (2*n)`` (round-half-up
    of S6/n in pure int64 arithmetic).  Three gate rounds proved that
    ANY decimal- or engine-evaluated-double-typed output on this row
    (raw division r9, decimal->double floor chain r10, the raw
    ``sum_distinct(decimal)`` carry r11) can split across DuckDB builds
    while bit-identical locally; pure int64 outputs are bit-equal in
    every engine, every version (the SURVEY §5 class-4 rule, now the
    type-level no-decimal-output contract pinned in
    ``test_oracle_parity``)."""
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(25,6)")
    # decimal(25,6) * 1e6 has an exactly-zero fractional part, so the
    # long cast is exact — micros are a bijective integer rendering.
    micros = (vdec * F.lit(1000000)).cast("long")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("value").cast("long").alias("n_distinct_values"),
        F.sum_distinct(micros).cast("long").alias("sum_distinct_micros"),
        F.count("*").cast("long").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_distinct_values",
        "sum_distinct_micros",
        F.expr(
            "(2 * sum_distinct_micros + n_distinct_values)"
            " div (2 * n_distinct_values)"
        )
        .cast("long")
        .alias("avg_micros"),
        "n_events",
    )


QCONV_PS = (25, 50, 75)  # percent points evaluated under both conventions


def quantile_conventions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``quantileExactExclusive`` / ``quantileExactInclusive`` analogs
    (ClickHouse's R-6/R-7 interpolation conventions; R-7 is what Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` implement): per event
    type, p25/p50/p75 under BOTH conventions from explicit order
    statistics — exclusive rank h = (n+1)p, inclusive h = 1+(n-1)p,
    clamped to [1, n], value = x_lo + (h - floor(h)) * (x_hi - x_lo).

    Shape: the weighted-percentiles pattern — ONE value-frequency
    aggregate (map-side combined, |distinct values| rows), a per-type
    cumulative window over that domain-bounded frame, then one
    conditional-min aggregate pulling all 12 order statistics at once
    (x_k = min value with cum >= k; values ascend, so the conditional
    min IS the k-th order statistic).  No global sort, no per-row rank;
    the interpolation is 3 mirrored IEEE ops per quantile."""
    ev = load_table(spark, sf_dir, "events")
    vf = ev.groupBy("event_type", "value").agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("event_type").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("event_type")
    cum = vf.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    nd = F.col("n").cast("double")

    def h_of(conv: str, pp: int):
        p = F.lit(pp).cast("double") / F.lit(100.0)
        h = (nd + F.lit(1.0)) * p if conv == "excl" else F.lit(1.0) + (
            nd - F.lit(1.0)
        ) * p
        return F.greatest(F.lit(1.0), F.least(h, nd))

    aggs = [F.max("n").cast("long").alias("n_events")]
    for conv in ("excl", "incl"):
        for pp in QCONV_PS:
            h = h_of(conv, pp)
            aggs.append(F.max(h).alias(f"h_{conv}_{pp}"))
            aggs.append(
                F.min(F.when(F.col("cum") >= F.floor(h), F.col("value"))).alias(
                    f"xlo_{conv}_{pp}"
                )
            )
            aggs.append(
                F.min(F.when(F.col("cum") >= F.ceil(h), F.col("value"))).alias(
                    f"xhi_{conv}_{pp}"
                )
            )
    g = cum.groupBy("event_type").agg(*aggs)
    outs = [F.col("event_type"), F.col("n_events")]
    for conv in ("excl", "incl"):
        for pp in QCONV_PS:
            h, xlo, xhi = (
                F.col(f"h_{conv}_{pp}"),
                F.col(f"xlo_{conv}_{pp}"),
                F.col(f"xhi_{conv}_{pp}"),
            )
            outs.append(
                (xlo + (h - F.floor(h)) * (xhi - xlo)).alias(f"p{pp}_{conv}")
            )
    return g.select(*outs)


TOPK_W = 10  # heavy hitters kept
TOPK_W_SALTS = 8  # pruning partitions in the candidate leg


def topk_weighted_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``topKWeighted`` analog (ClickHouse's weight-summed heavy
    hitters): the top-10 users by decimal-exact summed event value, with
    the exact-plus-recovered contract of ``top_event_types_sketch``.

    Exact leg: one user-keyed aggregate, then orderBy+limit — Catalyst
    compiles that to TakeOrderedAndProject (per-partition top-k, then a
    driver merge of k-row heads), so there is NO global sort at any
    corpus size.  Candidate leg: the two-phase pruning pattern a
    1000-executor deployment uses when even the aggregate's output is
    huge — each of TOPK_W_SALTS disjoint key partitions keeps its local
    top-10, and the global top-10 is re-ranked over the <=80 candidates.
    That pruning is PROVABLY lossless (a global top-10 key has at most 9
    heavier keys anywhere, so it is top-10 within its own partition),
    which is why ``pruned_exact`` is a hard invariant, not a tolerance:
    weights are positive and each key lives in exactly one partition.
    Ties break on user_id ascending in both legs and both engines."""
    ev = load_table(spark, sf_dir, "events")
    sums = ev.groupBy("user_id").agg(
        dsum("value").alias("wsum"), F.count("*").cast("long").alias("n_events")
    )
    w_all = Window.orderBy(F.desc("wsum"), F.asc("user_id"))
    exact = (
        sums.orderBy(F.desc("wsum"), F.asc("user_id"))
        .limit(TOPK_W)
        .withColumn("rank", F.row_number().over(w_all).cast("long"))
    )
    salted = sums.withColumn(
        "salt", F.pmod("user_id", F.lit(TOPK_W_SALTS))
    )
    w_salt = Window.partitionBy("salt").orderBy(F.desc("wsum"), F.asc("user_id"))
    cand = (
        salted.withColumn("rn", F.row_number().over(w_salt))
        .filter(F.col("rn") <= TOPK_W)
        .select("user_id", F.col("wsum").alias("c_wsum"))
    )
    cand_top = (
        cand.orderBy(F.desc("c_wsum"), F.asc("user_id"))
        .limit(TOPK_W)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("c_wsum"), F.asc("user_id")))
            .cast("long"),
        )
        .select("rank", F.col("user_id").alias("c_user"), "c_wsum")
    )
    return exact.join(cand_top, "rank").select(
        "rank",
        "user_id",
        F.col("wsum").cast("double").alias("weight_sum"),
        "n_events",
        (
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_wsum") == F.col("wsum"))
        ).alias("pruned_exact"),
    )


FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # 24h in epoch micros


def window_funnel_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(24h)`` analog in ClickHouse's DEFAULT mode — the
    variant funnel users hit first: intervening events do NOT break the
    chain (only ``strict_order`` does), and every chained step must land
    within the window of the chain's FIRST event.  Semantics mirror the
    ClickHouse fold exactly: each funnel level stores its chain's first
    timestamp; a step-1 event re-anchors level 1; a step-k event extends
    level k when level k-1 is reached and ts <= chain_first + window
    (reference behavior: the dashboard's event-chain queries,
    ``clickhouse/init-db.sh`` analytics family).  Tie order is the
    engine's deterministic (ts, event_id) refinement.

    Shape: per-user ordered fold — ONE user-keyed aggregate collecting
    the step-typed slice (non-funnel events pruned at the scan), then a
    Catalyst HOF ``F.aggregate`` over the sorted array with a 4-field
    chain-anchor struct.  Per-user state is 4 longs regardless of
    corpus size; the collected array is bounded by the user's funnel-
    typed events (the sessionization bound).  All comparisons are
    integer/epoch-micros — exact in any engine; the DuckDB oracle is an
    INDEPENDENT construction (the dau_wau precedent): greedy min-chain
    per signup anchor, provably equivalent to the fold (anchors only
    increase, so every fold chain maps to a single-anchor chain, and
    for a fixed anchor the earliest-next-step chain is optimal).  A
    mirrored grouped ``list_reduce`` oracle is NOT usable: DuckDB 1.0
    leaks cross-group state in grouped list_reduce at sf0.1's group
    count."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
    )
    idx = None
    for i, s in enumerate(FUNNEL_STEPS):
        branch = F.when(F.col("event_type") == s, F.lit(i))
        idx = branch if idx is None else idx.when(F.col("event_type") == s, F.lit(i))
    typed = ev.filter(F.col("event_type").isin(*FUNNEL_STEPS)).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        idx.cast("long").alias("idx"),
    )
    arr = F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "idx")))
    neg = F.lit(-1).cast("long")
    init = F.struct(
        neg.alias("f0"), neg.alias("f1"), neg.alias("f2"), neg.alias("f3")
    )
    w_us = F.lit(FUNNEL_WINDOW_US).cast("long")

    def step(acc, e):
        def upd(f0, f1, f2, f3):
            return F.struct(
                f0.alias("f0"), f1.alias("f1"), f2.alias("f2"), f3.alias("f3")
            )

        return (
            F.when(e["idx"] == 0, upd(e["ts_us"], acc["f1"], acc["f2"], acc["f3"]))
            .when(
                (e["idx"] == 1)
                & (acc["f0"] != neg)
                & (e["ts_us"] <= acc["f0"] + w_us),
                upd(acc["f0"], acc["f0"], acc["f2"], acc["f3"]),
            )
            .when(
                (e["idx"] == 2)
                & (acc["f1"] != neg)
                & (e["ts_us"] <= acc["f1"] + w_us),
                upd(acc["f0"], acc["f1"], acc["f1"], acc["f3"]),
            )
            .when(
                (e["idx"] == 3)
                & (acc["f2"] != neg)
                & (e["ts_us"] <= acc["f2"] + w_us),
                upd(acc["f0"], acc["f1"], acc["f2"], acc["f2"]),
            )
            .otherwise(acc)
        )

    folded = typed.groupBy("user_id").agg(
        F.aggregate(arr, init, step).alias("st")
    )
    lvl = (
        F.when(F.col("st")["f3"] != neg, F.lit(4))
        .when(F.col("st")["f2"] != neg, F.lit(3))
        .when(F.col("st")["f1"] != neg, F.lit(2))
        .when(F.col("st")["f0"] != neg, F.lit(1))
        .otherwise(F.lit(0))
    )
    per_user = folded.select("user_id", lvl.cast("long").alias("lvl"))
    users = ev.select("user_id").distinct()
    return (
        users.join(per_user, "user_id", "left")
        .select(
            "user_id", F.coalesce(F.col("lvl"), F.lit(0)).cast("long").alias("lvl")
        )
        .groupBy(F.col("lvl").alias("steps_completed"))
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def window_funnel_strict_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(24h, 'strict_dedup')`` — completes the ClickHouse
    funnel-mode family (default: interleaving allowed; strict_order: ANY
    event breaks the chain — ``window_funnel_strict``; this mode:
    a REPEAT of an already-satisfied step kills the chain, every other
    non-chain event — the error type, a later not-yet-reached step — is
    ignored).  A signup kills the live chain and re-anchors a fresh one;
    each step must land within the window of its chain's anchor.
    Reported per user: the MAX level any chain reached.

    Shape: one user-keyed ordered fold over the step-typed slice
    (non-funnel events pruned at the scan — they are invisible to this
    mode), per-user state 3 longs (best, level, anchor).  All
    comparisons are integer epoch-micros.  The DuckDB oracle is an
    INDEPENDENT construction: under dedup-interrupt the chain is
    determined by the NEXT RELEVANT event (earliest among the next step
    and the already-satisfied steps — ``arg_min`` over the relevant
    subset): the chain advances iff that event is the next step within
    window, else dies; per-anchor levels max up to the user level —
    provably equal to the fold (the fold's live chain is the latest
    anchor's run, and both kill/advance on exactly the relevant-set
    argmin)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    idx = None
    for i, s in enumerate(FUNNEL_STEPS):
        branch = F.when(F.col("event_type") == s, F.lit(i))
        idx = branch if idx is None else idx.when(F.col("event_type") == s, F.lit(i))
    typed = ev.filter(F.col("event_type").isin(*FUNNEL_STEPS)).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        idx.cast("long").alias("idx"),
    )
    arr = F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "idx")))
    neg = F.lit(-1).cast("long")
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    init = F.struct(zero.alias("best"), zero.alias("cur"), neg.alias("anchor"))
    w_us = F.lit(FUNNEL_WINDOW_US).cast("long")

    def upd(best, cur, anchor):
        return F.struct(best.alias("best"), cur.alias("cur"), anchor.alias("anchor"))

    def step(acc, e):
        nxt = acc["cur"] + one
        live = acc["cur"] >= 1
        return (
            F.when(
                e["idx"] == 0,  # signup: kill + re-anchor
                upd(F.greatest(acc["best"], one), one, e["ts_us"]),
            )
            .when(  # next expected step, within the anchor window: advance
                live & (e["idx"] == acc["cur"]) & (e["ts_us"] <= acc["anchor"] + w_us),
                upd(F.greatest(acc["best"], nxt), nxt, acc["anchor"]),
            )
            .when(  # next expected step but window missed: chain dead
                live & (e["idx"] == acc["cur"]),
                upd(acc["best"], zero, neg),
            )
            .when(  # repeat of an already-satisfied step: dedup interrupt
                live & (e["idx"] >= 1) & (e["idx"] < acc["cur"]),
                upd(acc["best"], zero, neg),
            )
            .otherwise(acc)  # later not-yet-reached step: ignored
        )

    folded = typed.groupBy("user_id").agg(
        F.aggregate(arr, init, step)["best"].alias("lvl")
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(folded, "user_id", "left")
        .select(
            "user_id", F.coalesce(F.col("lvl"), F.lit(0)).cast("long").alias("lvl")
        )
        .groupBy(F.col("lvl").alias("steps_completed"))
        .agg(F.count("*").cast("long").alias("n_users"))
    )


#: Gap grid for the time-constrained sequence-match battery: 5 minutes,
#: 1 hour, 6 hours, 1 day — the activation-latency thresholds a product
#: funnel is tuned against.
SEQ_GAP_GRID = (300, 3600, 21600, 86400)


def sequence_match_gap_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceMatch('(?1)(?t<=G)(?2)')`` over a gap grid — ClickHouse's
    TIME-CONSTRAINED sequence match (the funnel family's missing
    condition type: not just "signup then view" but "view within G of a
    signup"), evaluated per user for G in SEQ_GAP_GRID and reported as
    match counts + corpus fraction per threshold.

    Key identity: the exists-check "ANY view within G after ANY signup"
    equals "the FIRST view after some signup is within G" (the first
    following view minimizes the gap), so one reversed running-min
    window — next_view_ts per signup row — answers every threshold at
    once; the grid is then a broadcast literal cross join over the
    bounded (signup rows) frame.  All comparisons are integer
    epoch-micros; the fraction rides the floor(x*1e6+0.5)/1e6 chain.

    Scale shape: one user-keyed window over the two-type slice
    (sessionization bound), then |signups| x 4 bounded grid rows — no
    per-threshold rescan.  Counts vary 0..all across the grid at every
    SF (falsifiability pinned in pytest)."""
    ev = load_table(spark, sf_dir, "events")
    sv = ev.filter(F.col("event_type").isin("signup", "view")).select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
        1, Window.unboundedFollowing
    )
    nv = F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(w)
    gaps = (
        sv.withColumn("nv", nv)
        .filter((F.col("event_type") == "signup") & F.col("nv").isNotNull())
        .select("user_id", (F.col("nv") - F.col("t")).alias("gap_us"))
    )
    grid = spark.createDataFrame(
        [(int(g),) for g in SEQ_GAP_GRID], "gap_s long"
    )
    matched = (
        gaps.crossJoin(F.broadcast(grid))
        .filter(F.col("gap_us") <= F.col("gap_s") * F.lit(1000000).cast("long"))
        .groupBy("gap_s")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
    total = ev.agg(F.countDistinct("user_id").cast("long").alias("n_total"))
    frac = F.floor(
        F.col("n_users").cast("double") / F.col("n_total").cast("double")
        * F.lit(1000000.0)
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    return (
        grid.join(matched, "gap_s", "left")
        .crossJoin(F.broadcast(total))
        .withColumn("n_users", F.coalesce(F.col("n_users"), F.lit(0)).cast("long"))
        .select("gap_s", "n_users", frac.alias("user_frac"))
    )


# Sweep-line activity horizon: an order is "active" for this many days.
ACTIVE_DAYS = 30


def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``maxIntersections`` analog (ClickHouse's interval-overlap
    aggregate): per region, the peak number of simultaneously-active
    orders (active = [orderdate, orderdate + ACTIVE_DAYS)) and the first
    date that peak is reached.

    Shape: classic distributed sweep-line — each interval becomes two
    DATE-grain delta rows (+1 start, -1 end), aggregated by (region, day)
    BEFORE the window, so the per-region running sum walks at most
    calendar-many rows no matter how many orders the corpus holds.  One
    equi-join to resolve region (nation/region dims broadcast; the
    customer side shuffles on its own key and scales out), one
    (region, day) aggregate, one bounded window.  At 100 TB the window
    input is |regions| x |days| — thousands of rows."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "c_custkey", "r_name"
    )
    o = orders.join(dim, orders.o_custkey == dim.c_custkey).select(
        "r_name", F.to_date("o_orderdate").alias("start_d")
    )
    deltas = (
        o.select("r_name", F.col("start_d").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            o.select(
                "r_name",
                F.date_add("start_d", ACTIVE_DAYS).alias("d"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("r_name", "d")
        .agg(F.sum("delta").alias("delta"))
    )
    w_cum = Window.partitionBy("r_name").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = deltas.withColumn("concurrent", F.sum("delta").over(w_cum))
    w_region = Window.partitionBy("r_name")
    peak = cum.withColumn("mx", F.max("concurrent").over(w_region)).filter(
        F.col("concurrent") == F.col("mx")
    )
    return peak.groupBy("r_name").agg(
        F.max("concurrent").cast("long").alias("peak_concurrent"),
        F.min("d").alias("peak_date"),
    )


# Price-band width for the two-level weighted-quantile prefix sum: band
# count scales with the VALUE DOMAIN (~price range / band), never with
# row count, so the band-level window stays tiny at any corpus size.
PCTL_PRICE_BAND = 1000.0


def weighted_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted price quantiles per return flag
    (``quantileExactWeighted`` analog): the q-quantile is the smallest
    price whose cumulative quantity weight reaches q of the group total.

    Scale shape — a TWO-LEVEL distributed prefix sum, not one window per
    flag (3 flags = 3 tasks would serialize the whole corpus at 100 TB):
    (1) per-(flag, price-band) weight totals (map-side-combined
    aggregate), (2) band-offset prefix sum over the tiny band frame,
    (3) broadcast offsets back and cumsum WITHIN each band — parallelism
    is #bands x #flags and per-task work is one band's rows.  The split
    is exact because DECIMAL addition is associative (integer
    arithmetic), so off + within-band fold == the global fold
    bit-for-bit; the oracle keeps the single-window formulation.
    Threshold tests are cross-multiplied (``4*cw >= q*4*total``) so no
    fractional literal ever meets a decimal."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    ).withColumn(
        "band", F.floor(F.col("l_extendedprice") / F.lit(PCTL_PRICE_BAND))
    )
    qty_dec = F.col("l_quantity").cast("decimal(25,6)")
    bands = li.groupBy("l_returnflag", "band").agg(F.sum(qty_dec).alias("bw"))
    w_off = Window.partitionBy("l_returnflag").orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = bands.select(
        "l_returnflag",
        "band",
        F.coalesce(F.sum("bw").over(w_off), F.lit(0).cast("decimal(35,6)")).alias(
            "off"
        ),
    )
    totals = bands.groupBy("l_returnflag").agg(F.sum("bw").alias("tot"))
    w_in = Window.partitionBy("l_returnflag", "band").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        li.join(F.broadcast(offs), ["l_returnflag", "band"])
        .join(F.broadcast(totals), "l_returnflag")
        .withColumn("cw", F.col("off") + F.sum(qty_dec).over(w_in))
    )
    price = F.col("l_extendedprice")
    return cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cw") * 4 >= F.col("tot"), price)).alias("wp25"),
        F.min(F.when(F.col("cw") * 2 >= F.col("tot"), price)).alias("wp50"),
        F.min(F.when(F.col("cw") * 4 >= F.col("tot") * 3, price)).alias("wp75"),
        F.sum(qty_dec).cast("double").alias("total_weight"),
    )


# Forward as-of tolerance (time-to-recovery window).
RECOVERY_WINDOW = "INTERVAL 24 HOURS"


def error_recovery_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (pandas ``merge_asof
    (direction='forward', tolerance=...)`` / QuestDB ASOF's mirror; the
    backward sibling is ``last_purchase_asof``): for every error event,
    the user's next purchase strictly after it in (ts, event_id) order,
    and whether it lands within RECOVERY_WINDOW — the
    "time-to-recovery" metric.

    Single-sort formulation: both sides ride ONE user-keyed window over
    the unioned stream (min of the purchase-only ts over the strictly-
    following frame) — no range join, no per-error re-scan; at 100 TB
    this is the sessionization exchange with O(events-per-user) state."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        1, Window.unboundedFollowing
    )
    next_p = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    s = ev.withColumn("next_p", next_p).filter(F.col("event_type") == "error")
    recovered = F.col("next_p").isNotNull() & (
        F.col("next_p") <= F.col("ts") + F.expr(RECOVERY_WINDOW)
    )
    return s.select(
        "event_id",
        "user_id",
        F.col("ts").alias("err_ts"),
        recovered.alias("recovered"),
        F.when(
            recovered,
            (F.unix_micros("next_p") - F.unix_micros("ts")) / F.lit(1_000_000.0),
        ).alias("latency_sec"),
    )


def delta_sum_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` / ``runningDifference`` analog — the
    gauge-to-counter fold monitoring pipelines run over scraped counter
    samples: per user, in (ts, event_id) order, sum ONLY the positive
    deltas (a negative delta is a counter reset and contributes 0),
    count the resets, and report first-to-last net change.

    Exactness: deltas are computed in the DECIMAL(25,6) domain (cast
    BEFORE subtracting, so the difference is exact decimal arithmetic,
    never a float subtraction whose half-even re-rounding could differ
    across engines), and the positive-delta sum rides the usual
    order-independent decimal fold.  First/last values are selected by
    min/max over a (ts, event_id, v) struct — a unique ordering, so no
    peer ambiguity.

    Scale shape: the lag window and the aggregate share the same
    ``user_id`` hash partitioning, so the whole operator is ONE
    shuffle; per-user state is a single previous row.  No global sort,
    no driver state."""
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(25,6)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    zero = F.lit(0).cast("decimal(25,6)")
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        vdec.alias("v"),
        (vdec - F.lag(vdec).over(w)).alias("delta"),
    )
    return d.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(zero))
        .cast("double")
        .alias("delta_sum"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
        (
            F.max(F.struct("ts", "event_id", "v")).getField("v")
            - F.min(F.struct("ts", "event_id", "v")).getField("v")
        )
        .cast("double")
        .alias("net_change"),
    )


def interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``intervalLengthSum`` analog (ClickHouse's interval-union
    aggregate): per customer, the union length of the activity windows
    [orderdate, orderdate + ACTIVE_DAYS) — total covered days with
    overlaps counted ONCE — plus the number of disjoint busy periods
    ("islands") and the longest one.  The metric behind
    subscription-coverage / uptime reports.

    Shape: the same delta sweep-line as ``max_concurrent_intervals``,
    but keyed per customer: ±1 change-points aggregated to DATE grain,
    one running sum marks covered spans (concurrent > 0), island starts
    are 0→>0 transitions, and a cumulative island id turns the
    covered-span lengths into per-island sums.  All four windows share
    ONE (o_custkey, d) sort; per-customer state is bounded by that
    customer's distinct change-points, never the corpus.  Everything is
    integer day arithmetic — value-exact by construction."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("start_d")
    )
    deltas = (
        orders.select("o_custkey", F.col("start_d").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            orders.select(
                "o_custkey",
                F.date_add("start_d", ACTIVE_DAYS).alias("d"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("o_custkey", "d")
        .agg(F.sum("delta").alias("delta"))
    )
    w_cum = Window.partitionBy("o_custkey").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("d")
    marked = (
        deltas.withColumn("concurrent", F.sum("delta").over(w_cum))
        .withColumn("next_d", F.lead("d").over(w_seq))
        .withColumn("prev_c", F.lag("concurrent").over(w_seq))
        .withColumn(
            "is_start",
            (
                (F.col("concurrent") > 0)
                & (F.coalesce(F.col("prev_c"), F.lit(0)) == 0)
            ).cast("int"),
        )
        .withColumn("island", F.sum("is_start").over(w_cum))
    )
    per_island = (
        marked.filter(F.col("concurrent") > 0)
        .withColumn("len", F.datediff("next_d", "d"))
        .groupBy("o_custkey", "island")
        .agg(F.sum("len").alias("ilen"))
    )
    return per_island.groupBy("o_custkey").agg(
        F.sum("ilen").cast("long").alias("covered_days"),
        F.count("*").cast("long").alias("n_islands"),
        F.max("ilen").cast("long").alias("longest_island_days"),
    )


def summap_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sumMap`` / ``countMap`` combinator analog (ClickHouse's Map
    aggregations): per day, the event-type keyed map of counts and
    decimal-exact value sums, emitted in ClickHouse's canonical shape —
    sorted key array + positionally-aligned value arrays.

    Shape: two-level aggregate — (day, key) partial+final first (full
    map-side combine; the wide map never exists pre-aggregation), then a
    per-day ``collect_list`` over at most |key-domain| rows sorted by
    key.  Map cardinality is the EVENT-TYPE domain (single digits), so
    the collected arrays are bounded by the domain, never the corpus;
    at 100 TB both aggregates stay ordinary partial-agg shuffles.
    Struct sort order is lexicographic on the leading unique key, so
    the arrays are deterministic in both engines.

    The registry-facing map columns are CSV strings (the
    ``build_inverted_index`` posting-CSV convention): the driver's hash
    compare canonicalizes scalar cells only, and decimal->string
    formatting is deterministic in both engines where double->string is
    not.  The array-typed internals stay pytest-pinned in
    ``test_r8_ops``."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").cast("long").alias("n"), dsum("value").alias("s")
    )
    kv = F.sort_array(F.collect_list(F.struct("event_type", "n", "s")))
    return per.groupBy("day").agg(
        F.array_join(
            F.transform(kv, lambda x: x["event_type"]), ","
        ).alias("keys_csv"),
        F.array_join(
            F.transform(kv, lambda x: x["n"].cast("string")), ","
        ).alias("counts_csv"),
        F.array_join(
            F.transform(kv, lambda x: x["s"].cast("string")), ","
        ).alias("sums_csv"),
    )


def argminmax_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``argMax`` / ``argMin`` / ``anyLast`` combinator parity
    (ClickHouse's value-at-extremum aggregates): per event type, the
    user holding the max (and min) value and the latest-seen value.

    The portable formulation is a struct extremum: ``max(struct(value,
    ts, event_id, payload))`` — the tuple ordering is made TOTAL with
    the (ts, event_id) tiebreak, so "which row wins a value tie" is
    deterministic in both engines (ClickHouse's own argMax is
    any-of-ties; this is the reproducible refinement).  Struct min/max
    is merge-associative, so it partial-aggregates map-side and merges
    in any order — the same property that makes ClickHouse's
    SimpleAggregateFunction states mergeable.  One shuffle on the group
    key; no window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    by_value = F.struct("value", "ts", "event_id", "user_id")
    by_time = F.struct("ts", "event_id", "user_id", "value")
    return ev.groupBy("event_type").agg(
        F.max(by_value).getField("user_id").alias("top_user"),
        F.max("value").alias("top_value"),
        F.min(by_value).getField("user_id").alias("bottom_user"),
        F.min(by_time).getField("user_id").alias("first_user"),
        F.max(by_time).getField("value").alias("last_value"),
        F.count("*").cast("long").alias("n_events"),
    )


MAD_K = 3  # robust z threshold: |x - median| > K * MAD


def robust_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier flag over the daily value rollup — the
    heavy-tail-safe alternative to ``revenue_anomaly_days``'s trailing
    z-score (a single spiked day inflates a stddev baseline but moves
    the median/MAD not at all).

    Exactness: the daily totals ride the decimal fold; median and MAD
    are exact interpolated percentiles (the ``value_percentiles``
    cross-engine contract), and the flag comparison is the same IEEE
    multiply/compare stream in both engines.

    Scale shape: detection runs on the ROLLUP, not the raw stream —
    O(days) rows after one partial-agg shuffle; the two global
    percentiles each reduce to one broadcast scalar row (the
    ``winsorized_value_stats`` discipline), so nothing global ever
    sorts more than the day frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        dsum("value").alias("daily_value")
    )
    med = daily.agg(F.expr("percentile(daily_value, 0.5)").alias("med"))
    dev = daily.join(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("daily_value") - F.col("med"))
    )
    mad = dev.agg(F.expr("percentile(abs_dev, 0.5)").alias("mad"))
    return dev.join(F.broadcast(mad)).select(
        "day",
        "daily_value",
        "abs_dev",
        "mad",
        (F.col("abs_dev") > F.lit(float(MAD_K)) * F.col("mad")).alias("is_outlier"),
    )


def funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-to-step conversion latency for the min-chain funnel: among
    users who completed step k+1, the p50/p90/max seconds between their
    step-k and step-(k+1) completion times — the "where does the funnel
    stall" report that accompanies every conversion dashboard.

    Latencies are integer-microsecond differences divided once by 1e6
    (a single IEEE division — exact parity), and the percentiles are
    exact interpolated (the ``value_percentiles`` contract).  Shape:
    reuses ``_funnel_chain``'s user-keyed step frames; each pair join is
    user-keyed on frames already far smaller than the corpus, and the
    final aggregate has 3 groups."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    frames = _funnel_chain(ev)
    pairs = None
    for i in range(len(frames) - 1):
        lat = (
            F.unix_micros(F.col(f"t{i + 2}")) - F.unix_micros(F.col(f"t{i + 1}"))
        ) / F.lit(1_000_000.0)
        j = frames[i].join(frames[i + 1], "user_id").select(
            F.lit(i + 1).cast("long").alias("step_from"),
            F.lit(i + 2).cast("long").alias("step_to"),
            lat.alias("latency_sec"),
        )
        pairs = j if pairs is None else pairs.unionByName(j)
    return pairs.groupBy("step_from", "step_to").agg(
        F.count("*").cast("long").alias("n_converted"),
        F.expr("percentile(latency_sec, 0.5)").alias("p50_sec"),
        F.expr("percentile(latency_sec, 0.9)").alias("p90_sec"),
        F.max("latency_sec").alias("max_sec"),
    )


def welch_ttest_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``welchTTest`` analog (ClickHouse's statistical-test family): for
    every event type, Welch's unequal-variance t statistic and
    Welch–Satterthwaite degrees of freedom for "this type's values vs
    all other values" — the one-vs-rest A/B report.

    Exactness: both samples' count/sum/sum-of-squares come from ONE
    decimal power-sum aggregate (the ``value_dispersion`` discipline);
    the rest-side sums are decimal SUBTRACTIONS from the broadcast
    global totals (exact — never a second scan), and only then does the
    arithmetic drop to double, where both engines run the identical
    IEEE op sequence (+,-,*,/ and correctly-rounded sqrt; no exp/log).
    Round-6 on the outputs mirrors ``value_dispersion``.

    Scale shape: one partial-agg shuffle over the corpus; the global
    totals are a one-row broadcast; everything after is per-group
    scalar arithmetic on |event-type domain| rows."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)")).alias("s2"),
    )
    tot = per.agg(
        F.sum("n").alias("tot_n"),
        F.sum("s1").alias("tot_s1"),
        F.sum("s2").alias("tot_s2"),
    )
    j = per.join(F.broadcast(tot))
    n1 = F.col("n").cast("double")
    n2 = (F.col("tot_n") - F.col("n")).cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    r1d = (F.col("tot_s1") - F.col("s1")).cast("double")
    r2d = (F.col("tot_s2") - F.col("s2")).cast("double")
    m1, m2 = s1d / n1, r1d / n2
    v1 = (s2d - s1d * s1d / n1) / (n1 - 1)
    v2 = (r2d - r1d * r1d / n2) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    se = se1 + se2
    t = (m1 - m2) / F.sqrt(se)
    dof = se * se / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_sample"),
        (F.col("tot_n") - F.col("n")).cast("long").alias("n_rest"),
        F.round(m1, 6).alias("mean_sample"),
        F.round(m2, 6).alias("mean_rest"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_df"),
    )


def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mannWhitneyUTest`` analog, one-vs-rest per event type: the
    rank-sum U statistic with midrank tie handling and the tie-corrected
    normal z — the non-parametric sibling of ``welch_ttest_values``.

    Rank trick that makes it scale-shaped AND exact: ranks are never
    assigned per row.  The value DOMAIN is money-grained (~thousands of
    distinct doubles), so midranks come from a value-frequency table —
    2*midrank = 2*(#smaller) + cnt + 1, an INTEGER — and the per-type
    rank sum is an integer aggregate over a broadcast join of that tiny
    table.  Everything stays in integer/bigint arithmetic until the
    final few IEEE ops (mirrored exactly in the oracle); the one
    unpartitioned window walks the distinct-value frame, never the
    corpus (the sweep-line discipline).  Note cnt^3 in the tie term:
    bigint-safe while no single value exceeds ~2M rows — at 100 TB the
    tie term would ride the same decimal fold as everything else."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    freq = ev.groupBy("value").agg(F.count("*").alias("cnt"))
    wv = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = freq.withColumn(
        "cum_less", F.coalesce(F.sum("cnt").over(wv), F.lit(0))
    ).withColumn("rank2", (2 * F.col("cum_less") + F.col("cnt") + 1).cast("long"))
    per = (
        ev.join(F.broadcast(ranked.select("value", "rank2")), "value")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("rank2").alias("sum_rank2"))
    )
    gl = ranked.agg(
        F.sum("cnt").alias("tot_n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "tie_t"
        ),
    )
    j = per.join(F.broadcast(gl))
    u = (F.col("sum_rank2") - F.col("n") * (F.col("n") + 1)).cast("double") / F.lit(
        2.0
    )
    n1d = F.col("n").cast("double")
    n2d = (F.col("tot_n") - F.col("n")).cast("double")
    nd = F.col("tot_n").cast("double")
    mu = n1d * n2d / F.lit(2.0)
    var = (
        n1d
        * n2d
        / F.lit(12.0)
        * ((nd + F.lit(1.0)) - F.col("tie_t").cast("double") / (nd * (nd - F.lit(1.0))))
    )
    z = (u - mu) / F.sqrt(var)
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_sample"),
        (F.col("tot_n") - F.col("n")).cast("long").alias("n_rest"),
        u.alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )


def ks_test_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``kolmogorovSmirnovTest`` analog, one-vs-rest per event type: the
    two-sample KS D statistic (sup ECDF gap) plus the scaled statistic
    sqrt(n1*n2/(n1+n2))*D, completing the statistical-test family next
    to ``welch_ttest_values`` / ``mann_whitney_u``.

    Integer-exact trick: the sup is attained at an ECDF jump, so D is
    evaluated only on the distinct-value grid (money-grained domain,
    never the corpus).  The gap is maximized as the INTEGER
    |cum1*n2 - cum2*n1| — bigint-exact argmax, then exactly ONE
    division by n1*n2 and one sqrt (both mirrored in the oracle, the
    composed-IEEE discipline).  The value attaining the sup is reported
    (min value on ties) for falsifiability.

    Scale shape: one (value, type) partial agg; the grid is
    |value domain| x |type domain| rows; per-type cumsums window the
    grid, not the corpus (the midrank-table discipline).  The bigint
    cross-products hold to ~3e9 rows per side; past that the same grid
    rides a decimal fold."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        # the explicit not-null filter matches the join-side inferred
        # IsNotNull, so every branch's vt exchange canonicalizes EQUAL
        # and exchange reuse kicks in (null values are outside a KS
        # ECDF's domain anyway)
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
    )
    # every downstream frame derives from this ONE partial agg, so the
    # corpus exchange is identical across branches and Spark reuses it
    # (ReusedExchange): one physical scan, plan-pinned.
    vt = ev.groupBy("value", "event_type").agg(F.count("*").alias("cnt"))
    vals = vt.groupBy("value").agg(F.sum("cnt").alias("cnt_all"))
    wv = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    vals = vals.withColumn("cum_all", F.sum("cnt_all").over(wv).cast("long"))
    types = vt.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n1"))
    # shuffle-hash (not broadcast) for the grid<-vt join: broadcasting vt
    # would re-derive it on a SECOND corpus scan; the shuffle side shares
    # vt's exchange with the vals/types branches instead (both sides are
    # domain-bounded, so the extra shuffle moves ~|domain| rows).
    grid = (
        vals.select("value", "cum_all")
        .crossJoin(F.broadcast(types))
        .join(vt.hint("shuffle_hash"), ["value", "event_type"], "left")
        .fillna(0, subset=["cnt"])
    )
    wt = Window.partitionBy("event_type").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = vals.agg(F.sum("cnt_all").alias("tot_n"))
    g = (
        grid.withColumn("cum1", F.sum("cnt").over(wt).cast("long"))
        .join(F.broadcast(tot))
        .withColumn("n2", (F.col("tot_n") - F.col("n1")).cast("long"))
        .withColumn(
            "gap",
            F.abs(
                F.col("cum1") * F.col("n2")
                - (F.col("cum_all") - F.col("cum1")) * F.col("n1")
            ).cast("long"),
        )
    )
    wmax = Window.partitionBy("event_type")
    g = g.withColumn("max_gap", F.max("gap").over(wmax))
    out = g.groupBy("event_type").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max("max_gap").alias("d_num"),
        F.min(F.when(F.col("gap") == F.col("max_gap"), F.col("value"))).alias(
            "d_at_value"
        ),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d = F.col("d_num").cast("double") / (n1d * n2d)
    return out.select(
        "event_type",
        F.col("n1").cast("long").alias("n_sample"),
        F.col("n2").cast("long").alias("n_rest"),
        F.round(d, 6).alias("d_stat"),
        F.round(F.sqrt(n1d * n2d / (n1d + n2d)) * d, 6).alias("ks_stat"),
        "d_at_value",
    )


def simple_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``simpleLinearRegression`` analog: per event type, the least-squares
    (slope, intercept, r^2) of daily revenue against the day index — the
    trend line of the daily MV, computed where ClickHouse computes it
    (on aggregate state, one pass).

    Exactness: the daily y stays in the DECIMAL domain end-to-end
    (``dsum`` discipline); the five regression power sums (n, sx, sxx,
    sy, sxy, syy) are bigint/decimal-exact — x*y as DECIMAL(12,0) x
    DECIMAL(25,6) and y*y as DECIMAL(19,2)^2 (y has 2dp; precision 19
    forces DuckDB's 128-bit class) keep both engines inside 38-digit
    exact products — and only the final slope/intercept/r^2
    composition drops to double, op order mirrored textually.

    Scale shape: the regression runs on the DAILY grain (domain-bounded
    points per type), itself one partial-agg shuffle of the corpus; the
    power sums partial-aggregate map-side like any MergeTree state."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("rev"))
        .withColumn("x", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long"))
    )
    per = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("rev").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(12,0)") * F.col("rev").cast("decimal(25,6)")
        ).alias("sxy"),
        F.sum(
            F.col("rev").cast("decimal(19,2)") * F.col("rev").cast("decimal(19,2)")
        ).alias("syy"),
    )
    nd = F.col("n_days").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    syyd = F.col("syy").cast("double")
    num = nd * sxyd - sxd * syd
    denx = nd * sxxd - sxd * sxd
    deny = nd * syyd - syd * syd
    slope = num / denx
    return per.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((syd - slope * sxd) / nd, 6).alias("intercept"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    )


def skew_kurt_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``skewPop`` / ``kurtPop`` analog per event type: population
    skewness m3/m2^1.5 and kurtosis m4/m2^2 from third/fourth power
    sums — the higher-moment extension of ``value_dispersion``.

    Exactness: per-row powers are one/two IEEE multiplies (deterministic
    per row, the welch s2 precedent), summed EXACTLY as decimals —
    v^3 as DECIMAL(35,8), v^4 = (v*v)*(v*v) as DECIMAL(38,8) — so the
    sums are independent of partial-merge order at any parallelism;
    the moment composition then runs the identical IEEE op sequence in
    both engines (+,-,*,/ and sqrt; no pow).  DECIMAL(38,8) holds
    sum(v^4) to ~1e29 — fine past 1e12 rows at this value domain.

    Scale shape: ONE partial-agg shuffle, five accumulators — the
    SimpleAggregateFunction shape; map-side combine does the heavy
    lifting exactly like ClickHouse's AggregateFunction states."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v.cast("decimal(25,6)")).alias("s1"),
        F.sum((v * v).cast("decimal(30,8)")).alias("s2"),
        F.sum(((v * v) * v).cast("decimal(35,8)")).alias("s3"),
        F.sum(((v * v) * (v * v)).cast("decimal(38,8)")).alias("s4"),
    )
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    s3d = F.col("s3").cast("double")
    s4d = F.col("s4").cast("double")
    m1 = s1d / nd
    m2 = s2d / nd - m1 * m1
    m3 = s3d / nd - F.lit(3.0) * m1 * (s2d / nd) + F.lit(2.0) * (m1 * m1) * m1
    m4 = (
        s4d / nd
        - F.lit(4.0) * m1 * (s3d / nd)
        + F.lit(6.0) * (m1 * m1) * (s2d / nd)
        - F.lit(3.0) * ((m1 * m1) * (m1 * m1))
    )
    return per.select(
        "event_type",
        F.col("n").cast("long").alias("n_sample"),
        F.round(m1, 6).alias("mean_value"),
        F.round(m2, 6).alias("variance_pop"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skew_pop"),
        F.round(m4 / (m2 * m2), 6).alias("kurt_pop"),
    )


def _chi2_contingency_agg(ev: DataFrame) -> DataFrame:
    """Shared (event_type x region) contingency chi-square: the bigint
    cell/marginal counts, per-cell terms exact-as-doubles under 2^53,
    and the ordered LEFT-TO-RIGHT fold over the domain-bounded cell
    array (Spark ``aggregate`` over a sorted collect == DuckDB
    ``list_reduce`` over ``list(... ORDER BY ...)``) — used by
    ``cramers_v_assoc`` and ``contingency_coefficients`` so both
    coefficient families price the identical chi2.  One partial-agg
    shuffle to the |type| x |region| grid; the fold runs on 35 rows."""
    cells = ev.groupBy(
        "event_type",
        F.concat(F.lit("region_"), (F.col("user_id") % 7).cast("string")).alias(
            "region"
        ),
    ).agg(F.count("*").alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("region")
    wn = Window.partitionBy()
    c2 = (
        cells.withColumn("r", F.sum("o").over(wr).cast("long"))
        .withColumn("c", F.sum("o").over(wc).cast("long"))
        .withColumn("n", F.sum("o").over(wn).cast("long"))
    )
    numd = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    dend = (F.col("r") * F.col("c") * F.col("n")).cast("double")
    c2 = c2.withColumn("term", (numd * numd) / dend)
    return c2.groupBy().agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "region", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("chi2"),
        F.countDistinct("event_type").alias("r_levels"),
        F.countDistinct("region").alias("c_levels"),
        F.max("n").alias("n_total"),
    )


def cramers_v_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cramersV`` / ``cramersVBiasCorrected`` analog: the chi-square
    association between event type and user region over the events
    contingency table — ClickHouse's categorical-dependence aggregates
    as a one-row report.

    Exactness: every contingency count is bigint; the per-cell term
    (o*n - r*c)^2 / (r*c*n) uses bigint cross-products that stay under
    2^53 (exact as doubles) and the 35-term sum folds LEFT-TO-RIGHT in
    (event_type, region) order — Spark ``aggregate`` over a sorted
    collect vs DuckDB ``list_reduce`` over ``list(... ORDER BY ...)``,
    the same fold, so chi2 is bit-identical (a new use of the ordered-
    fold discipline on a DOMAIN-BOUNDED array, the summap shape).  The
    bias-corrected variant mirrors greatest/least textually.

    Scale shape: one partial-agg shuffle to the |type|x|region| cell
    grid; window totals and the fold run on 35 rows."""
    agg = _chi2_contingency_agg(load_table(spark, sf_dir, "events"))
    nd = F.col("n_total").cast("double")
    rd = F.col("r_levels").cast("double")
    cd = F.col("c_levels").cast("double")
    phi2 = F.col("chi2") / nd
    kmin = F.least(rd - F.lit(1.0), cd - F.lit(1.0))
    phi2c = F.greatest(
        F.lit(0.0), phi2 - ((rd - F.lit(1.0)) * (cd - F.lit(1.0))) / (nd - F.lit(1.0))
    )
    rk = rd - ((rd - F.lit(1.0)) * (rd - F.lit(1.0))) / (nd - F.lit(1.0))
    ck = cd - ((cd - F.lit(1.0)) * (cd - F.lit(1.0))) / (nd - F.lit(1.0))
    return agg.select(
        F.col("n_total").cast("long").alias("n_total"),
        F.col("r_levels").cast("long").alias("r_levels"),
        F.col("c_levels").cast("long").alias("c_levels"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(F.sqrt(phi2 / kmin), 6).alias("cramers_v"),
        F.round(
            F.sqrt(phi2c / F.least(rk - F.lit(1.0), ck - F.lit(1.0))), 6
        ).alias("cramers_v_bc"),
    )


RETENTION_EPOCH = "2024-01-01"  # fixture stream start (same class as FUNNEL_*)
NEXT_NODE_WINDOW_US = 3_600_000_000  # 1 h; windowing is what makes '(end)' fire


def retention_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``retention()`` aggregate analog: per user, condition 1 is the
    base (purchased in week 0) and r_i = cond1 AND cond_i — exactly
    ClickHouse's semantics, with a value-threshold gradient (week-2
    purchase > 60, week-3 purchase > 150, both sides of the fixture's
    skewed-low money distribution) so every flag varies at all 3 SFs.

    Exactness: flags are max-of-indicator bigints, counts are bigint
    sums; the ratios are single IEEE divisions.  Scale shape: one
    per-user partial agg (4 indicator accumulators), then a one-row
    global sum — the SimpleAggregateFunction shape."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.datediff(F.col("ts").cast("date"), F.lit(RETENTION_EPOCH))
    is_p = F.col("event_type") == "purchase"

    def _flag(cond):
        return F.max(F.when(cond, 1).otherwise(0))

    per = ev.groupBy("user_id").agg(
        _flag(is_p & wk.between(0, 6)).alias("c1"),
        _flag(is_p & wk.between(7, 13)).alias("c2"),
        _flag(is_p & (F.col("value") > 60) & wk.between(14, 20)).alias("c3"),
        _flag(is_p & (F.col("value") > 150) & wk.between(21, 27)).alias("c4"),
    )
    out = per.agg(
        F.count("*").alias("n_users"),
        F.sum("c1").alias("r1"),
        F.sum(F.col("c1") * F.col("c2")).alias("r2"),
        F.sum(F.col("c1") * F.col("c3")).alias("r3"),
        F.sum(F.col("c1") * F.col("c4")).alias("r4"),
    )
    r1d = F.col("r1").cast("double")
    return out.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("r1").cast("long").alias("r1"),
        F.col("r2").cast("long").alias("r2"),
        F.col("r3").cast("long").alias("r3"),
        F.col("r4").cast("long").alias("r4"),
        F.round(F.col("r2").cast("double") / r1d, 6).alias("ret2"),
        F.round(F.col("r3").cast("double") / r1d, 6).alias("ret3"),
        F.round(F.col("r4").cast("double") / r1d, 6).alias("ret4"),
    )


def sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequenceNextNode`` analog: after each user's first
    signup -> purchase min-chain, what happens NEXT within one hour —
    the distribution of the immediately-following event type, '(end)'
    when the hour closes silently (the window is what makes that branch
    fire on a dense fixture, the funnel-window discipline).

    Exactness: 'first' / 'next' are row_number()=1 picks on the total
    order (epoch micros, event_id) — integer comparisons end to end,
    unique event_id breaks every tie; the share is one IEEE division.
    Scale shape: three user-keyed shuffles over progressively thinner
    slices (type-filtered, then chain-joined) — the `_funnel_chain`
    shape; per-user state is one row per stage, never a collect."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("tus"), "event_id", "event_type"
    )
    wu = Window.partitionBy("user_id").orderBy("tus", "event_id")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("tus").alias("s_t"), F.col("event_id").alias("s_id"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(
            (F.col("tus") > F.col("s_t"))
            | ((F.col("tus") == F.col("s_t")) & (F.col("event_id") > F.col("s_id")))
        )
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("tus").alias("p_t"), F.col("event_id").alias("p_id"))
    )
    # ONE left join carries both branches: matches get the next event,
    # chain users with a silent hour keep a null row — so p's lineage is
    # referenced once and '(end)' needs no second pass.  The after-p
    # predicate lives in the join condition itself.
    pp, en = p.alias("pp"), ev.alias("en")
    after = (
        (F.col("en.tus") > F.col("pp.p_t"))
        | (
            (F.col("en.tus") == F.col("pp.p_t"))
            & (F.col("en.event_id") > F.col("pp.p_id"))
        )
    ) & (F.col("en.tus") <= F.col("pp.p_t") + F.lit(NEXT_NODE_WINDOW_US))
    joined = pp.join(en, (F.col("en.user_id") == F.col("pp.user_id")) & after, "left")
    wn = Window.partitionBy(F.col("pp.user_id")).orderBy(
        F.col("en.tus").asc_nulls_last(), F.col("en.event_id").asc_nulls_last()
    )
    labeled = (
        joined.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select(
            F.coalesce(F.col("en.event_type"), F.lit("(end)")).alias(
                "next_event_type"
            )
        )
    )
    counts = labeled.groupBy("next_event_type").agg(F.count("*").alias("n_users"))
    # chain_users = sum over the |type domain|+1 grouped rows: a window on
    # the tiny frame, not a second derivation of p
    wall = Window.partitionBy()
    return counts.select(
        "next_event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(
            F.col("n_users").cast("double")
            / F.sum("n_users").over(wall).cast("double"),
            6,
        ).alias("share"),
    )


def student_ttest_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``studentTTest`` analog, one-vs-rest per event type: the
    pooled-variance Student t with df = n-2 — the equal-variance sibling
    of ``welch_ttest_values``, sharing its exactness contract (ONE
    decimal power-sum aggregate, rest side by exact decimal subtraction
    from the broadcast global totals, then a mirrored IEEE op sequence).
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)")).alias("s2"),
    )
    tot = per.agg(
        F.sum("n").alias("tot_n"),
        F.sum("s1").alias("tot_s1"),
        F.sum("s2").alias("tot_s2"),
    )
    j = per.join(F.broadcast(tot))
    n1 = F.col("n").cast("double")
    n2 = (F.col("tot_n") - F.col("n")).cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    r1d = (F.col("tot_s1") - F.col("s1")).cast("double")
    r2d = (F.col("tot_s2") - F.col("s2")).cast("double")
    m1, m2 = s1d / n1, r1d / n2
    ss1 = s2d - s1d * s1d / n1
    ss2 = r2d - r1d * r1d / n2
    sp2 = (ss1 + ss2) / (n1 + n2 - F.lit(2.0))
    t = (m1 - m2) / F.sqrt(sp2 * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_sample"),
        (F.col("tot_n") - F.col("n")).cast("long").alias("n_rest"),
        (F.col("tot_n") - F.lit(2)).cast("long").alias("df"),
        F.round(t, 6).alias("t_stat"),
    )


LTTB_N_OUT = 12  # downsampled series length (first + 10 buckets + last)


def lttb_downsample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``largestTriangleThreeBuckets`` analog: the canonical
    visual-fidelity downsampler (Steinarsson 2013, the ClickHouse
    aggregate) over the daily-revenue series — first and last point
    kept, each of the 10 middle buckets contributing the point that
    maximizes the triangle area with the previously-selected point and
    the next bucket's mean.

    Exactness: the SELECTION is discrete, so only the area COMPARISONS
    must agree across engines — every area is the identical IEEE op
    sequence on (day-index, decimal-exact daily revenue) doubles, the
    per-bucket argmax is a left fold with strict > (first point wins
    ties), and bucket boundaries are integer floor-division.  The whole
    LTTB walk is ONE Catalyst expression: a fold over bucket indices
    whose accumulator carries (prev point, selected list) — sequential
    by nature, but over the DOMAIN-BOUNDED series (30 points), never
    the corpus.  The oracle mirrors it as a DuckDB recursive-CTE walk;
    an init-less list_reduce equals Spark's 0.0-seeded fold because
    0.0 + x == x and area >= 0 > the -1.0 argmax seed.

    Scale shape: one partial-agg shuffle to the daily grain; the fold
    runs on a one-row frame.  The m <= N_OUT degenerate branch
    (series already small: emit as-is) cannot fire on the 30-day
    fixture and is deliberately not implemented."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("rev"))
        .select(
            F.datediff(F.col("day"), F.lit("1970-01-01")).cast("double").alias("x"),
            F.col("rev").cast("double").alias("y"),
        )
    )
    ser = daily.agg(
        F.array_sort(F.collect_list(F.struct("x", "y"))).alias("s"),
        F.count("*").cast("int").alias("m"),
    )
    nb = LTTB_N_OUT - 2
    m, s = F.col("m"), F.col("s")
    mm = m - F.lit(2)

    def fold_sum(arr, field):
        return F.aggregate(arr, F.lit(0.0), lambda a, c: a + c[field])

    def fdiv(a, b):  # ints < 2^26: floor(double div) == integer div, exact
        return F.floor(a / b).cast("int")

    acc0 = F.struct(
        s[0]["x"].alias("px"),
        s[0]["y"].alias("py"),
        F.array(F.struct(s[0]["x"].alias("x"), s[0]["y"].alias("y"))).alias("pts"),
    )

    def step(acc, b):
        bi = b.cast("int")
        lo = fdiv(bi * mm, F.lit(nb))
        hi = fdiv((bi + 1) * mm, F.lit(nb))
        cands = F.slice(s, (lo + F.lit(2)).cast("int"), (hi - lo).cast("int"))
        nxt = F.slice(
            s,
            (hi + F.lit(2)).cast("int"),
            (fdiv((bi + 2) * mm, F.lit(nb)) - hi).cast("int"),
        )
        is_last = bi == F.lit(nb - 1)
        anchx = F.when(is_last, s[m - 1]["x"]).otherwise(
            fold_sum(nxt, "x") / F.size(nxt).cast("double")
        )
        anchy = F.when(is_last, s[m - 1]["y"]).otherwise(
            fold_sum(nxt, "y") / F.size(nxt).cast("double")
        )
        px, py = acc["px"], acc["py"]

        def area(c):
            return F.abs((px - anchx) * (c["y"] - py) - (px - c["x"]) * (anchy - py))

        best = F.aggregate(
            cands,
            F.struct(
                F.lit(-1.0).alias("area"), F.lit(0.0).alias("x"), F.lit(0.0).alias("y")
            ),
            lambda a2, c: F.when(
                area(c) > a2["area"],
                F.struct(area(c).alias("area"), c["x"].alias("x"), c["y"].alias("y")),
            ).otherwise(a2),
        )
        return F.struct(
            best["x"].alias("px"),
            best["y"].alias("py"),
            F.concat(
                acc["pts"],
                F.array(F.struct(best["x"].alias("x"), best["y"].alias("y"))),
            ).alias("pts"),
        )

    final = ser.select(
        F.concat(
            F.aggregate(F.sequence(F.lit(0), F.lit(nb - 1)), acc0, step)["pts"],
            F.array(F.struct(s[m - 1]["x"].alias("x"), s[m - 1]["y"].alias("y"))),
        ).alias("pts")
    )
    return final.select(F.posexplode("pts").alias("idx", "p")).select(
        F.col("idx").cast("long").alias("idx"),
        F.col("p.x").cast("long").alias("x_day"),
        F.round(F.col("p.y"), 6).alias("y_revenue"),
    )


WAU_WINDOW_DAYS = 7  # trailing window (inclusive): [day-6, day]


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness: per purchase day, the distinct daily
    purchasers over the trailing-7-day distinct purchasers — the
    engagement ratio on every growth dashboard, and the canonical
    "distinct over a sliding window" problem.

    Scale shape — the part that matters at 100 TB: trailing-window
    COUNT DISTINCT is NOT windowable directly (distinct doesn't
    decompose), and the naive shapes re-scan (a 7-way self-join) or
    explode (28 rows per user-day).  This implementation: dedup to the
    (user, day) grain (one shuffle), merge each user's overlapping
    [day, day+6] coverage intervals into islands (lag-based, the
    interval_union_length discipline — the multi-island branch fires at
    all 3 SFs: gaps > 6 days are real on purchase activity), then ONE
    +1/-1 delta sweep-line cumsum over the bounded date domain.  Each
    user contributes 2 deltas per island, never 7 rows per active day.

    Exactness: all counts are integers off island boundaries; the
    oracle deliberately uses the INDEPENDENT brute construction (a
    correlated 7-day range join with COUNT(DISTINCT)) — two different
    algorithms, one truth; stickiness is a single IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    wu = Window.partitionBy("user_id").orderBy("day")
    run = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev = F.lag("day").over(wu)
    new_isl = F.when(
        prev.isNull() | (F.datediff(F.col("day"), prev) > WAU_WINDOW_DAYS - 1), 1
    ).otherwise(0)
    islands = (
        ud.withColumn("isl", F.sum(new_isl).over(run))
        .groupBy("user_id", "isl")
        .agg(
            F.min("day").alias("s"),
            F.date_add(F.max("day"), WAU_WINDOW_DAYS - 1).alias("e"),
        )
    )
    deltas = (
        islands.select(F.col("s").alias("day"), F.lit(1).alias("d"))
        .unionByName(
            islands.select(F.date_add("e", 1).alias("day"), F.lit(-1).alias("d"))
        )
        .groupBy("day")
        .agg(F.sum("d").alias("d"))
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    merged = deltas.join(dau, "day", "full").fillna(0, subset=["d"])
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        merged.withColumn("wau", F.sum("d").over(wd).cast("long"))
        .filter(F.col("dau").isNotNull())
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )
    return out


def corr_matrix_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corrMatrix`` analog (ClickHouse 24.x): the full Pearson
    correlation matrix of the daily metric triple (purchase count,
    revenue, distinct purchasers) as (metric_i, metric_j, corr) rows —
    every pairwise correlation from ONE pass over the daily MV.

    Exactness: the metrics live on the 30-row daily grain, so ALL power
    and cross sums are exact (counts bigint; revenue decimal; mixed
    cross products DECIMAL(12,0) x DECIMAL(25,6)); the correlation
    composition then runs the mirrored IEEE sequence with two sqrt's.
    The matrix is emitted from one grouped row via an inline
    explode of the 6 upper-triangle cells (i <= j).

    Scale shape: one partial-agg shuffle to the daily grain (count +
    dsum + distinct-user count), one single-row reduce carrying the 9
    sums, then a 6-row explode."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("rev"),
        F.countDistinct("user_id").alias("users"),
    )
    # exact sums: ints as bigint, money in the decimal domain
    # revenue as DECIMAL(19,2): daily sums of 2dp money are exact at 2dp,
    # and precision 19 keeps the squared product inside DuckDB's hugeint
    # class / Spark's capped (38,4) without loss (the linreg discipline)
    mets = {
        "orders": F.col("cnt").cast("decimal(12,0)"),
        "revenue": F.col("rev").cast("decimal(19,2)"),
        "purchasers": F.col("users").cast("decimal(12,0)"),
    }
    aggs = [F.count("*").alias("n")]
    names = list(mets)
    for nm in names:
        aggs.append(F.sum(mets[nm]).alias(f"s_{nm}"))
    for i, a in enumerate(names):
        for b in names[i:]:
            aggs.append(F.sum(mets[a] * mets[b]).alias(f"p_{a}_{b}"))
    sums = daily.agg(*aggs)

    def corr(a: str, b: str):
        key = f"p_{a}_{b}" if f"p_{a}_{b}" in [f.name for f in sums.schema] else f"p_{b}_{a}"
        nd = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        saa = F.col(f"p_{a}_{a}").cast("double")
        sbb = F.col(f"p_{b}_{b}").cast("double")
        sab = F.col(key).cast("double")
        return (nd * sab - sa * sb) / (
            F.sqrt(nd * saa - sa * sa) * F.sqrt(nd * sbb - sb * sb)
        )

    cells = F.array(
        *[
            F.struct(
                F.lit(a).alias("metric_i"),
                F.lit(b).alias("metric_j"),
                F.round(corr(a, b), 6).alias("corr"),
            )
            for i, a in enumerate(names)
            for b in names[i:]
        ]
    )
    return (
        sums.select(F.explode(cells).alias("c"), F.col("n").cast("long").alias("n_days"))
        .select("c.metric_i", "c.metric_j", "c.corr", "n_days")
    )


HOLT_ALPHA = 0.5  # level smoothing
HOLT_BETA = 0.3  # trend smoothing
HOLT_HORIZON = 7  # days forecast ahead


def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend forecast of daily revenue: the classic
    double-exponential-smoothing recurrence (level + trend) fit over the
    daily MV, a 7-day-ahead forecast, and the one-step-ahead SSE as the
    fit diagnostic — the second member of the sequential-walk class
    (the ``lttb_downsample_daily`` discipline).

    Exactness: the recurrence is pure +,-,* on (decimal-exact daily
    revenue) doubles with literal alpha/beta — a Catalyst HOF fold with
    a (level, trend, sse) struct accumulator, mirrored op-for-op by a
    DuckDB recursive-CTE walk (no exp/log: the smoothing "exponential"
    is the recurrence itself).  SSE accumulates in the same sequential
    order on both sides.  Init: l0 = y0, b0 = y1 - y0 (standard).

    Scale shape: one partial-agg shuffle to the daily grain; the walk
    runs on a one-row, domain-bounded series."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("rev"))
        .select("day", F.col("rev").cast("double").alias("y"))
    )
    ser = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("s"),
        F.count("*").cast("int").alias("m"),
        F.max("day").alias("last_day"),
    )
    s, m = F.col("s"), F.col("m")
    a, b1m = F.lit(HOLT_ALPHA), F.lit(1.0 - HOLT_ALPHA)
    bt, b2m = F.lit(HOLT_BETA), F.lit(1.0 - HOLT_BETA)
    acc0 = F.struct(
        s[0]["y"].alias("l"),
        (s[1]["y"] - s[0]["y"]).alias("b"),
        F.lit(0.0).alias("sse"),
    )

    def step(acc, p):
        pred = acc["l"] + acc["b"]
        err = p["y"] - pred
        new_l = a * p["y"] + b1m * pred
        new_b = bt * (new_l - acc["l"]) + b2m * acc["b"]
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            (acc["sse"] + err * err).alias("sse"),
        )

    fit = ser.select(
        F.aggregate(F.slice(s, 2, (m - F.lit(1)).cast("int")), acc0, step).alias(
            "f"
        ),
        "last_day",
        F.col("m").cast("long").alias("n_days"),
    )
    hs = F.sequence(F.lit(1), F.lit(HOLT_HORIZON))
    return (
        fit.select(
            F.explode(hs).alias("h"),
            "last_day",
            "n_days",
            F.col("f.l").alias("l"),
            F.col("f.b").alias("b"),
            F.col("f.sse").alias("sse"),
        )
        .select(
            F.col("h").cast("long").alias("h"),
            F.date_add(F.col("last_day"), F.col("h").cast("int")).alias(
                "forecast_day"
            ),
            F.round(
                F.col("l") + F.col("h").cast("double") * F.col("b"), 6
            ).alias("forecast_revenue"),
            F.round("l", 6).alias("level_final"),
            F.round("b", 6).alias("trend_final"),
            F.round("sse", 6).alias("sse_one_step"),
            "n_days",
        )
    )


def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rankCorr`` analog: Spearman rank correlation between a purchase's
    value and its second-of-day, per event type ("do bigger transactions
    happen later?") — completing the correlation family next to Pearson
    (``corr_matrix_daily``) and the rank tests.

    Integer-exact end to end: midranks come from per-type VALUE- and
    SECOND-OF-DAY-frequency tables (both domain-bounded — money grain
    and 86400 seconds; the mann_whitney discipline), doubled so
    2*midrank = 2*(#smaller)+cnt+1 stays an integer; Spearman is
    scale-invariant, so Pearson on the doubled ranks IS rho.  All six
    power sums are bigint (rank2 <= 2n+1: sums hold to ~1e6 rows/type,
    then the decimal fold); only the final composition is IEEE,
    mirrored.  Window walks ride the tiny frequency tables, never the
    corpus."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        ((F.unix_micros(F.col("ts")) / F.lit(1_000_000)).cast("long") % 86400).alias(
            "sod"
        ),
    )

    def rank2_table(col: str):
        freq = ev.groupBy("event_type", col).agg(F.count("*").alias("cnt"))
        w = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return freq.withColumn(
            f"r2_{col}",
            (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1).cast(
                "long"
            ),
        ).select("event_type", col, f"r2_{col}")

    rx = rank2_table("value")
    ry = rank2_table("sod")
    j = ev.join(F.broadcast(rx), ["event_type", "value"]).join(
        F.broadcast(ry), ["event_type", "sod"]
    )
    per = j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("r2_value").alias("sx"),
        F.sum("r2_sod").alias("sy"),
        F.sum(F.col("r2_value") * F.col("r2_value")).alias("sxx"),
        F.sum(F.col("r2_sod") * F.col("r2_sod")).alias("syy"),
        F.sum(F.col("r2_value") * F.col("r2_sod")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    rho = (nd * sxyd - sxd * syd) / (
        F.sqrt(nd * sxxd - sxd * sxd) * F.sqrt(nd * syyd - syd * syd)
    )
    return per.select(
        "event_type",
        F.col("n").cast("long").alias("n_sample"),
        F.round(rho, 6).alias("spearman_rho"),
    )


def kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between purchase value and hour-of-day per event
    type — the third rank statistic (after rankCorr/Spearman and the
    rank-sum tests), with full tie correction.

    The trick that makes an O(n^2)-pairs statistic distributed AND
    integer-exact: concordant/discordant counts come from a 2-D PREFIX
    SUM over the joint (value x hour) frequency grid — value domain is
    money-grained and hour has 24 levels, so the dense per-type grid is
    |values| x 24, never the corpus.  L(x,y) = #points strictly less in
    both dims (two chained window cumsums); C = sum f*L; D likewise on
    the reversed-hour grid; each unordered pair is counted once at its
    upper point.  Tie terms t_x/t_y are marginal-frequency folds.
    Everything is bigint until the one sqrt+division, mirrored.

    Scale: two window passes over the bounded grid + one broadcast join
    back; C,D hold in bigint to ~3e9 rows/type (then the decimal fold).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", F.hour("ts").cast("long").alias("hr"))
        # explicit not-nulls match the join-inferred IsNotNull so every
        # branch's cells exchange canonicalizes equal (the KS discipline)
        .filter(
            F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
            & F.col("hr").isNotNull()
        )
    )
    cells = ev.groupBy("event_type", "value", "hr").agg(F.count("*").alias("f"))
    # dense per-type grid: value spine x 24 hours (grid rows, never corpus)
    vals = cells.select("event_type", "value").distinct()
    hours = spark.range(24).select(F.col("id").cast("long").alias("hr"))
    # shuffle-hash for grid<-cells: broadcasting cells would re-derive it
    # on a second corpus scan (the KS discipline); both sides are
    # grid-bounded
    grid = (
        vals.crossJoin(F.broadcast(hours))
        .join(cells.hint("shuffle_hash"), ["event_type", "value", "hr"], "left")
        .fillna(0, subset=["f"])
    )
    # cum over value (strictly less), per (type, hour)
    wv = (
        Window.partitionBy("event_type", "hr")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g1 = grid.withColumn("cum_v", F.coalesce(F.sum("f").over(wv), F.lit(0)))
    # then cum over hour (strictly less / strictly greater), per (type, value)
    wh_less = (
        Window.partitionBy("event_type", "value")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wh_more = (
        Window.partitionBy("event_type", "value")
        .orderBy("hr")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    g2 = g1.withColumn(
        "less_both", F.coalesce(F.sum("cum_v").over(wh_less), F.lit(0)).cast("long")
    ).withColumn(
        "less_x_more_y",
        F.coalesce(F.sum("cum_v").over(wh_more), F.lit(0)).cast("long"),
    )
    cd = (
        g2.select("event_type", "value", "hr", "less_both", "less_x_more_y")
        .join(cells.withColumnRenamed("f", "fc"), ["event_type", "value", "hr"])
        .groupBy("event_type")
        .agg(
            F.sum(F.col("fc") * F.col("less_both")).alias("c_pairs"),
            F.sum(F.col("fc") * F.col("less_x_more_y")).alias("d_pairs"),
        )
    )
    # n and both tie marginals fold off the CELLS table (not the corpus):
    # every downstream branch shares the one (type, value, hr) partial-agg
    # exchange, so the corpus is scanned once at runtime.
    n_t = cells.groupBy("event_type").agg(F.sum("f").cast("long").alias("n"))
    tx = (
        cells.groupBy("event_type", "value")
        .agg(F.sum("f").alias("t"))
        .groupBy("event_type")
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("t_x"))
    )
    ty = (
        cells.groupBy("event_type", "hr")
        .agg(F.sum("f").alias("t"))
        .groupBy("event_type")
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("t_y"))
    )
    j = (
        cd.join(n_t, "event_type")
        .join(tx, "event_type")
        .join(ty, "event_type")
    )
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    num = (F.col("c_pairs") - F.col("d_pairs")).cast("double")
    den = F.sqrt((n0 - F.col("t_x")).cast("double") * (n0 - F.col("t_y")).cast("double"))
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_sample"),
        F.col("c_pairs").cast("long").alias("concordant"),
        F.col("d_pairs").cast("long").alias("discordant"),
        F.round(num / den, 6).alias("kendall_tau_b"),
    )


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report per region: the Gini coefficient,
    the Herfindahl-Hirschman index, and the Pareto question ("how many
    customers produce 80% of revenue?") over per-customer purchase
    revenue — the inequality battery behind whale-risk dashboards.

    Exactness: customer revenues stay DECIMAL; the Gini rank moment
    sum(i * rev_i) is DECIMAL(12,0) x DECIMAL(25,6) (exact), HHI's
    squares ride the DECIMAL(19,2)^2 class, and the Pareto threshold is
    the INTEGER-EXACT decimal comparison 10*cum_excl < 8*S — no IEEE
    until the final three mirrored divisions.  Ties rank by (rev,
    user_id), deterministic both engines.

    Scale shape: one per-(region, customer) partial agg, then
    region-partitioned windows — the per-region sort is the honest Gini
    cost and parallelizes across regions; no global sort, no join."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cr = ev.groupBy(
        F.concat(F.lit("region_"), (F.col("user_id") % 7).cast("string")).alias(
            "region"
        ),
        "user_id",
    ).agg(F.sum(F.col("value").cast("decimal(25,6)")).cast("decimal(25,6)").alias("rev"))
    w_asc = Window.partitionBy("region").orderBy("rev", "user_id")
    w_desc = (
        Window.partitionBy("region")
        .orderBy(F.col("rev").desc(), F.col("user_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = cr.withColumn("i", F.row_number().over(w_asc).cast("long")).withColumn(
        "cum_excl",
        F.coalesce(
            F.sum("rev").over(w_desc), F.lit(0).cast("decimal(25,6)")
        ),
    )
    per = ranked.groupBy("region").agg(
        F.count("*").alias("n"),
        F.sum("rev").alias("s"),
        F.sum(F.col("i").cast("decimal(12,0)") * F.col("rev")).alias("irev"),
        F.sum(
            F.col("rev").cast("decimal(19,2)") * F.col("rev").cast("decimal(19,2)")
        ).alias("sq"),
    )
    # Pareto needs S per region inside the row comparison: a region-total
    # window (shares the region exchange with the rank windows).
    w_tot = Window.partitionBy("region")
    p80 = (
        ranked.withColumn("s_tot", F.sum("rev").over(w_tot))
        .withColumn(
            "in_top",
            F.when(
                F.lit(10).cast("decimal(25,6)") * F.col("cum_excl")
                < F.lit(8).cast("decimal(25,6)") * F.col("s_tot"),
                1,
            ).otherwise(0),
        )
        .groupBy("region")
        .agg(F.sum("in_top").cast("long").alias("pareto80_users"))
    )
    j = per.join(p80, "region")
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    gini = F.lit(2.0) * F.col("irev").cast("double") / (nd * sd) - (
        nd + F.lit(1.0)
    ) / nd
    return j.select(
        "region",
        F.col("n").cast("long").alias("n_customers"),
        F.round(gini, 6).alias("gini"),
        F.round(F.col("sq").cast("double") / (sd * sd), 6).alias("hhi"),
        "pareto80_users",
        F.round(
            F.col("pareto80_users").cast("double") / nd, 6
        ).alias("pareto80_share"),
    )


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative revenue per purchase-week cohort at
    every age-in-weeks — the MONEY sibling of ``cohort_retention``
    (which counts users).  cohort = a user's first purchase week;
    age = weeks since; ltv_per_user divides the cohort's cumulative
    decimal revenue by its fixed user count.

    Exactness: revenue stays DECIMAL through the (cohort, age) rollup
    and the age-ordered cumulative window; user counts are bigint; ONE
    IEEE division per output row.  Scale shape: one user-grain partial
    agg for cohorts (broadcast back), one (cohort, age) rollup, and a
    window over the WEEK-DOMAIN grid (weeks x weeks rows)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    wk = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(RETENTION_EPOCH)) / 7
    ).cast("long")
    uw = ev.select("user_id", wk.alias("week"), F.col("value"))
    cohorts = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    rev = (
        uw.join(F.broadcast(cohorts), "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("age_weeks"))
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("rev"))
    )
    wc = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.withColumn("cum_rev", F.sum("rev").over(wc))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("age_weeks").cast("long").alias("age_weeks"),
            F.col("cohort_users").cast("long").alias("cohort_users"),
            F.col("cum_rev").cast("double").alias("cum_revenue"),
            F.round(
                F.col("cum_rev").cast("double")
                / F.col("cohort_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type on the daily-revenue
    series: the day where the cumulative deviation from the series mean
    peaks — the standard level-shift detector behind drift monitors.

    The exactness trick (the KS-argmax discipline applied to CUSUM):
    CUSUM_k = sum_{i<=k}(y_i - mean) needs the inexact mean — but
    scaled by n it is n*cum_k - k*S, EXACT in the decimal domain
    (cum_k, S decimal sums; n, k bigint).  The argmax runs on the exact
    scaled statistic with a min-day tiebreak; only the reported
    normalized magnitude |...|/(n) and the mean drop to IEEE (mirrored,
    two divisions).  Scale shape: one shuffle to the (type, day) grain,
    windows over the per-type day-domain frames."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(25,6)")).cast("decimal(25,6)").alias("y"))
    wt = Window.partitionBy("event_type")
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wk = Window.partitionBy("event_type").orderBy("day")
    g = (
        daily.withColumn("n", F.count("*").over(wt).cast("long"))
        .withColumn("s", F.sum("y").over(wt))
        .withColumn("cum", F.sum("y").over(wo))
        .withColumn("k", F.row_number().over(wk).cast("long"))
    )
    # exact scaled CUSUM: n*cum_k - k*S, decimal end to end
    scaled = (
        F.col("n").cast("decimal(12,0)") * F.col("cum")
        - F.col("k").cast("decimal(12,0)") * F.col("s")
    )
    g = g.withColumn("dev", F.abs(scaled))
    wmax = Window.partitionBy("event_type")
    g = g.withColumn("max_dev", F.max("dev").over(wmax))
    out = g.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.min(F.when(F.col("dev") == F.col("max_dev"), F.col("day"))).alias(
            "changepoint_day"
        ),
        F.max("max_dev").alias("max_dev"),
        F.max("s").alias("s"),
    )
    nd = F.col("n_days").cast("double")
    return out.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        "changepoint_day",
        F.round(F.col("max_dev").cast("double") / nd, 6).alias("cusum_peak"),
        F.round(F.col("s").cast("double") / nd, 6).alias("mean_daily_revenue"),
    )


def seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality indices by ratio-to-moving-average (the
    classical multiplicative decomposition step): each interior day's
    revenue over its centered 7-day trend, averaged per ISO weekday —
    the "how much bigger are Saturdays" multiplier behind seasonal
    dashboards and STL-lite pipelines.

    Exactness: the 7-day trend is a decimal window sum with ONE
    division; the per-day ratio is one more IEEE division
    (deterministic per day); the per-weekday MEAN is an ordered left
    fold over the day-sorted ratios (Spark aggregate-over-sorted-collect
    == DuckDB list_reduce over list(ORDER BY day), the cramers
    discipline) divided by an exact count.  Only full 7-day windows
    contribute (edge days drop).  Weekday key: Spark weekday+1 == DuckDB
    isodow (Mon=1).

    Scale shape: one shuffle to the daily grain; the centered window
    and the fold ride the bounded date domain."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).cast("decimal(25,6)").alias("rev")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    g = (
        daily.withColumn("s7", F.sum("rev").over(w7))
        .withColumn("c7", F.count("*").over(w7))
        .filter(F.col("c7") == 7)
        .withColumn("trend", F.col("s7").cast("double") / F.lit(7.0))
        .withColumn("ratio", F.col("rev").cast("double") / F.col("trend"))
        .withColumn("dow", (F.weekday("day") + F.lit(1)).cast("long"))
    )
    per = g.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_days"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "ratio"))),
            F.lit(0.0),
            lambda acc, s: acc + s["ratio"],
        ).alias("ratio_sum"),
    )
    return per.select(
        "dow",
        "n_days",
        F.round(
            F.col("ratio_sum") / F.col("n_days").cast("double"), 6
        ).alias("seasonal_index"),
    )


def weekday_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for "does revenue differ by weekday?":
    between-group vs within-group variance of daily revenue across the
    7 ISO-weekday groups — the parametric complement of the rank tests
    (welch/student compare ONE group vs rest; ANOVA tests all at once).

    Exactness: per-group n/sum/sum-of-squares come from ONE decimal
    power-sum aggregate over the daily MV (sums DECIMAL(25,6), squares
    DECIMAL(19,2)^2); SSB/SSW compose from group sums in a SORTED
    ordered fold (dow 1..7 — the cramers ordered-fold class) so the
    7-term double additions are identical in both engines; F is the
    final mirrored division.  Scale: one daily-grain shuffle, a 7-row
    fold."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).cast("decimal(25,6)").alias("rev")
    )
    per = daily.groupBy((F.weekday("day") + F.lit(1)).cast("long").alias("dow")).agg(
        F.count("*").alias("n"),
        F.sum("rev").alias("s"),
        F.sum(
            F.col("rev").cast("decimal(19,2)") * F.col("rev").cast("decimal(19,2)")
        ).alias("sq"),
    )
    # ordered 7-term folds: ssb_parts and totals accumulate in dow order
    cells = per.groupBy().agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("dow", "n", "s", "sq"))),
            F.struct(
                F.lit(0.0).alias("tot_n"),
                F.lit(0.0).alias("tot_s"),
                F.lit(0.0).alias("tot_sq"),
                F.lit(0.0).alias("grp"),
            ),
            lambda acc, c: F.struct(
                (acc["tot_n"] + c["n"].cast("double")).alias("tot_n"),
                (acc["tot_s"] + c["s"].cast("double")).alias("tot_s"),
                (acc["tot_sq"] + c["sq"].cast("double")).alias("tot_sq"),
                (
                    acc["grp"]
                    + (c["s"].cast("double") * c["s"].cast("double"))
                    / c["n"].cast("double")
                ).alias("grp"),
            ),
        ).alias("f"),
        F.count("*").cast("long").alias("k"),
    )
    tot_n = F.col("f.tot_n")
    ssb = F.col("f.grp") - (F.col("f.tot_s") * F.col("f.tot_s")) / tot_n
    ssw = F.col("f.tot_sq") - F.col("f.grp")
    kd = F.col("k").cast("double")
    fstat = (ssb / (kd - F.lit(1.0))) / (ssw / (tot_n - kd))
    return cells.select(
        F.col("k").alias("k_groups"),
        tot_n.cast("long").alias("n_days"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(fstat, 6).alias("f_stat"),
    )


ACF_LAGS = (1, 2, 7)


def daily_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1/2/7 — the
    ACF read (momentum at lag 1, weekly echo at lag 7) that completes
    the time-series toolkit next to trend, seasonality, changepoint and
    forecast.

    Exactness (the CUSUM scaling trick squared): the mean-centered
    factor n*y_t - S has exactly 2dp (y is money), so it casts to
    DECIMAL(19,2) EXACTLY and the lag products ride the (19,2)^2 class
    — numerator and the full-series denominator are both pure decimal,
    and each acf value is ONE IEEE division (textbook estimator:
    sum_{t<=n-k} centered_t * centered_{t+k} / sum_t centered_t^2).

    Scale shape: one shuffle to the daily grain; the lead() windows and
    the sums ride the bounded date domain; lags fan out as 3 bounded
    branches off the same frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).cast("decimal(25,6)").alias("y")
    )
    wt = Window.partitionBy()
    wd = Window.orderBy("day")
    g = (
        daily.withColumn("n", F.count("*").over(wt).cast("long"))
        .withColumn("s", F.sum("y").over(wt))
        .withColumn(
            "c",
            (
                F.col("n").cast("decimal(12,0)") * F.col("y") - F.col("s")
            ).cast("decimal(19,2)"),
        )
    )
    den = g.groupBy().agg(
        F.sum(F.col("c") * F.col("c")).alias("den"), F.max("n").alias("n")
    )
    out = None
    for k in ACF_LAGS:
        gk = g.withColumn("c_lead", F.lead("c", k).over(wd)).filter(
            F.col("c_lead").isNotNull()
        )
        num = gk.groupBy().agg(
            F.sum(F.col("c") * F.col("c_lead")).alias("num"),
            F.count("*").cast("long").alias("n_pairs"),
        )
        row = num.join(F.broadcast(den)).select(
            F.lit(k).cast("long").alias("lag"),
            "n_pairs",
            F.col("n").cast("long").alias("n_days"),
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
        out = row if out is None else out.unionByName(row)
    return out


#: sparkbar block glyphs, level 0..7 (ClickHouse renders the same ramp).
SPARKBAR_CHARS = "▁▂▃▄▅▆▇█"


def sparkbar_hourly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sparkbar`` parity (ClickHouse's inline unicode bar chart —
    ``sparkbar(24)(toHour(ts), value)``): per event type, the 24-slot
    hour-of-day revenue profile rendered as one 8-level block-glyph
    string — the "when does this metric happen" card ClickHouse prints
    straight into query results.

    Determinism contract (documented convention, exact in any engine):
    slot values are integer MICROS sums on a DENSE 0..23 grid (missing
    hours are 0), level = ((v - vmin) * 7) div (vmax - vmin) in pure
    int64 arithmetic (all slots render the full block when the profile
    is flat), glyph = the level'th char of SPARKBAR_CHARS
    (codepoint-indexed substring in both engines).  No doubles anywhere
    — the string hashes identically under any DuckDB build (SURVEY §5
    class 4).

    Scale shape: ONE (type, hour) aggregate (map-side combined,
    |types| x 24 rows), a 24-row-per-type dense-grid join, a per-type
    min/max window over the 24-row frame, and a 24-element in-row sort —
    the corpus never rides more than the one rollup shuffle."""
    ev = load_table(spark, sf_dir, "events")
    micros = (F.col("value").cast("decimal(25,6)") * F.lit(1000000)).cast("long")
    per = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).agg(F.sum(micros).alias("v"))
    grid = (
        per.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("_h"),
        )
        .select("event_type", F.col("_h").cast("long").alias("h"))
    )
    wt = Window.partitionBy("event_type")
    dense = (
        grid.join(per, ["event_type", "h"], "left")
        .fillna({"v": 0})
        .withColumn("vmin", F.min("v").over(wt))
        .withColumn("vmax", F.max("v").over(wt))
        .withColumn(
            "lvl",
            F.expr(
                "CASE WHEN vmax > vmin THEN ((v - vmin) * 7) div (vmax - vmin)"
                " ELSE 7 END"
            ).cast("int"),
        )
    )
    return dense.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("h", "lvl"))),
                lambda s: F.substring(
                    F.lit(SPARKBAR_CHARS), s["lvl"].cast("int") + 1, 1
                ),
            ),
            "",
        ).alias("sparkbar"),
        F.min("v").cast("long").alias("min_hour_micros"),
        F.max("v").cast("long").alias("max_hour_micros"),
        F.sum("v").cast("long").alias("total_micros"),
    )


def bounding_ratio_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``boundingRatio`` parity (ClickHouse's endpoints-slope aggregate —
    the rate-of-change a monitoring dashboard reads off a counter without
    storing deltas): per event type, the slope between the value at the
    EARLIEST and at the LATEST event, (y_last - y_first)/(x_last -
    x_first).

    Exactness: the endpoint values ride the argminmax struct discipline
    (min/max over (ts, event_id, value) structs — a total order, so the
    endpoints are deterministic and the aggregate merge-associative,
    partial-aggregating map-side); endpoints emit as exact integer micros
    and the slope goes through the floor chain over bigint->double-exact
    inputs (SURVEY §5 class 4: the only doubles are exact-integer-derived
    and mirrored).

    Scale shape: ONE map-side-combined aggregate, |types| rows out."""
    ev = load_table(spark, sf_dir, "events")
    by_time = F.struct(
        "ts", "event_id", F.col("value").cast("decimal(25,6)").alias("v")
    )
    agg = ev.groupBy("event_type").agg(
        F.min(by_time).alias("first"),
        F.max(by_time).alias("last"),
        F.count("*").cast("long").alias("n_events"),
    )
    ymic = lambda s: (s["v"] * F.lit(1000000)).cast("long")
    xus = lambda s: F.unix_micros(s["ts"])
    dy = (ymic(F.col("last")) - ymic(F.col("first"))).alias("dy_micros")
    dx = (xus(F.col("last")) - xus(F.col("first"))).alias("dx_us")
    out = agg.select(
        "event_type",
        F.col("first")["ts"].alias("first_ts"),
        F.col("last")["ts"].alias("last_ts"),
        ymic(F.col("first")).alias("y_first_micros"),
        ymic(F.col("last")).alias("y_last_micros"),
        dy,
        dx,
        "n_events",
    )
    slope = (
        F.col("dy_micros").cast("double")
        / F.col("dx_us").cast("double")
        * F.lit(1000000000.0)
    )
    return out.withColumn(
        "slope_nanos_per_us",
        F.floor(slope + F.lit(0.5)).cast("long"),
    )


#: quantileTiming accuracy contract (ClickHouse docs): exact below
#: SMALL ms, BIG_RES-ms resolution up to CAP, clamped at CAP.
QT_SMALL = 1024
QT_BIG_RES = 16
QT_CAP = 30000
QT_PS = (50, 95, 99)  # percent points (Low-selection convention)


def quantile_timing_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``quantileTiming`` parity (ClickHouse's latency-specialized
    quantile — the function behind every p95-latency dashboard card):
    per event type, p50/p95/p99 over millisecond timings under the
    documented accuracy contract — EXACT below 1024 ms, 16 ms resolution
    from 1024 ms to 30 s, clamped at 30 s — with the Low selection
    convention (k = ceil(p*n), pure integer rank arithmetic).

    Timings are value*10 floored to integer ms (the fixture's value
    spans ~0..4900 so BOTH accuracy regimes fire — the exact/bucketed
    split is reported and pytest-pinned falsifiable).  Everything is
    integer selection off the value-frequency table: ONE map-side-
    combined (type, bucket) aggregate, a cumulative window over the
    bucket-bounded frame, one conditional-min aggregate pulling all
    three order statistics (the weighted-percentiles shape — no global
    sort, no per-row rank).  SURVEY §5 class-4-proof: no doubles
    anywhere."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.floor(F.col("value").cast("decimal(25,6)") * 10).cast("long")
    capped = F.least(ms, F.lit(QT_CAP))
    bucket = F.when(ms < QT_SMALL, ms).otherwise(
        F.lit(QT_SMALL)
        + ((capped - QT_SMALL) - F.pmod(capped - QT_SMALL, F.lit(QT_BIG_RES)))
    )
    vf = ev.groupBy(
        "event_type", bucket.cast("long").alias("b")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(ms < QT_SMALL, 1).otherwise(0)).alias("n_exact_part"),
    )
    w_cum = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("event_type")
    cum = (
        vf.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_all))
    )
    aggs = [
        F.max("n").cast("long").alias("n_events"),
        F.sum("n_exact_part").cast("long").alias("n_exact_regime"),
    ]
    for p in QT_PS:
        k = F.expr(f"({p} * n + 99) div 100")  # ceil(p*n/100), exact ints
        aggs.append(
            F.min(F.when(F.col("cum") >= k, F.col("b"))).cast("long").alias(f"p{p}_ms")
        )
    return cum.groupBy("event_type").agg(*aggs)


def ip_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 function-family parity (ClickHouse's ``IPv4NumToString`` /
    ``IPv4StringToNum`` / CIDR membership — the fleet/abuse-analytics
    functions every clickstream with client IPs leans on): derive a
    deterministic IPv4 per event by seeded-hashing the (user, event) pair
    (raw user ids are dense small ints — hashing spreads the fleet over
    the full address space so every branch below actually fires), render
    it, round-trip it back through string parsing (the inverse is
    computed, not assumed — a render/parse bug breaks the battery), mask
    to the /24 network, and classify RFC-1918 private ranges; report per
    /8 block.

    Exactness: pure integer bit arithmetic (shifts and masks — exact in
    any engine) and string concatenation; the round-trip equality is an
    output column, so the oracle enforces the inverse too.

    Scale shape: map-side derivation, ONE <=256-row rollup."""
    from ..functions.hashing import word_hash_expr

    ev = load_table(spark, sf_dir, "events")
    ip = (
        word_hash_expr(
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.col("event_id").cast("string"),
            ),
            F.lit("ip"),
        )
        .bitwiseAND(F.lit(4294967295))
        .alias("ip")
    )
    o = [
        (F.shiftright(F.col("ip"), s).bitwiseAND(F.lit(255))).cast("long")
        for s in (24, 16, 8, 0)
    ]
    base = ev.select("event_type", ip).select(
        "event_type",
        "ip",
        o[0].alias("o1"),
        o[1].alias("o2"),
        o[2].alias("o3"),
        o[3].alias("o4"),
    )
    ip_str = F.concat_ws(
        ".",
        F.col("o1").cast("string"),
        F.col("o2").cast("string"),
        F.col("o3").cast("string"),
        F.col("o4").cast("string"),
    )
    parts = F.split(ip_str, "\\.")
    reparsed = (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )
    is_private = (
        (F.col("o1") == 10)
        | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
        | ((F.col("o1") == 192) & (F.col("o2") == 168))
    )
    rows = base.select(
        "event_type",
        "o1",
        "ip",
        (reparsed == F.col("ip")).alias("roundtrip_ok"),
        (F.col("ip") - F.col("o4")).alias("net24"),
        is_private.alias("is_private"),
    )
    return rows.groupBy(F.col("o1").alias("block8")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("ip").cast("long").alias("n_distinct_ips"),
        F.countDistinct("net24").cast("long").alias("n_distinct_nets24"),
        F.sum(F.when(F.col("is_private"), 1).otherwise(0))
        .cast("long")
        .alias("n_private"),
        F.min("ip").cast("long").alias("min_ip"),
        F.max("ip").cast("long").alias("max_ip"),
        F.min(F.when(~F.col("roundtrip_ok"), 1)).isNull().alias("all_roundtrip_ok"),
    )


def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, public paper — the
    companion gate to ``k_anonymity_report``): k-anonymity alone leaks
    when every member of a quasi-identifier group shares the SAME
    sensitive value; l-diversity requires >= l distinct sensitive values
    per group.  Quasi-identifier: customer nation; sensitive attribute:
    market segment.

    Output per nation: group size, distinct sensitive values (its l),
    the dominant segment's share in micros (homogeneity-attack exposure
    — exact integer division), and the 3-diverse flag.  Pure integer
    arithmetic; |nations|-bounded output off one map-side-combined
    aggregate pair."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )
    return per.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum("cnt").cast("long").alias("group_size"),
        F.count("*").cast("long").alias("l_distinct_sensitive"),
        F.max("cnt").cast("long").alias("dominant_count"),
        F.expr(
            "(2 * max(cnt) * 1000000 + sum(cnt)) div (2 * sum(cnt))"
        ).cast("long").alias("dominant_share_micros"),
        (F.count("*") >= 3).alias("is_3_diverse"),
    )


#: t-closeness threshold t = TCLOSE_TAU_NUM / TCLOSE_TAU_DEN = 0.05 —
#: probed r13 against the fixture's per-nation TV distances (sf0.001
#: 0.13-0.53, sf0.01 0.02-0.20, sf0.1 0.017-0.062): both flag branches
#: fire at sf0.01 AND sf0.1; at sf0.001 sampling noise puts every
#: nation above t (all-violating — the one-branch SF, documented).
TCLOSE_TAU_NUM = 1
TCLOSE_TAU_DEN = 20


def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian 2007, public paper —
    the third member of the privacy-gate family after
    ``k_anonymity_report`` and ``l_diversity_report``): l-diversity
    still leaks when a group's sensitive-value DISTRIBUTION diverges
    from the corpus-wide one (skewness/similarity attacks); t-closeness
    bounds the distance between the two.  Same attributes as the
    l-diversity gate for family coherence — quasi-identifier: customer
    nation; sensitive attribute: market segment (categorical, so the
    distance is TOTAL VARIATION: half the L1 gap between the cohort and
    global segment distributions).

    Exactness (class 4 by construction): with cohort counts c_i (size
    nc) and global counts g_i (size ng), TV = sum|c_i*ng - g_i*nc| /
    (2*nc*ng) — the numerator is an exact int64 sum (max term ~2.2e8 at
    sf0.1), the output is ONE mirrored integer division to micros, and
    the t <= 0.05 flag is the cross-multiplied integer compare
    ``10 * num <= nc * ng`` (no rational ever materializes).

    Shape: one (nation, segment) count aggregate (map-side combined,
    |nations| x |segments| rows); everything after is arithmetic over
    that bounded frame — global counts and the total broadcast back,
    a dense nation x segment grid via cross join so ABSENT cells count
    as c_i = 0 (a cohort missing a segment is exactly the skew the
    audit must see).  At 100 TB the only corpus-sized work is the first
    aggregate."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cell = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("c"))
    )
    coh = cell.groupBy("n_name").agg(
        F.sum("c").cast("long").alias("nc"),
        F.count("*").cast("long").alias("n_segments_present"),
    )
    gd = cell.groupBy("c_mktsegment").agg(F.sum("c").cast("long").alias("g"))
    tot = cell.agg(F.sum("c").cast("long").alias("tot_ng"))
    grid = (
        coh.crossJoin(F.broadcast(gd))
        .crossJoin(F.broadcast(tot))
        .join(cell, ["n_name", "c_mktsegment"], "left")
        .select(
            "n_name",
            "nc",
            "n_segments_present",
            "tot_ng",
            F.abs(
                F.coalesce("c", F.lit(0)) * F.col("tot_ng")
                - F.col("g") * F.col("nc")
            ).alias("gap"),
        )
    )
    return grid.groupBy(
        F.col("n_name").alias("nation"), "nc", "n_segments_present", "tot_ng"
    ).agg(
        F.sum("gap").cast("long").alias("num"),
    ).select(
        "nation",
        F.col("nc").alias("group_size"),
        "n_segments_present",
        F.expr("(1000000 * num) div (2 * nc * tot_ng)")
        .cast("long")
        .alias("tv_micros"),
        (
            F.lit(TCLOSE_TAU_DEN) * F.col("num")
            <= F.lit(2 * TCLOSE_TAU_NUM) * F.col("nc") * F.col("tot_ng")
        ).alias("t_close"),
    )


#: Prometheus-style le-bucket boundaries for the value histogram; the
#: last slot is +Inf (quantiles landing there clamp to the highest
#: finite bound, exactly histogram_quantile's documented behavior).
PROM_LE = [10.0, 25.0, 50.0, 100.0, 150.0, 200.0]


def prometheus_histogram_quantile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``histogram_quantile`` parity (Prometheus' bucket-interpolated
    quantile — the p90/p99 every SRE dashboard computes from cumulative
    le-buckets rather than raw samples): per event type, q50/q90/q99
    from the 6-bucket le histogram of value, with Prometheus' documented
    linear interpolation within the chosen bucket and the +Inf clamp to
    the highest finite bound.

    Exactness: bucket counts are exact integers; rank = n * phi and the
    interpolation lo + (hi - lo) * (rank - cum_prev) / cnt are mirrored
    IEEE compositions of exact-integer-derived doubles (SURVEY §5: safe
    class), rounded by the floor chain.  The +Inf branch genuinely fires
    (~1.5-2%% of values exceed the 200 top bound, so q99 clamps to 200 —
    pytest-pinned; q90 stays interpolated).

    Shape: ONE (type, bucket) aggregate (map-side combined, |types| x 7
    rows), a bucket-bounded cumulative window, one conditional-min per
    quantile — the same weighted-percentiles skeleton, Prometheus
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    b = F.lit(len(PROM_LE))
    for i in range(len(PROM_LE) - 1, -1, -1):
        b = F.when(v <= PROM_LE[i], F.lit(i)).otherwise(b)
    vf = ev.groupBy("event_type", b.cast("int").alias("b")).agg(
        F.count("*").alias("cnt")
    )
    w_cum = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("event_type")
    cum = (
        vf.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(w_all))
    )
    lo_arr = F.array(*[F.lit(x) for x in [0.0] + PROM_LE[:-1]])
    hi_arr = F.array(*[F.lit(x) for x in PROM_LE])
    aggs = [F.max("n").cast("long").alias("n_events")]
    for name, phi in (("q50", 0.5), ("q90", 0.9), ("q99", 0.99)):
        rank = F.col("n").cast("double") * F.lit(phi)
        chosen = F.min(
            F.when(
                F.col("cum").cast("double") >= rank,
                F.struct("b", "cum_prev", "cnt"),
            )
        )
        aggs.append(chosen.alias(f"_{name}"))
        aggs.append(F.max(rank).alias(f"_{name}_rank"))
    agg = cum.groupBy("event_type").agg(*aggs)
    out_cols = [F.col("event_type"), F.col("n_events")]
    for name in ("q50", "q90", "q99"):
        ch = F.col(f"_{name}")
        rank = F.col(f"_{name}_rank")
        lo = F.element_at(lo_arr, ch["b"] + 1)
        hi = F.element_at(hi_arr, ch["b"] + 1)
        interp = lo + (hi - lo) * (
            rank - ch["cum_prev"].cast("double")
        ) / ch["cnt"].cast("double")
        val = F.when(ch["b"] >= len(PROM_LE), F.lit(PROM_LE[-1])).otherwise(
            interp
        )
        out_cols.append(
            (F.floor(val * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).alias(
                name
            )
        )
    return agg.select(*out_cols)


def date_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function-family parity (ClickHouse's ``toStartOfWeek`` /
    ``toISOWeek`` / ``toQuarter`` / ``age('month', ...)`` — the calendar
    keys every report groups by): per order date, the ISO-Monday week
    start, ISO week-of-year, quarter, day-of-year, and the integer
    month age to a fixed anchor — then ONE rollup per (week_start)
    proving the keys group consistently.

    Exactness: all pure calendar arithmetic on DATE values (both engines
    implement ISO week/Monday-truncation identically); the month age is
    explicit integer arithmetic (y*12 + m deltas — no fractional
    months_between, whose day-fraction convention is engine-specific).

    Shape: map-side derivation + one |weeks|-bounded rollup."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    age_months = (F.year(F.lit("2000-01-01")) * 12 + F.month(F.lit("2000-01-01"))) - (
        F.year(d) * 12 + F.month(d)
    )
    base = orders.select(
        d.alias("order_date"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.quarter(d).cast("long").alias("quarter"),
        F.dayofyear(d).cast("long").alias("day_of_year"),
        age_months.cast("long").alias("age_months_to_y2k"),
    )
    return base.groupBy("week_start").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.min("order_date").alias("first_date"),
        F.max("order_date").alias("last_date"),
        F.min("iso_week").cast("long").alias("iso_week_min"),
        F.max("iso_week").cast("long").alias("iso_week_max"),
        F.min("quarter").cast("long").alias("q_min"),
        F.max("quarter").cast("long").alias("q_max"),
        F.min("day_of_year").cast("long").alias("doy_min"),
        F.max("age_months_to_y2k").cast("long").alias("age_months_max"),
    )


def resample_combinator_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-Resample`` combinator analog (NEW r11):
    ``countResample(0, 400000, 100000)(o_totalprice)`` /
    ``sumResample(...)`` per order priority — the aggregate is split into
    fixed resample-key bands [start, start+step), one array element per
    band, and keys OUTSIDE [start, end) are DISCARDED (ClickHouse
    semantics; ~20% of orders sit above 400k on the fixture, so the
    discard branch is live — pytest-pinned).  Empty bands emit zero, the
    way the combinator pads its result array.

    Output canon: the band arrays ride as CSV strings (the registry's
    no-top-level-array rule); counts are longs, sums exact
    decimal(25,6)-domain strings, so the canon is engine-portable.

    Spark shape: one partial-agg shuffle on (priority, band); the
    zero-fill grid is |priorities| x 4 rows — the priority domain comes
    from a SECOND, column-pruned scan of orders (distinct over the
    5-value priority column: map-side-combined to 5 rows, a rounding
    error next to the main aggregate) crossed with a range(4); the
    final per-priority fold is a sort_array + transform over <= 4
    elements.  At 100 TB the only full-width corpus pass is the first
    aggregate."""
    start, end, step, nband = 0.0, 400000.0, 100000.0, 4
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / F.lit(step)).cast("long").alias("band"),
        F.col("o_totalprice").cast("decimal(25,6)").alias("v"),
    )
    per = (
        o.filter((F.col("band") >= 0) & (F.col("band") < nband))
        .groupBy("o_orderpriority", "band")
        .agg(F.count("*").cast("long").alias("cnt"), F.sum("v").alias("s"))
    )
    grid = (
        o.select("o_orderpriority")
        .distinct()
        .crossJoin(spark.range(nband).select(F.col("id").alias("band")))
    )
    full = grid.join(per, ["o_orderpriority", "band"], "left").select(
        "o_orderpriority",
        "band",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
        F.coalesce(F.col("s"), F.lit(0).cast("decimal(25,6)")).alias("s"),
    )
    packed = full.groupBy("o_orderpriority").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.struct("band", "cnt"))),
                lambda e: e["cnt"].cast("string"),
            ),
        ).alias("count_resample_csv"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.struct("band", "s"))),
                lambda e: e["s"].cast("string"),
            ),
        ).alias("sum_resample_csv"),
        F.sum("cnt").cast("long").alias("n_in_range"),
    )
    return packed


#: Two-sided 95% normal quantile and 80%-power quantile — the textbook
#: constants ClickHouse's minSampleSize* family hard-codes; literals so no
#: engine evaluates an inverse-CDF.
Z_ALPHA_9750 = 1.9599639845400545
Z_POWER_8000 = 0.8416212335729143


def proportions_ztest_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``proportionsZTest`` analog (ClickHouse's two-sample proportion
    test): each user cohort (user_id % 5; real conversion variance on
    the fixture) against cohort 0 as control — pooled-variance z
    statistic plus the unpooled 95% CI on the rate difference, the
    standard A/B readout.  The p-value leg is deliberately omitted:
    it needs erf/erfc, engine-libm territory the exactness discipline
    bans (same reasoning as the squared-loss probe trainer).

    Exactness: successes/trials are exact integer aggregates; the
    descent to double happens once and every +,-,*,/ and sqrt after it
    is textually mirrored in the oracle (the welch_ttest_values
    precedent); outputs round-6.

    Scale shape: one partial-agg shuffle over events into 5 rows, a
    broadcast of the control row, scalar arithmetic out."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).cast("long").alias("cohort"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    per = ev.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    ctrl = per.filter(F.col("cohort") == 0).select(
        F.col("n").alias("ctl_n"), F.col("x").alias("ctl_x")
    )
    j = per.filter(F.col("cohort") != 0).join(F.broadcast(ctrl))
    n1, x1 = F.col("n").cast("double"), F.col("x").cast("double")
    n0, x0 = F.col("ctl_n").cast("double"), F.col("ctl_x").cast("double")
    p1, p0 = x1 / n1, x0 / n0
    pool = (x1 + x0) / (n1 + n0)
    se_pool = F.sqrt(pool * (1 - pool) * (1 / n1 + 1 / n0))
    se_raw = F.sqrt(p1 * (1 - p1) / n1 + p0 * (1 - p0) / n0)
    z = (p1 - p0) / se_pool
    return j.select(
        "cohort",
        F.col("n").alias("n_sample"),
        F.col("x").alias("conversions"),
        F.round(p1, 6).alias("p_sample"),
        F.round(p0, 6).alias("p_control"),
        F.round(z, 6).alias("z_stat"),
        F.round((p1 - p0) - F.lit(Z_ALPHA_9750) * se_raw, 6).alias("ci_low"),
        F.round((p1 - p0) + F.lit(Z_ALPHA_9750) * se_raw, 6).alias("ci_high"),
    )


def min_sample_size_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``minSampleSizeConversion`` analog (ClickHouse's A/B planning
    family): for each cohort's MEASURED baseline conversion rate and a
    grid of minimum detectable effects (absolute +1/+2/+5 points), the
    per-variant sample size the two-proportion normal approximation
    requires at alpha = 0.05 (two-sided) and power = 0.80:

        n = (z_a * sqrt(2 pbar (1-pbar)) + z_b * sqrt(p1(1-p1) + p2(1-p2)))^2
            / (mde * mde),   p2 = p1 + mde, pbar = (p1+p2)/2

    — the exact formula the ClickHouse function documents, with the
    normal quantiles as shared literals (no engine evaluates an
    inverse CDF).  The square is an explicit self-multiply (pow is
    banned); every double op after the integer aggregate is textually
    mirrored in the oracle; outputs round-6.

    Scale shape: the corpus pass is one 5-row aggregate; the MDE grid
    is a 3-literal cross join; everything after is scalar arithmetic
    on 15 rows."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).cast("long").alias("cohort"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    per = ev.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    mdes = spark.createDataFrame([(0.01,), (0.02,), (0.05,)], "mde double")
    j = per.crossJoin(F.broadcast(mdes))
    p1 = F.col("x").cast("double") / F.col("n").cast("double")
    p2 = p1 + F.col("mde")
    pbar = (p1 + p2) / 2
    root = F.lit(Z_ALPHA_9750) * F.sqrt(2 * pbar * (1 - pbar)) + F.lit(
        Z_POWER_8000
    ) * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    n_req = root * root / (F.col("mde") * F.col("mde"))
    return j.select(
        "cohort",
        "mde",
        F.round(p1, 6).alias("p_baseline"),
        F.round(n_req, 6).alias("min_n_per_variant"),
    )


def contingency_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``contingency`` / Tschuprow-T analogs (ClickHouse's remaining
    chi-square association aggregates next to ``cramersV`` — ``theilsU``
    stays out deliberately: it needs log, engine-libm territory):
    Pearson's contingency coefficient C = sqrt(chi2 / (chi2 + n)) and
    Tschuprow's T = sqrt(phi2 / sqrt((r-1)(c-1))) over the shared
    (event_type x region) table — the one-row dependence report read
    next to ``cramers_v_assoc``.

    Exactness: chi2 comes bit-identical from the shared ordered-fold
    helper; the coefficient chains are +,-,*,/ and sqrt with the op
    order textually mirrored in the oracle; round-6 outputs.

    Scale shape: identical to cramers_v_assoc — one partial-agg shuffle
    to the cell grid, scalar arithmetic on one row."""
    agg = _chi2_contingency_agg(load_table(spark, sf_dir, "events"))
    nd = F.col("n_total").cast("double")
    rd = F.col("r_levels").cast("double")
    cd = F.col("c_levels").cast("double")
    phi2 = F.col("chi2") / nd
    return agg.select(
        F.col("n_total").cast("long").alias("n_total"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + nd)), 6).alias(
            "contingency_c"
        ),
        F.round(
            F.sqrt(phi2 / F.sqrt((rd - F.lit(1.0)) * (cd - F.lit(1.0)))), 6
        ).alias("tschuprow_t"),
    )


def derivative_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``runningDifference`` / ``nonNegativeDerivative`` analogs over the
    per-type DAILY revenue series (the gauge-derivative sibling of the
    per-user counter fold in ``delta_sum_counters``): per (type, day)
    with a predecessor — the exact decimal delta vs the previous
    OBSERVED day, the day gap, the per-day rate (delta normalized by the
    gap, ClickHouse's derivative-with-units convention at day
    granularity), and its non-negative clamp (monitoring's
    reset-suppressing rate).

    Exactness (SURVEY §5 class 4 by construction): daily sums and their
    deltas ride the decimal domain; delta quantizes to exact integer
    micros (scale-6 decimal * 1e6 has zero fractional part); the rate is
    ONE round-half-up division computed through the floor chain over
    bigint->double-exact operands — floor((2*d + g) / (2*g)) — mirrored
    textually (negative deltas floor identically in both engines: same
    IEEE divide, same floor).  Zero raw doubles in the output.

    Scale shape: one (type, day) partial-agg shuffle, then a lag window
    on the O(types x days) rollup — never the corpus."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("rev"))
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.select(
        "event_type",
        "day",
        "rev",
        F.lag("rev").over(w).alias("prev_rev"),
        F.lag("day").over(w).alias("prev_day"),
    ).filter(F.col("prev_rev").isNotNull())
    delta_micros = ((F.col("rev") - F.col("prev_rev")) * F.lit(1000000)).cast(
        "long"
    )
    gap = F.datediff(F.col("day"), F.col("prev_day")).cast("long")
    rate = F.floor(
        (F.lit(2) * delta_micros + gap).cast("double")
        / (F.lit(2) * gap).cast("double")
    ).cast("long")
    return d.select(
        "event_type",
        "day",
        delta_micros.alias("delta_micros"),
        gap.alias("gap_days"),
        rate.alias("rate_micros_per_day"),
        F.greatest(rate, F.lit(0).cast("long")).alias("nonneg_rate_micros"),
    )


#: merge_asof tolerance for the bounded as-of enrich: 1 day (the events
#: fixture spans ~30 days, so within/beyond/no-prior all fire).
ASOF_TOLERANCE_US = 86_400_000_000


def asof_tolerance_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas ``merge_asof(tolerance=...)``,
    QuestDB/kdb's bounded asof): every event enriched with the user's
    most recent strictly-prior purchase ONLY if it is at most 1 day old
    — older matches null out, exactly the "stale features are worse
    than no features" rule online feature stores enforce.  Because the
    as-of candidate is the NEAREST prior, filtering it by the tolerance
    is the complete semantics (any other prior is older still).

    Three output branches all live on the fixture (pytest-pinned):
    no prior purchase / prior within tolerance / prior too old.

    Scale shape: identical to ``last_purchase_asof`` — one user-key
    shuffle, a running last-ignore-nulls window, per-row arithmetic;
    the tolerance adds zero passes.  Gap is exact integer micros."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_p = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
    ).over(w)
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(last_p)
    within = last_p.isNotNull() & (gap <= F.lit(ASOF_TOLERANCE_US))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(within, last_p).alias("asof_purchase_ts"),
        F.when(within, gap).alias("asof_gap_us"),
        F.when(last_p.isNull(), F.lit("no_prior"))
        .when(within, F.lit("matched"))
        .otherwise(F.lit("too_old"))
        .alias("asof_state"),
    )


def asof_nearest_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with ``direction='nearest'`` (NEW r12 — completes the
    merge_asof direction triple: backward = ``last_purchase_asof``,
    forward = ``error_recovery_asof``, bounded = ``asof_tolerance_enrich``):
    each signup paired with the user's CLOSEST purchase by absolute time
    gap, either side.  Tie rule (documented, deterministic): equal gaps
    take the PRIOR purchase — the rule matters for the contract even
    though integer-microsecond timestamps make corpus ties nonexistent
    (probed r12: zero at every SF; no corpus claim made).  Signups whose
    user has no purchase at all drop (inner semantics; also empty on the
    fixture — every signup user purchases).

    Spark shape: ONE user-key shuffle — running max-of-prior /
    min-of-following purchase-ts window frames over the per-user event
    order (ts ascends inside the frame, so frame max IS the nearest
    prior without IGNORE NULLS machinery), then one equi-join back on
    (user_id, matched ts) for the matched event id (purchase (user, ts)
    pairs are collision-free at every SF — probed r12).  The frames are
    VALUE-based RANGE frames on the epoch-micros key (r13, ADVICE): a
    purchase sharing a signup's exact timestamp is PRIOR by the
    ``p_tu <= s_tu`` rule regardless of how its event_id happens to
    sort — a ROWS frame over (tu, event_id) would classify it 'next'
    whenever its id sorts after the signup's, diverging from the rule
    (edge pinned in ``test_r12_ops.py`` on a constructed collision;
    corpus collisions are zero at every SF, so the fixture could not
    catch it).  Gap is exact integer micros; everything else is
    ids/strings — class-4 by type.

    The oracle is an INDEPENDENT construction (the dau_wau precedent):
    a per-user conditional-extrema join instead of ordered windows —
    exact-integer outputs make the cross-algorithm equality a strong
    check."""
    ev = load_table(spark, sf_dir, "events")
    tu = F.unix_micros(F.col("ts"))
    base = ev.select(
        "user_id", "event_id", "event_type", tu.alias("tu")
    )
    order = Window.partitionBy("user_id").orderBy("tu")
    p_tu = F.when(F.col("event_type") == "purchase", F.col("tu"))
    # RANGE frames: prior = p_tu <= tu (ties included), next = p_tu > tu
    prev_tu = F.max(p_tu).over(order.rangeBetween(Window.unboundedPreceding, 0))
    next_tu = F.min(p_tu).over(order.rangeBetween(1, Window.unboundedFollowing))
    picked = (
        base.select(
            "user_id",
            "event_id",
            "event_type",
            "tu",
            prev_tu.alias("prev_tu"),
            next_tu.alias("next_tu"),
        )
        .filter(F.col("event_type") == "signup")
        .filter(F.col("prev_tu").isNotNull() | F.col("next_tu").isNotNull())
        .select(
            "user_id",
            "event_id",
            "tu",
            F.when(
                F.col("prev_tu").isNotNull()
                & (
                    F.col("next_tu").isNull()
                    | (F.col("tu") - F.col("prev_tu") <= F.col("next_tu") - F.col("tu"))
                ),
                F.lit("prior"),
            )
            .otherwise(F.lit("next"))
            .alias("direction"),
            F.when(
                F.col("prev_tu").isNotNull()
                & (
                    F.col("next_tu").isNull()
                    | (F.col("tu") - F.col("prev_tu") <= F.col("next_tu") - F.col("tu"))
                ),
                F.col("prev_tu"),
            )
            .otherwise(F.col("next_tu"))
            .alias("matched_tu"),
        )
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("tu").alias("p_tu"),
        F.col("event_id").alias("matched_event_id"),
    )
    # join on user_id alone + residual ts-equality filter: the join key
    # matches the window's partitioning (one exchange reused), and the
    # pre-filter blowup is bounded by purchases-per-user, never the corpus
    return (
        picked.join(purchases, "user_id")
        .filter(F.col("matched_tu") == F.col("p_tu"))
        .select(
            "user_id",
            "event_id",
            "direction",
            F.abs(F.col("tu") - F.col("matched_tu")).cast("long").alias("gap_micros"),
            F.col("matched_event_id").cast("long").alias("matched_event_id"),
        )
    )


def limit_with_ties_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FETCH FIRST 1 ROWS WITH TIES`` (SQL:2008; ClickHouse ``LIMIT 1
    WITH TIES``) materialized per return flag: the whole PEER GROUP of
    the top row by quantity — distinct from ``argminmax_battery``,
    which keeps ONE argument per extremum; WITH TIES keeps every tied
    row (hundreds per flag on the integer-grained quantity domain,
    pytest-pinned), summarized as a bounded card (tied rowcount +
    their exact revenue).

    Scale shape: the boundary value is a map-side-combined max per
    flag (3 rows), broadcast back; the peer filter is a scan-level
    predicate after the join — never a global sort or a rank window
    over the corpus (the threshold-then-filter shape WITH TIES takes
    at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.groupBy("l_returnflag").agg(F.max("l_quantity").alias("top_q"))
    tied = li.join(F.broadcast(mx), "l_returnflag").filter(
        F.col("l_quantity") == F.col("top_q")
    )
    return tied.groupBy("l_returnflag").agg(
        F.max(F.col("top_q").cast("long")).alias("top_quantity"),
        F.count("*").cast("long").alias("n_tied"),
        dsum("l_extendedprice").alias("tied_revenue"),
    )


def bitmap_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBitmapAnd/Or/Xor`` analogs (ClickHouse's roaring-bitmap
    segment algebra): for the three audience pairs among purchase /
    view / click, the exact cardinalities of A, B, A AND B, A OR B and
    A XOR B over user-id sets — the segment-overlap report
    ``user_overlap_matrix`` (intersections only) doesn't cover.

    The bitmap identity that makes it ONE pass: materialize per-user
    membership FLAGS (three 0/1 columns, one user-key partial agg), then
    every pair statistic is an integer sum — and = sum(a*b),
    or = sum(max(a,b)), xor = sum(a + b - 2ab).  No per-pair joins, no
    set materialization; at 100 TB the flags frame is |users| rows and
    the algebra is a one-row aggregate.

    All-integer output; the oracle mirrors the identical CASE sums."""
    ev = load_table(spark, sf_dir, "events")

    def _flag(t: str):
        return F.max(F.when(F.col("event_type") == t, 1).otherwise(0))

    flags = ev.groupBy("user_id").agg(
        _flag("purchase").alias("p"), _flag("view").alias("v"), _flag("click").alias("c")
    )

    def _pair(a, b):
        return (
            F.sum(F.col(a)).cast("long"),
            F.sum(F.col(b)).cast("long"),
            F.sum(F.col(a) * F.col(b)).cast("long"),
            F.sum(F.greatest(F.col(a), F.col(b))).cast("long"),
            F.sum(F.col(a) + F.col(b) - 2 * F.col(a) * F.col(b)).cast("long"),
        )

    aggs = []
    for a, b in (("p", "v"), ("p", "c"), ("v", "c")):
        ca, cb, i_, u_, x_ = _pair(a, b)
        aggs += [
            ca.alias(f"card_{a}_{b}_a"), cb.alias(f"card_{a}_{b}_b"),
            i_.alias(f"and_{a}_{b}"), u_.alias(f"or_{a}_{b}"), x_.alias(f"xor_{a}_{b}"),
        ]
    one = flags.agg(*aggs)
    names = {"p": "purchase", "v": "view", "c": "click"}
    pairs = F.array(*[
        F.struct(
            F.lit(f"{names[a]}|{names[b]}").alias("pair"),
            F.col(f"card_{a}_{b}_a").alias("card_a"),
            F.col(f"card_{a}_{b}_b").alias("card_b"),
            F.col(f"and_{a}_{b}").alias("and_card"),
            F.col(f"or_{a}_{b}").alias("or_card"),
            F.col(f"xor_{a}_{b}").alias("xor_card"),
        )
        for a, b in (("p", "v"), ("p", "c"), ("v", "c"))
    ])
    return one.select(F.explode(pairs).alias("s")).select("s.*")


def array_set_ops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``arrayIntersect`` / ``arrayUnion`` / ``arrayExcept`` /
    ``arrayDistinct`` parity (ClickHouse's array set functions, Spark's
    array_intersect/union/except/distinct): per user, the distinct
    event-type sets of the FIRST and SECOND halves of their activity
    (split at rn*2 <= cnt on the (ts, event_id) order) and the set
    algebra between them — the "did behavior change" card.  CSVs sort
    ascending (the canon rule).  (Every fixture user has >= 49 events,
    so the empty-half case never occurs on the corpus — r12 probe; the
    expression chain handles it, but no corpus claim is made.)

    Oracle discipline: INDEPENDENT construction — the oracle never
    touches list functions; it recomputes per-(user, type) membership
    flags relationally and string_aggs the qualifying types, so the
    Spark array kernels are checked against a different algorithm.

    Scale shape: one user-key shuffle shared by the rank windows and the
    collect_set aggregate; per-user state is bounded by the 5-type
    domain."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    halves = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w) * 2 <= F.count("*").over(wc)).alias("in_first"),
    )
    sets = halves.groupBy("user_id").agg(
        F.collect_set(F.when(F.col("in_first"), F.col("event_type"))).alias("fs"),
        F.collect_set(F.when(~F.col("in_first"), F.col("event_type"))).alias("ss"),
    )
    return sets.select(
        "user_id",
        F.concat_ws(",", F.array_sort(F.array_intersect("fs", "ss"))).alias(
            "intersect_csv"
        ),
        F.concat_ws(",", F.array_sort(F.array_union("fs", "ss"))).alias("union_csv"),
        F.concat_ws(",", F.array_sort(F.array_except("fs", "ss"))).alias(
            "except_csv"
        ),
        F.size(F.array_distinct(F.concat("fs", "ss"))).cast("long").alias("n_types"),
    )


def group_array_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupArrayIntersect`` analog (ClickHouse 24.x): per user, the
    event types present in EVERY one of their active ISO weeks — the
    "consistent behavior" card.  WEEK grain is deliberate: the fixture's
    users are active 21-30 of 30 days, so a DAILY intersection is
    always empty (vacuous — falsifiability rule); weekly sets span the
    full 0..5 range at every SF (both the empty and the full-domain
    branch fire, pytest-pinned).  The Spark side genuinely folds
    ``array_intersect`` over the per-week type sets (a Catalyst HOF
    ``aggregate`` seeded with the full 5-type domain literal); the
    oracle is an INDEPENDENT relational construction (types whose
    distinct-week presence equals the user's active-week count) — two
    algorithms, one exact answer.

    Scale shape: one (user, week) partial-agg shuffle builds the week
    sets, one user-key aggregate folds them; per-user state is bounded
    by weeks x 5 types."""
    ev = load_table(spark, sf_dir, "events")
    week_sets = ev.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(F.collect_set("event_type").alias("types"))
    domain = F.array(
        *[F.lit(t) for t in ("click", "error", "purchase", "signup", "view")]
    )
    per_user = week_sets.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_active_weeks"),
        F.aggregate(
            F.collect_list("types"), domain, lambda acc, s: F.array_intersect(acc, s)
        ).alias("common"),
    )
    return per_user.select(
        "user_id",
        "n_active_weeks",
        F.concat_ws(",", F.array_sort("common")).alias("common_csv"),
        F.size("common").cast("long").alias("n_common"),
    )


def bag_set_ops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INTERSECT ALL`` / ``EXCEPT ALL`` — the MULTISET set operations
    (SQL bag semantics: per value, min / truncated-difference of
    multiplicities) the r5 distinct-semantics legs don't cover, over a
    domain where the two genuinely differ (the view-vs-click bags of
    the 100-value props key carry ~20x multiplicities: INTERSECT ALL
    keeps ~1700 rows where INTERSECT keeps 100).

    The Spark side exercises the real ``intersectAll`` / ``exceptAll``
    operators and aggregates their outputs per key; the oracle is the
    INDEPENDENT multiset identity — least(cv, cc) and
    greatest(cv - cc, 0) off plain count tables — two algorithms, one
    exact answer.  Output frame: every key of the LEFT bag, zero-filled
    (bag ops are left-anchored: keys only in the right bag appear in
    neither result).

    Scale shape: intersectAll/exceptAll hash-partition both bags by the
    full row once (Spark plans them as aggregate+join on the row
    value); the per-key rollups reuse that partitioning."""
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(
        F.get_json_object("props", "$.k").cast("long"), F.lit(0)
    ).alias("k")
    v = ev.filter(F.col("event_type") == "view").select(k)
    c = ev.filter(F.col("event_type") == "click").select(k)
    inter = v.intersectAll(c).groupBy("k").agg(
        F.count("*").cast("long").alias("n_intersect_all")
    )
    exc = v.exceptAll(c).groupBy("k").agg(
        F.count("*").cast("long").alias("n_except_all")
    )
    base = v.distinct()
    return (
        base.join(inter, "k", "left")
        .join(exc, "k", "left")
        .select(
            "k",
            F.coalesce("n_intersect_all", F.lit(0)).cast("long").alias(
                "n_intersect_all"
            ),
            F.coalesce("n_except_all", F.lit(0)).cast("long").alias("n_except_all"),
        )
    )


def avg_map_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``avgMap`` combinator analog — the MEAN member that completes the
    Map aggregation family (sumMap/countMap r9, minMap/maxMap r9): per
    day, the sorted event-type key list with positionally-aligned
    per-key average values as exact integer micros — each element ONE
    round-half-up integer division of the decimal-domain key sum by the
    key count ((2*S6 + n) via the floor chain, the
    ``group_array_moving_avg`` convention), so the CSV is
    engine-build-proof (zero doubles anywhere).

    Shape: identical to the siblings — (day, key) partial+final
    aggregate, then a per-day collect over at most |key-domain| rows."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
        F.count("*").alias("n"),
    )
    s6 = (F.col("s") * 1000000).cast("long")
    avg_micros = F.floor(
        (2 * s6 + F.col("n")).cast("double") / (2 * F.col("n")).cast("double")
    ).cast("long")
    kv = F.sort_array(
        F.collect_list(F.struct("event_type", avg_micros.alias("am")))
    )
    return per.groupBy("day").agg(
        F.array_join(F.transform(kv, lambda x: x["event_type"]), ",").alias(
            "keys_csv"
        ),
        F.array_join(
            F.transform(kv, lambda x: x["am"].cast("string")), ","
        ).alias("avgs_micros_csv"),
    )


def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics battery — the fixture carries NO NULLs anywhere
    (SURVEY §1.3: every field defaulted at parse), so the engine's
    NULL aggregate contract was untested end-to-end; a deterministic
    15% of values are nulled here (props key % 7 == 0) to pin it:
    count(*) vs count(col) (null-skipping), null-skipping sum/min/max,
    the exact-integer-micros mean over the NONNULL count, the
    grouping-treats-NULLs-as-one-group cardinality
    (count distinct + null-group flag), and a coalesce-sentinel sum
    whose difference from the plain sum is EXACTLY the null count —
    every leg falsifiable arithmetic, all decimal/integer exact.

    One map-side-combined aggregate per event type; the oracle mirrors
    each SQL-standard rule (both engines implement the standard — the
    battery proves the ENGINE WIRING, e.g. that no normalize/default
    step resurrects a NULL)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").cast("long"), F.lit(0))
    v = F.when(k % 7 != 0, F.col("value").cast("decimal(25,6)"))
    per = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(v).cast("long").alias("n_nonnull"),
        (F.count("*") - F.count(v)).cast("long").alias("n_null"),
        F.sum(v).cast("double").alias("sum_nonnull"),
        F.min(v).cast("string").alias("min_nonnull"),
        F.max(v).cast("string").alias("max_nonnull"),
        F.floor(
            ((F.sum(v) * 1000000).cast("long") * 2 + F.count(v)).cast("double")
            / (2 * F.count(v)).cast("double")
        ).cast("long").alias("avg_micros_nonnull"),
        (
            F.countDistinct(v)
            + F.max(F.when(v.isNull(), 1).otherwise(0))
        ).cast("long").alias("n_value_groups"),
        F.sum(F.coalesce(v, F.lit(-1).cast("decimal(25,6)"))).cast("double").alias(
            "sum_sentinel"
        ),
    )
    return per


def time_bucket_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse time-bucketing function family beyond the hour/day
    grains the rollups already prove: ``toStartOfInterval(ts, INTERVAL
    15 MINUTE)``, ``timeSlot`` (the 30-minute slot), and ``toTime``'s
    time-of-day component (seconds since midnight — emitted as the
    integer it is; re-attaching ClickHouse's fake 1970-01-02 date adds
    nothing).  All three derive from ONE integer epoch division chain
    (epoch_s DIV grain * grain), so bucket identity is exact in any
    engine; revenue rides the decimal domain internally and ships as
    EXACT INTEGER MICROS (r12 no-decimal-output gate rule).

    Scale shape: one map-side-combined aggregate to the 15-minute
    grain (|buckets| bounded by the fixture's 30-day span x 96);
    the coarser keys are derived FROM the fine bucket, never a second
    pass over events."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    epoch = F.unix_seconds(F.col("ts"))
    q15 = (epoch - (epoch % 900)).alias("q15_epoch")
    per = ev.groupBy(q15).agg(
        F.count("*").cast("long").alias("n_events"),
        (F.sum(F.col("value").cast("decimal(25,6)")) * F.lit(1000000))
        .cast("long")
        .alias("revenue_micros"),
    )
    e15 = F.col("q15_epoch")
    return per.select(
        F.timestamp_seconds(e15).alias("bucket_15m"),
        F.timestamp_seconds(e15 - (e15 % 1800)).alias("time_slot_30m"),
        (e15 % 86400).cast("long").alias("secs_since_midnight"),
        "n_events",
        "revenue_micros",
    )


def rounding_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse rounding-function family — ``roundToExp2`` /
    ``roundDown`` / ``roundAge`` / ``roundDuration`` (NEW r14; the one
    scalar family of the reference engine's math page with no analog
    here; round/floor/ceil/bround live in the date/round batteries).

    Inputs are real fixture signals so every ladder branch is
    falsifiable (probed at sf0.01): event values (cents 1..49002 ->
    exp2 buckets spread 1..32768), per-user inter-event gaps (8 s ..
    ~4 days, median ~26 ks -> the full roundDuration ladder fires),
    and event_id % 100 as the age proxy (0..99 at every SF -> every
    roundAge band; user_id tops out at ~19 at sf0.001, probed).

    Semantics mirrored from ClickHouse docs:
    - roundToExp2(x): 0 for x < 1, else the largest power of two <= x —
      computed EXACTLY as ``1 << (bit_length(x) - 1)`` via the bin()
      string both engines render without leading zeros (no log2, which
      is engine-libm and banned by the oracle discipline);
    - roundDown(x, set): the greatest element <= x, else the SMALLEST
      element (ClickHouse returns the first element below range);
    - roundAge / roundDuration: the documented CASE ladders.

    Output: (kind, bucket, n) counts — exact integers, one grouped
    aggregate per kind unioned map-side; the only corpus-shaped work is
    the per-user lag window for gaps (one user-keyed exchange)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # F.shiftleft takes a literal shift only — the column-shift form
    # rides a SQL expr (both engines: 1 << (bit_length - 1))
    exp2 = F.when(
        cents >= 1,
        F.expr(
            "shiftleft(CAST(1 AS BIGINT),"
            " CAST(length(bin(CAST(floor(value * 100 + 0.5) AS BIGINT))) - 1"
            " AS INT))"
        ),
    ).otherwise(F.lit(0)).cast("long")
    down_set = [1000, 5000, 10000, 20000, 40000]
    down = F.when(cents >= down_set[-1], F.lit(down_set[-1]))
    for b in reversed(down_set[:-1]):
        down = down.when(cents >= b, F.lit(b))
    down = down.otherwise(F.lit(down_set[0])).cast("long")
    age = F.pmod(F.col("event_id"), F.lit(100))
    r_age = (
        F.when(age < 1, F.lit(0))
        .when(age < 18, F.lit(17))
        .when(age < 25, F.lit(18))
        .when(age < 35, F.lit(25))
        .when(age < 45, F.lit(35))
        .when(age < 55, F.lit(45))
        .otherwise(F.lit(55))
        .cast("long")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_seconds("ts") - F.lag(F.unix_seconds("ts")).over(w)
    ).cast("long")
    dur_bounds = [1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800,
                  3600, 7200, 18000, 36000]
    # each user's first event has no gap: keep it NULL so the isNotNull
    # filter drops it (it must not pollute the <1 s bucket)
    r_dur = F.when(gap.isNull(), F.lit(None))
    for b in [dur_bounds[-1]] + list(reversed(dur_bounds[:-1])):
        r_dur = r_dur.when(gap >= b, F.lit(b))
    r_dur = r_dur.otherwise(F.lit(0)).cast("long")

    def counts(col, kind: str) -> DataFrame:
        return (
            ev.select(col.alias("bucket"))
            .filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n"))
            .select(F.lit(kind).alias("kind"), "bucket", "n")
        )

    return (
        counts(exp2, "exp2_cents")
        .unionByName(counts(down, "down_cents"))
        .unionByName(counts(r_age, "age"))
        .unionByName(counts(r_dur, "duration"))
    )


def sample_factor_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``SAMPLE k`` + ``_sample_factor`` — hash-sampled
    approximate analytics with scale-up correction (NEW r14).  The
    sampling key is the engine-portable md5-derived user hash
    (``stable_hash64 % 5 == 0`` -> a deterministic ~20% USER cohort —
    2/22/295 users at the three SFs, probed live everywhere; sampling
    whole users, not rows, is what keeps per-user analytics valid
    inside a sample, exactly ClickHouse's SAMPLE BY intHash32(UserID)
    discipline).  Estimates = sample aggregates x the integer factor 5
    (`_sample_factor`), reported NEXT TO the exact values with an
    integer-ppm error — the honest accuracy card for a dashboard that
    trades 5x less scan for approximate counts.

    Scale shape: the sample filter is a map-side hash predicate the
    scan applies before any shuffle (at 100 TB with data CLUSTERED by
    the sample key this is a physical 5x read reduction; here it prunes
    rows, not files — the clustering note is the honest gap); one
    grouped aggregate over the event-type domain."""
    from ..functions.hashing import stable_hash64

    ev = load_table(spark, sf_dir, "events")
    in_sample = (
        F.pmod(stable_hash64(F.col("user_id").cast("string")), F.lit(5)) == 0
    )
    micros = F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
    per = ev.groupBy("event_type").agg(
        F.sum(F.when(in_sample, 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.sum(F.when(in_sample, micros).otherwise(0))
        .cast("long")
        .alias("rev_sampled_micros"),
        F.count("*").cast("long").alias("n_exact"),
        F.sum(micros).cast("long").alias("rev_exact_micros"),
    )
    est_n = (F.col("n_sampled") * 5).cast("long")
    est_rev = (F.col("rev_sampled_micros") * 5).cast("long")
    return per.select(
        "event_type",
        "n_sampled",
        est_n.alias("est_n_events"),
        "n_exact",
        est_rev.alias("est_revenue_micros"),
        "rev_exact_micros",
        F.expr(
            "CAST(abs(n_sampled * 5 - n_exact) * 1000000 div n_exact AS BIGINT)"
        ).alias("count_err_ppm"),
    )
