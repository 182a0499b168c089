"""Relational breadth on the driver star schema (SURVEY.md §2.4/§2.5/§7-M3).

The reference has **no joins** (dimensions are denormalized at generation,
/root/reference/producers/sales_producer.py:118-133) and no window/set ops;
these operators give the engine the general relational surface a user would
expect, expressed so Catalyst picks the right physical plan:

- Dimension joins (`region`/`nation`/`supplier`/`part`, and `customer` at
  small SF) sit under Spark's broadcast threshold -> BroadcastHashJoin, no
  shuffle of the fact table.  ``F.broadcast`` hints are added where the
  dimension is guaranteed small even at 100 TB (region: 5 rows, nation: 25).
- Fact-fact joins (orders |x| lineitem) shuffle on the join key once; the
  grouped aggregates that follow reuse that partitioning where possible.
- All money sums go through ``dsum`` (decimal-exact, order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import davg, dsum
from ..sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (scan -> filter -> agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 open orders by pending revenue.

    customer (filtered segment) -> broadcast into orders; orders |x| lineitem
    is the only large shuffle.  TakeOrderedAndProject caps the result.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where supplier and customer share the
    nation; 6-way join with all dimensions broadcast."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-aggregate — every predicate pushes
    to the parquet scan, the aggregate is a single scalar (the cheapest
    possible shape at 100 TB: no shuffle of data, only of partials)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returns per customer — filtered
    fact-fact join + broadcast dims + top-k."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promotion revenue share — conditional aggregation
    over a lineitem |x| part join.  No broadcast hint on part: it scales
    with the corpus, so the join strategy is AQE's call."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * dsum(promo) / dsum(disc_price), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: customers behind large-volume orders — aggregate
    HAVING as a pre-join reducer (the order-level quantity rollup shrinks
    lineitem BEFORE any join touches it), then broadcast dims + top-k."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q19_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: disjunction of conjunctive brackets as the join
    predicate (equi-key + complex residual) — exercises OR-of-ANDs residual
    filtering on an equi-join."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: histogram of customers by order count — LEFT OUTER
    join so zero-order customers keep a 0 bucket, then a second aggregation
    over the first (two cheap shuffles on shrinking data)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(
        F.count("*").alias("n_customers")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from small-quantity orders of each part —
    the correlated scalar subquery (per-part avg quantity) decorrelated into
    an aggregate + self-join, which is exactly what Catalyst's subquery
    rewrite produces; expressed directly so the plan is explicit."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.avg_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 6).alias("avg_yearly")
        )
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average balance and no orders
    since the recency cutoff — scalar aggregate subquery (global avg as a
    cross-joined 1-row frame, broadcast) + anti join.  The recency window
    (vs. Q22's "no orders ever", empty on this fixture) keeps the result
    non-empty and falsifiable at every scale factor; the date predicate
    pushes down to the orders scan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(ANTI_JOIN_RECENCY_CUTOFF).cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal").alias("total_balance"),
    )


def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check, adapted to this schema (no
    commit/receipt dates): orders in a quarter having at least one lineitem
    shipped > 30 days after the order date.  The EXISTS subquery is a
    correlated left-semi join with a non-equi conjunct — Catalyst keeps
    the equi part (orderkey) as the join key and evaluates the date
    predicate as join condition, so it stays one shuffle on orderkey."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping between two nations, both directions,
    by ship year.  nation is 25 rows — broadcast twice (supplier side and
    customer side); the only large shuffles are lineitem|x|orders and the
    customer join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: the fraction of ASIA-market ECONOMY-part
    revenue supplied by NATION_3, per order year.  Conditional aggregation
    over one joined frame — numerator and denominator in a single pass
    (no self-join, no second scan); part/supplier/nation/region broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    target = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (dsum(target) / dsum(volume)).alias("share_raw"),
            dsum(volume).alias("total_volume"),
        )
        .select(
            "order_year",
            F.round(F.col("share_raw"), 6).alias("mkt_share"),
            "total_volume",
        )
    )


def market_segment_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders |x| customer grouped by market segment (broadcast dim join)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_count"),
            dsum("o_totalprice").alias("total_revenue"),
            davg("o_totalprice").alias("avg_order_value"),
        )
    )


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that placed at least one order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ANTI_JOIN_RECENCY_CUTOFF = "1999-01-01"


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders since the recency cutoff.

    The date predicate sits on the ANTI side before the join — it pushes
    down to the orders scan (partition/row-group pruning at scale) and,
    unlike an unfiltered "no orders ever" (empty on this fixture, where
    every customer has at least one order), yields a non-empty,
    falsifiable result at every scale factor."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(ANTI_JOIN_RECENCY_CUTOFF).cast("timestamp")
    )
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by order revenue (agg -> broadcast dim join -> top-k)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("order_count"), dsum("o_totalprice").alias("revenue")
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "order_count", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def distinct_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation through a join: distinct ordering customers per
    nation (orders -> customer -> nation, dims broadcast)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count("*").alias("order_count"),
        )
    )


def repeat_customers_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers active in 1996 INTERSECT active in 1997."""
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97).select(F.col("o_custkey").alias("custkey"))


def one_year_only_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers active in 1996 EXCEPT active in 1997."""
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.distinct().exceptAll(y97.distinct()).select(F.col("o_custkey").alias("custkey"))


def priority_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping set over (priority, status) — multi-level totals in one
    pass (Spark expands to a single Expand + hash-agg, no re-scan)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("order_count"), dsum("o_totalprice").alias("total_revenue"))
    )


def status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-style): per priority, order counts by
    status as columns — sum(CASE WHEN ...) pattern."""
    orders = load_table(spark, sf_dir, "orders")
    cnt = lambda s: F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"cnt_{s.lower()}")
    return orders.groupBy("o_orderpriority").agg(cnt("O"), cnt("F"), cnt("P"))


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth: string manipulation + math over part."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            F.col("p_partkey"),
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.substring(F.col("p_type"), 1, 6).alias("type_prefix"),
            F.length(F.col("p_name")).cast("long").alias("name_len"),
            F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_sqrt"),
            F.round(F.log(F.col("p_retailprice") + 1), 6).alias("log_price"),
            (F.col("p_size") % 5).alias("size_mod5"),
        )
    )


def customer_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function breadth #2 (beyond part_type_stats): case
    mapping, padding, translate, reverse, split-index, edit distance,
    multi-arg concat — all engine built-ins, map-only."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.initcap(F.lower("c_name")).alias("name_initcap"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.translate("c_name", "#", "-").alias("name_translated"),
        F.reverse(F.col("c_name")).alias("name_reversed"),
        F.split("c_name", "#").getItem(1).alias("name_number"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long").alias("seg_edit_dist"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


def order_date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar datetime-function breadth: calendar fields, month boundaries,
    date arithmetic — the date dimension a BI layer derives on the fly."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.to_date(d).alias("order_date"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.quarter(d).cast("long").alias("quarter"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 2).alias("plus_two_months"),
        F.date_add(d, 30).alias("plus_30_days"),
        F.trunc(d, "month").alias("month_start"),
    )


def price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: parts bucketed into literal price bands — the
    small side broadcasts, so the range predicate evaluates map-side (a
    BroadcastNestedLoopJoin at worst, never a shuffled cross join)."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1500.0), ("premium", 1500.0, 10_000_000.0)],
        ["band", "lo", "hi"],
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            davg("p_retailprice").alias("avg_price"),
        )
    )


def priority_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping set over (priority, status): all 4 grouping levels in
    one Expand + single aggregation pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("order_count"), dsum("o_totalprice").alias("total_revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H analogs q2/q9/q11/q12/q15/q16/q20/q21, adapted to the fixture star
# schema (no partsupp table, no commit/receipt dates): "supply cost" is the
# minimum observed unit price in lineitem, "lateness" is shipdate lagging
# orderdate.  Shapes preserved: decorrelated min-subqueries, nested
# aggregates, EXISTS/NOT EXISTS double correlation, conditional aggregation.


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier.  Supply cost per (part,
    supplier) is the minimum unit price observed in lineitem among EUROPE
    suppliers; the correlated MIN subquery is decorrelated into a per-part
    aggregate joined back on equality (exact: min of IEEE divisions is
    deterministic on both engines).

    Scale shape: lineitem shuffles ONCE on (partkey, suppkey); every later
    frame is aggregate-shrunk (|parts| rows) and the dimension joins are
    broadcast.  supplier x nation x region prunes to the EUROPE subset
    before touching the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (cost.l_partkey == min_cost.mc_partkey) & (cost.cost == min_cost.min_cost),
        )
        .join(part, cost.l_partkey == part.p_partkey)
        .join(F.broadcast(eu_supp), cost.l_suppkey == eu_supp.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit by supplier nation and order year for 'red'
    parts.  Cost proxy (no partsupp): 60% of the part's retail price per
    unit.  One joined frame, one aggregation — part/supplier/nation all
    broadcast, the only large shuffle is lineitem |x| orders."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock: per-part value (price x quantity)
    from NATION_1 suppliers, kept when above 0.1% of the nation's total —
    the global-total scalar subquery broadcast into the HAVING filter.

    Both the per-part values and the total go through the decimal-exact
    dsum, so the threshold comparison is bit-identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    n1_rows = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
    )
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = n1_rows.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum(value).alias("part_value")
    )
    total = n1_rows.agg(dsum(value).alias("nation_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("nation_total") * 0.001)
        .select("partkey", "part_value")
    )


def q12_ship_channel_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style shipping-channel priority check.  The fixture has no
    l_shipmode, so the channel is derived from the ship lag (days between
    order and ship date): <=7 FAST, <=30 REGULAR, else SLOW.  Conditional
    aggregation splits urgent (1-URGENT/2-HIGH) from other priorities —
    one fact-fact shuffle, one aggregation over 3 groups."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    channel = (
        F.when(lag <= 7, "FAST").when(lag <= 30, "REGULAR").otherwise("SLOW")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(channel.alias("ship_channel"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: revenue per supplier over 1997Q1, then
    the supplier(s) matching the maximum — the view + scalar-subquery pair
    decorrelated into agg -> broadcast max -> equality filter (exact:
    dsum revenues are decimal-identical, so float equality is safe)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("rev_suppkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("rev_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier counts per part attribute.  The
    part-supplier relation is the distinct (partkey, suppkey) projection of
    lineitem; suppliers in deficit (negative balance) are excluded by
    anti-join (the complaint-comment filter analog); Brand#1 / PROMO parts
    excluded; count(DISTINCT suppkey) per (brand, type, size)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 23, 25, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style promotion-part suppliers: suppliers that shipped
    more than half of their all-time volume of a 'red' part during 1997
    (and at least 50 units lifetime) — the nested correlated aggregate
    computed as ONE grouped pass (conditional sum for the year slice),
    then a semi-join back to supplier.

    Scale shape: single shuffle on (suppkey, partkey); the filter runs on
    the aggregate (|pairs| rows), and supplier receives a semi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    supp = load_table(spark, sf_dir, "supplier")
    in_1997 = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            dsum("l_quantity").alias("qty_all"),
            dsum(F.when(in_1997, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty_1997"),
        )
    )
    hot = per_pair.filter(
        (F.col("qty_1997") > 0.5 * F.col("qty_all")) & (F.col("qty_all") >= 50)
    )
    return (
        supp.join(hot, supp.s_suppkey == hot.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting: in finished
    multi-supplier orders, the supplier whose shipment was late (> 60 days
    after the order date) while every OTHER supplier shipped on time.

    The double correlated EXISTS / NOT EXISTS is decorrelated into one
    per-order aggregate — n_supps and n_late_supps via two countDistincts
    in a single pass — joined to the distinct late (order, supplier)
    pairs.  Two shuffles total (orderkey, then suppkey), no self-joins of
    the fact table."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = joined.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supps"),
    )
    late_pairs = (
        joined.filter(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    )
    return (
        late_pairs.join(per_order, late_pairs.l_orderkey == per_order.po_orderkey)
        .filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
        .join(F.broadcast(supp), late_pairs.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


FUZZY_MAX_EDITS = 2
FUZZY_SNM_WINDOW = 10


def similar_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching on customer names via the sorted-neighborhood
    method (Hernandez & Stolfo 1995): within each (nation, name-length)
    block, names sort lexicographically and only pairs within
    FUZZY_SNM_WINDOW ranks of each other are compared — candidate count is
    n * w, not the block's n²/2 (the all-pairs variant measured 6x the
    runtime at sf0.1 for identical matches on this fixture).  Matches are
    Levenshtein distance <= FUZZY_MAX_EDITS; edit distance is an exact
    integer (unit costs), so Spark's JVM ``levenshtein`` and DuckDB's
    agree on every candidate — no tolerance.  Like every banded/blocked
    linkage, recall is bounded by the window; the oracle mirrors the same
    window so the contract is exact.

    Scale shape: one rank window per block + a rank-EQUI self-join (the
    a-side fans out to its w successor ranks, so the rank is part of the
    hashable join key — candidate count is exactly n * w however large a
    block grows, never a within-block cross product; the r8 fix that
    also de-quadraticized customer_blocking_linkage).  Both shuffles
    carry (key, name, rank) triples only."""
    from pyspark.sql import Window as _W

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name", F.length("c_name").alias("ln")
    )
    w = _W.partitionBy("c_nationkey", "ln").orderBy("c_name", "c_custkey")
    ranked = cust.withColumn("rn", F.row_number().over(w))
    # row_number ranks are dense, so equi-joining on (block, rn_a+offset)
    # IS the "0 < rn_b - rn_a <= w" range filter.
    a = ranked.select(
        F.col("c_custkey").alias("cust_a"), F.col("c_name").alias("name_a"),
        "c_nationkey", "ln",
        F.explode(
            F.sequence(F.col("rn") + F.lit(1), F.col("rn") + F.lit(FUZZY_SNM_WINDOW))
        ).alias("rn"),
    )
    b = ranked.select(
        F.col("c_custkey").alias("cust_b"), F.col("c_name").alias("name_b"),
        "c_nationkey", "ln", "rn",
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, ["c_nationkey", "ln", "rn"])
        .select(
            F.least("cust_a", "cust_b").alias("cust_a"),
            F.greatest("cust_a", "cust_b").alias("cust_b"),
            dist.cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= FUZZY_MAX_EDITS)
    )


def brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order baskets: for every
    pair of part BRANDS bought in the same order, co-occurrence count and
    lift = (co/N) / ((n_a/N)(n_b/N)) = co*N / (n_a*n_b) — the association
    statistic behind recommendation rules.  All counts are exact
    integers; the lift is integer products under one correctly-rounded
    IEEE division, so cross-engine equality is exact.

    Scale shape: the brand dimension broadcasts into the basket build;
    the pair explosion is a map-side HOF over each order's sorted brand
    array — bounded by basket size (distinct brands per order), never
    corpus²; the pair aggregate's key space is brands², a constant.  One
    orderkey shuffle total, then brands-/brands²-keyed aggregates."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ONE orderkey shuffle builds the basket arrays (collect_set dedups, so
    # no separate distinct); the pair "explosion" is a map-side HOF over the
    # sorted array — basket-bounded, never a self-join.  cache(): three
    # consumers (totals, brand_n, co) read the arrays.
    baskets = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
        .cache()
    )
    totals = baskets.agg(F.count("*").alias("n_orders"))
    brand_n = (
        baskets.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_brand"))
    )
    # All ordered in-basket pairs (array is sorted, so x < y by slice):
    # brands² keys land in the aggregate, partial-combined map-side.
    pairs = F.expr(
        "flatten(transform(brands, (x, i) ->"
        " transform(slice(brands, i + 2, size(brands)),"
        " y -> struct(x AS brand_a, y AS brand_b))))"
    )
    co = (
        baskets.select(F.explode(pairs).alias("p"))
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("n_co"))
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("n_a"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("n_b"))
    lift = (
        F.col("n_co").cast("double") * F.col("n_orders").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        co.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .join(F.broadcast(totals))
        .select(
            "brand_a", "brand_b", "n_co",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(lift, 6).alias("lift"),
        )
    )


def priority_status_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the asymmetric multi-level aggregate that
    neither ROLLUP nor CUBE expresses: per-priority totals, per-status
    totals, and the grand total in ONE pass (a single Expand + hash
    aggregate, no re-scan per set).  ``grouping_id`` disambiguates which
    set a row belongs to (a NULL key could otherwise be a real NULL).

    Spark's DataFrame API stops at rollup/cube, so this goes through the
    SQL surface — exactly how a reference user would write it."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_for_gsets")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT)
                 AS grouping_level,
               count(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                 AS total_revenue
        FROM orders_for_gsets
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


def order_event_days_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the TPC-H analogs never need):
    the order-activity calendar against the event-activity calendar, with
    per-side counts and presence flags — the coverage-gap report shape.
    Both sides are day-grained aggregates first, so the join input is
    O(days) per side and the full-outer shuffle is calendar-bounded."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    od = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    ed = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    return (
        od.join(ed, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("n_orders").isNotNull().alias("has_orders"),
            F.col("n_events").isNotNull().alias("has_events"),
        )
    )


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-stream apply (Delta ``MERGE WHEN MATCHED DELETE`` /
    Debezium snapshot+apply): fold an ordered I/U/D change log down to the
    live table state — highest sequence number wins per key, and a final
    'D' removes the key entirely.  This completes the merge-semantics
    family: Replacing covers upsert, Collapsing covers sign-cancel; CDC
    adds tombstone deletes driven by an explicit op column.

    The change log derives deterministically from ``orders`` (the
    engine-portable md5 split, same discipline as the ack stream): seq 0
    inserts every order, seq 1 doubles the price of the hash%10==0 keys,
    seq 2 deletes the hash%10==1 keys.  So the expected state is
    falsifiable in all three directions — missed updates, missed deletes,
    and resurrection of deleted keys all hash-mismatch.

    Scale shape: one hash aggregate keyed on order_id — ``max_by`` folds
    (seq, op) and (seq, price) map-side, so the shuffle carries one
    partial row per key per partition; the delete filter is post-agg and
    costless.  At 100 TB this is the standard log-compaction shape."""
    from ..functions.hashing import stable_hash64

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("price"),
    )
    bucket = F.pmod(stable_hash64(F.col("order_id").cast("string")), F.lit(10))
    inserts = orders.select(
        "order_id", F.lit(0).alias("seq"), F.lit("I").alias("op"), "price"
    )
    updates = orders.filter(bucket == 0).select(
        "order_id", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        (F.col("price") * 2).alias("price"),  # *2 is exact on doubles
    )
    deletes = orders.filter(bucket == 1).select(
        "order_id", F.lit(2).alias("seq"), F.lit("D").alias("op"),
        F.lit(0.0).alias("price"),
    )
    changes = inserts.unionByName(updates).unionByName(deletes)
    folded = changes.groupBy("order_id").agg(
        F.max_by("op", "seq").alias("final_op"),
        F.max_by("price", "seq").alias("final_price"),
        F.max("seq").cast("long").alias("last_seq"),
    )
    return folded.filter(F.col("final_op") != "D").select(
        "order_id", "final_op", "final_price", "last_seq"
    )


def recursive_decay_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4.1 SQL surface, NEW r6): per-priority revenue
    folded through an exponential-decay ladder — each step halves the
    amount until it drops below 1 — the loan-amortization/decay-schedule
    shape that needs actual recursion (data-dependent depth), not a
    static sequence() axis.

    Semantics notes: Spark recursion supports UNION ALL (not UNION), so
    the ladder is a DAG walk with a monotone termination predicate —
    depth = log2(starting amount) ≈ 31 at sf0.1, far under the
    spark.sql.cteRecursionLevelLimit default of 100; halving a double is
    an exact exponent decrement on BOTH engines, so every rung is
    bit-identical to DuckDB's."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_for_ladder")
    return spark.sql(
        """
        WITH RECURSIVE ladder(priority, step, amount) AS (
          SELECT o_orderpriority AS priority,
                 CAST(0 AS BIGINT) AS step,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                   AS amount
          FROM orders_for_ladder GROUP BY 1
          UNION ALL
          SELECT priority, step + 1, amount / 2 FROM ladder
          WHERE amount >= 2.0
        )
        SELECT priority, step, amount FROM ladder
        """
    )


def lateral_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL surface, NEW r6): for each nation,
    the top customer by account balance — the top-1-per-group shape
    expressed as the optimizer-visible LATERAL form instead of a window
    scan (Catalyst rewrites it to a rank-style aggregate; at scale the
    per-group LIMIT bounds the join output at |nations| rows)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_for_lat")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_for_lat")
    return spark.sql(
        """
        SELECT n.n_name AS nation, t.c_name AS top_customer,
               t.c_acctbal AS acctbal
        FROM nation_for_lat n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer_for_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 1
        ) t
        """
    )


def scd2_change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic CDC change stream shared by the SCD2 family
    (derive-on-read ``cdc_scd2_history``, the stored-history merge, and
    ``scd2_asof_lookup``): I for every order at seq 0, U (doubled price)
    for hash%10==0 at seq 1, D for hash%10==1 at seq 2."""
    from ..functions.hashing import stable_hash64

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("price"),
    )
    bucket = F.pmod(stable_hash64(F.col("order_id").cast("string")), F.lit(10))
    inserts = orders.select(
        "order_id", F.lit(0).alias("seq"), F.lit("I").alias("op"), "price"
    )
    updates = orders.filter(bucket == 0).select(
        "order_id", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        (F.col("price") * 2).alias("price"),
    )
    deletes = orders.filter(bucket == 1).select(
        "order_id", F.lit(2).alias("seq"), F.lit("D").alias("op"),
        F.lit(0.0).alias("price"),
    )
    return inserts.unionByName(updates).unionByName(deletes)


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 history materialization from the same deterministic CDC
    change log ``cdc_apply`` compacts (I all / U hash%10==0 / D
    hash%10==1): instead of folding to live state, every insert/update
    becomes a VERSION ROW with a validity interval — valid_from_seq =
    the change's sequence, valid_to_seq = the key's next change (NULL
    while current), is_current = interval still open.  A delete emits no
    row; it only CLOSES the previous version's interval — which is how
    the warehouse answers "what did this order cost when?" after the key
    is gone (the dimension-history modeling Kimball calls type 2, and
    what Delta's CDF consumers materialize downstream).

    One window per key (lead over seq) — the log-compaction shuffle of
    cdc_apply with the aggregate swapped for a lead(); at 100 TB both
    shuffle the change log once, keyed identically."""
    from pyspark.sql import Window as _W

    changes = scd2_change_log(spark, sf_dir)
    w = _W.partitionBy("order_id").orderBy(F.col("seq").asc())
    return (
        changes.withColumn("next_seq", F.lead("seq").over(w))
        .filter(F.col("op") != "D")
        .select(
            "order_id",
            "price",
            F.col("seq").cast("long").alias("valid_from_seq"),
            F.col("next_seq").cast("long").alias("valid_to_seq"),
            F.col("next_seq").isNull().alias("is_current"),
        )
    )


def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) probe JOIN over the SCD2 history: each key
    is probed at its own deterministic time t = hash(key) % 3, and the
    interval join ``valid_from <= t < coalesce(valid_to, inf)`` returns
    the version that was current THEN — "what did this order cost when?"
    answered from versioned storage.  Keys probed after their delete fall
    in no interval and drop out (the inner join makes resurrection
    falsifiable); keys probed at t=1+ see the doubled update price.

    Scale shape: the history and probe sides shuffle once on the key and
    the interval predicate evaluates inside the joined row (a per-key
    history is a handful of versions, so this is an equi-join with a
    residual range filter — never a range-only join)."""
    from ..functions.hashing import stable_hash64

    hist = cdc_scd2_history(spark, sf_dir)
    probes = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.pmod(
            stable_hash64(F.col("o_orderkey").cast("string")), F.lit(3)
        ).cast("long").alias("t"),
    )
    return (
        probes.join(hist, "order_id")
        .filter(
            (F.col("valid_from_seq") <= F.col("t"))
            & (F.col("valid_to_seq").isNull() | (F.col("t") < F.col("valid_to_seq")))
        )
        .select("order_id", "t", F.col("price").alias("price_at_t"))
    )


def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-style join cardinality estimation, checked against the
    truth: the Selinger formula |R ⨝ S| ≈ |R|·|S| / max(ndv_R(k),
    ndv_S(k)) for orders ⨝ lineitem on orderkey, next to the ACTUAL join
    count and the relative error — the estimate every cost-based planner
    (and AQE's stats) lives on, surfaced as a queryable report so a
    deployment can see where its stats mislead the planner.

    All inputs are exact aggregates (counts + exact NDV, one scalar row
    each); the estimate is integer floor, the error one rounded IEEE
    divide — bit-stable cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    r = orders.agg(
        F.count("*").alias("n_r"),
        F.countDistinct("o_orderkey").alias("ndv_r"),
    )
    s = lineitem.agg(
        F.count("*").alias("n_s"),
        F.countDistinct("l_orderkey").alias("ndv_s"),
    )
    actual = (
        orders.select("o_orderkey")
        .join(lineitem.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey")
        .agg(F.count("*").alias("actual_rows"))
    )
    est = F.floor(
        F.col("n_r").cast("double")
        * F.col("n_s").cast("double")
        / F.greatest(F.col("ndv_r"), F.col("ndv_s")).cast("double")
    ).cast("long")
    return (
        r.crossJoin(s)
        .crossJoin(actual)
        .select(
            F.col("n_r").cast("long").alias("n_orders"),
            F.col("n_s").cast("long").alias("n_lineitem"),
            F.col("ndv_r").cast("long").alias("ndv_orders_key"),
            F.col("ndv_s").cast("long").alias("ndv_lineitem_key"),
            est.alias("estimated_rows"),
            F.col("actual_rows").cast("long").alias("actual_rows"),
            F.round(
                F.abs(est.cast("double") - F.col("actual_rows").cast("double"))
                / F.col("actual_rows").cast("double"),
                6,
            ).alias("rel_error"),
        )
    )


ER_EDIT_MAX = 2  # max Levenshtein distance for a candidate match
ER_SNM_WINDOW = 10  # sorted-neighborhood rank window within each block


def customer_blocking_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate generation: BLOCKING on (nation,
    market segment) composed with SORTED-NEIGHBORHOOD inside each block
    (Hernandez & Stolfo 1995).  Rows rank by (name, custkey) within
    their block and only pairs within ER_SNM_WINDOW ranks compare; a
    pair is a candidate match when the Levenshtein distance between the
    names is <= ER_EDIT_MAX.  The r7 variant compared ALL pairs within
    a block, but (nation, segment) has CONSTANT cardinality (~125
    blocks regardless of corpus size), so within-block work grew
    O(n^2) with the table.  The neighborhood window restores a scaling
    bound: candidate count is exactly n * w however large blocks grow,
    because the rank JOINS as an equi-key — each row explodes to its w
    successor ranks and matches by (block, rn) equality, so the
    executor never forms a within-block cross product (pinned in
    tests/test_plans.py).  Like every banded/blocked linkage, recall is
    bounded by the window; the oracle mirrors the same window so the
    contract is exact.

    Levenshtein is the classic DP distance in both engines (Spark
    `levenshtein`, DuckDB `levenshtein`), so the oracle is value-exact.
    Reference analog: the dimension-cleanup half of dedupe before the
    per-category rollups of /root/reference/clickhouse/init/01_init.sql
    (the reference assumes clean keys; this produces them)."""
    from pyspark.sql import Window as _W

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    w = _W.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "c_name", "c_custkey"
    )
    ranked = c.withColumn("rn", F.row_number().over(w))
    # a-side fans out to its w successor ranks; row_number ranks are
    # dense, so (block, rn) equality IS the "0 < rn_b - rn_a <= w"
    # range — but as a hashable equi-key, never a per-block loop.
    a = ranked.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        "c_nationkey",
        "c_mktsegment",
        F.explode(
            F.sequence(F.col("rn") + F.lit(1), F.col("rn") + F.lit(ER_SNM_WINDOW))
        ).alias("rn"),
    )
    b = ranked.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        "c_nationkey",
        "c_mktsegment",
        "rn",
    )
    return (
        a.join(b, ["c_nationkey", "c_mktsegment", "rn"])
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long"),
        )
        .filter(F.col("edit_distance") <= ER_EDIT_MAX)
        .select(
            F.least("custkey_a", "custkey_b").alias("custkey_a"),
            F.greatest("custkey_a", "custkey_b").alias("custkey_b"),
            "c_nationkey",
            "edit_distance",
        )
    )


def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Great-Expectations-style trust
    card a pipeline gates ingestion on — the reference trusts its
    producer blindly; a 100 TB lake cannot): one row per expectation
    with checked/violation counts and the pass flag.  Null checks, range
    checks, uniqueness, and the two referential-integrity edges
    (orders -> customer, lineitem -> orders).

    Shape: ONE aggregate pass per fact table computes all its in-row
    checks map-side (count + conditional sums, no shuffle beyond the
    1-row agg); uniqueness rides countDistinct; the two FK edges are
    anti-join counts against broadcastable key sets (at 100 TB the FK
    probe becomes a shuffle anti-join — the expression is the same).
    All counts are exact integers."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "null_keys"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpos_price"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01"))
                | (F.col("o_orderdate") > F.lit("2005-12-31")),
                1,
            ).otherwise(0)
        ).alias("date_oob"),
        # deliberately-tight freshness SLA that the fixture VIOLATES
        # (orders run to 1998-08): keeps the failing branch falsifiable —
        # a report that can only ever say "passed" proves nothing
        F.sum(
            F.when(F.col("o_orderdate") > F.lit("1997-12-31"), 1).otherwise(0)
        ).alias("stale_sla"),
        F.countDistinct("o_orderkey").alias("n_distinct_keys"),
    ).collect()[0]
    c_dup = cust.agg(
        F.count("*").alias("n"), F.countDistinct("c_custkey").alias("nd")
    ).collect()[0]
    l_qty = li.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(~F.col("l_quantity").between(1, 50), 1).otherwise(0)
        ).alias("qty_oob"),
    ).collect()[0]
    fk_cust = (
        orders.select("o_custkey")
        .join(cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti")
        .count()
    )
    fk_ord = (
        li.select(F.col("l_orderkey").alias("k"))
        .join(orders.select(F.col("o_orderkey").alias("k")), "k", "left_anti")
        .count()
    )
    rows = [
        ("orders.o_orderkey not_null", int(o["n"]), int(o["null_keys"])),
        ("orders.o_totalprice positive", int(o["n"]), int(o["nonpos_price"])),
        ("orders.o_orderdate in_range", int(o["n"]), int(o["date_oob"])),
        ("orders.o_orderdate sla_1997", int(o["n"]), int(o["stale_sla"])),
        (
            "orders.o_orderkey unique",
            int(o["n"]),
            int(o["n"]) - int(o["n_distinct_keys"]),
        ),
        (
            "customer.c_custkey unique",
            int(c_dup["n"]),
            int(c_dup["n"]) - int(c_dup["nd"]),
        ),
        ("lineitem.l_quantity in_1_50", int(l_qty["n"]), int(l_qty["qty_oob"])),
        ("orders.o_custkey fk_customer", int(o["n"]), int(fk_cust)),
        ("lineitem.l_orderkey fk_orders", int(l_qty["n"]), int(fk_ord)),
    ]
    return spark.createDataFrame(
        [(n, c, v, v == 0) for n, c, v in rows],
        "check_name string, n_checked long, n_violations long, passed boolean",
    )


def paste_join_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``PASTE JOIN`` analog (NEW r11): positional join of two
    independently ordered result sets — row i of the left pasted next to
    row i of the right.  ClickHouse pastes in block order (documented as
    non-deterministic under concurrency); the reproducible equivalent is
    an EXPLICIT total order on each side, which is also the only form a
    distributed engine can honor.  The card it serves here is the Q-Q
    alignment every pricing audit draws: the i-th largest order total
    next to the i-th largest single-line gross price, top 100 positions.

    Spark shape: each side is a TakeOrderedAndProject (top-k, never a
    global sort of the table), then a row_number over the 100-row result
    (single-partition window over k rows — bounded by construction) and
    an equi-join on the position.  At 100 TB both sides stay top-k
    selections; the paste itself touches 2k rows.

    The reference's engine would express this as
    ``SELECT ... PASTE JOIN ...`` over two ORDER BY subqueries; no
    reference query uses it (no joins at all there — see module
    docstring), so this is general-surface parity."""
    from pyspark.sql import Window as _W

    k = 100
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Money ships as EXACT INTEGER MICROS (r12 no-decimal-output gate
    # rule — a pure CAST(x AS DECIMAL) value carry split the r11 gate);
    # micros ordering equals price ordering (monotone bijection), so the
    # top-k and the positional windows are unchanged semantically.
    o_micros = (
        F.col("o_totalprice").cast("decimal(25,6)") * F.lit(1000000)
    ).cast("long")
    l_micros = (
        F.col("l_extendedprice").cast("decimal(25,6)") * F.lit(1000000)
    ).cast("long")
    o_top = orders.orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    ).limit(k).select(
        o_micros.alias("order_total_micros"),
        "o_orderkey",
    )
    l_top = li.orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ).limit(k).select(
        l_micros.alias("line_price_micros"),
        "l_orderkey",
        "l_linenumber",
    )
    # the positional window repeats the FULL tiebreak — price ties must
    # land on the same pos in any partitioning
    ow = _W.orderBy(F.desc("order_total_micros"), F.asc("o_orderkey"))
    lw = _W.orderBy(
        F.desc("line_price_micros"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    left = o_top.select(
        "order_total_micros", F.row_number().over(ow).cast("long").alias("pos")
    )
    right = l_top.select(
        "line_price_micros", F.row_number().over(lw).cast("long").alias("pos")
    )
    return left.join(right, "pos").select(
        "pos",
        "order_total_micros",
        "line_price_micros",
        (F.col("order_total_micros") - F.col("line_price_micros")).alias(
            "total_minus_line_micros"
        ),
    )


def any_join_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LEFT ANY JOIN`` analog (NEW r11): join strictness
    ANY keeps AT MOST ONE right-side row per key — ClickHouse grabs
    whichever match it meets first (block-order dependent); the
    reproducible equivalent is the explicit min-tiebreak first match,
    the only definition a shuffle-partitioned engine can promise.

    Card: for every order of 1997-03, its FIRST RETURNED line
    (l_returnflag = 'R', earliest (l_shipdate, l_linenumber)) — orders
    with no returned line survive with NULLs (the LEFT half of the
    strictness; both branches fire on the fixture, pytest-pinned).

    Spark shape: the right side reduces to one row per key with a
    row_number over (key | shipdate, linenumber) BEFORE the join — the
    dedup shuffle is on the join key, so the join itself never sees a
    multi-match explosion; the bounded left month then joins in one
    exchange (AQE converts to broadcast when the month is small).  At
    100 TB the window and the join share the l_orderkey partitioning."""
    from pyspark.sql import Window as _W

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    w = _W.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    first_ret = (
        returned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("l_shipdate").alias("first_ret_shipdate"),
            F.col("l_linenumber").cast("long").alias("first_ret_linenumber"),
            # exact integer micros (r12 no-decimal-output gate rule)
            (F.col("l_extendedprice").cast("decimal(25,6)") * F.lit(1000000))
            .cast("long")
            .alias("first_ret_price_micros"),
        )
    )
    return orders.join(first_ret, "o_orderkey", "left").select(
        "o_orderkey",
        "o_orderstatus",
        "first_ret_shipdate",
        "first_ret_linenumber",
        "first_ret_price_micros",
        F.col("first_ret_linenumber").isNotNull().alias("has_return"),
    )


def schema_introspection_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.columns`` / information_schema analog (NEW r11) — the
    catalog card next to ``table_parts_report``: every fixture table's
    columns with their engine-NEUTRAL type class (integer / float /
    string / timestamp / date / array), the form a cross-engine catalog
    must expose (raw type names differ: Spark ``bigint`` vs DuckDB
    ``BIGINT``, and the events fixture has drifted between parquet
    TIMESTAMP(NANOS) and timestamp[us] across driver generations — the
    class column is stable under both, the raw name is not).

    Metadata-only: schemas come from the loaders (parquet footers), no
    data job; the oracle reads DuckDB's information_schema over the
    same registered views with the mirrored class mapping."""
    from ..schemas import TESTDATA_TABLES

    def _cls(dt: str) -> str:
        if dt in ("bigint", "int", "smallint", "tinyint"):
            return "integer"
        if dt in ("double", "float"):
            return "float"
        if dt == "string":
            return "string"
        if dt.startswith("timestamp"):
            return "timestamp"
        if dt == "date":
            return "date"
        if dt.startswith("array"):
            return "array"
        return dt

    rows = [
        (t, f.name, _cls(f.dataType.simpleString()))
        for t in TESTDATA_TABLES
        for f in load_table(spark, sf_dir, t).schema.fields
    ]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, type_class string"
    )


def limit_by_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT n OFFSET m BY col`` analog (NEW r11): per-group
    pagination — for every order priority, SKIP the top-2 orders by
    total price and keep the NEXT 3 (the "page 2 of each section"
    query; distinct from plain per-group top-k, which the engine has
    had since r4).  Total order via the (price desc, orderkey)
    tiebreak so the page boundary is deterministic in any engine.

    Scale shape: one rank window partitioned on the 5-value priority
    domain — the standard per-group selection exchange; a skewed group
    would switch to the salted two-phase shape
    (``top_orders_per_priority_salted``)."""
    from pyspark.sql import Window as _W

    orders = load_table(spark, sf_dir, "orders")
    w = _W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("pos_in_group", F.row_number().over(w).cast("long"))
        .filter((F.col("pos_in_group") >= 3) & (F.col("pos_in_group") <= 5))
        .select(
            "o_orderpriority",
            "pos_in_group",
            "o_orderkey",
            # exact integer micros (r12 no-decimal-output gate rule)
            (F.col("o_totalprice").cast("decimal(25,6)") * F.lit(1000000))
            .cast("long")
            .alias("order_total_micros"),
        )
    )


def dict_get_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse external-DICTIONARY battery — dictGet / dictGetOrDefault
    / dictHas / dictGetHierarchy / dictIsIn over a hierarchical
    geography dictionary (NEW r14; no prior coverage of the dictionary
    feature family, a flagship ClickHouse enrichment path).

    Dictionary model (the flat/hashed layout): node ids in ONE space —
    nations keep ``n_nationkey`` (0-24), regions live at
    ``100 + r_regionkey``; ``parent(nation) = 100 + its region``,
    regions are roots.  A deliberately PARTIAL name dictionary covers
    only regions 0-2's nations (15 of 25 — the realistic
    partial-reference scenario), so ``dictGetOrDefault`` exercises BOTH
    branches at every SF (customers exist in all 25 nations, probed).

    Per nation key the battery emits: the defaulted name lookup
    (dictGetOrDefault -> 'UNKNOWN'), membership (dictHas), the region
    name through the hierarchy (chained dictGet), the full hierarchy
    path as CSV (dictGetHierarchy), subtree membership under region 1
    (dictIsIn), and the customer count — the enrich is a real query
    over the customer table, not a metadata walk.

    Scale shape: the dictionaries are literal in-plan MAPS built from a
    driver-collected 30-row reference set — exactly ClickHouse's
    in-RAM dictionary contract (reference data is small by definition;
    a dimension too big to pin in RAM is a broadcast JOIN, the
    ``broadcast(dim)`` path every TPC-H query here already uses).  Every
    lookup is MAP-SIDE (zero joins, zero shuffles beyond the one
    customer-count aggregate); the hierarchy walk is literal-folded."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n_rows = sorted(
        nation.collect(), key=lambda r: r["n_nationkey"]
    )  # 25 rows — driver-bounded reference data
    r_rows = sorted(region.collect(), key=lambda r: r["r_regionkey"])

    # partial name dict: nations of regions 0-2 only (dictGetOrDefault's
    # miss branch stays live — 10 of 25 nations are absent)
    name_pairs = [
        x
        for r in n_rows
        if r["n_regionkey"] <= 2
        for x in (F.lit(r["n_nationkey"]), F.lit(r["n_name"]))
    ]
    name_dict = F.create_map(*name_pairs)
    parent_pairs = [
        x
        for r in n_rows
        for x in (F.lit(r["n_nationkey"]), F.lit(100 + r["n_regionkey"]))
    ]
    parent_dict = F.create_map(*parent_pairs)
    region_pairs = [
        x for r in r_rows for x in (F.lit(100 + r["r_regionkey"]), F.lit(r["r_name"]))
    ]
    region_dict = F.create_map(*region_pairs)

    cust = load_table(spark, sf_dir, "customer").groupBy(
        F.col("c_nationkey").alias("nationkey")
    ).agg(F.count("*").cast("long").alias("n_customers"))
    key = F.col("nationkey")
    parent = parent_dict[key]
    return cust.select(
        key.cast("long").alias("nationkey"),
        F.coalesce(name_dict[key], F.lit("UNKNOWN")).alias("dict_name"),
        name_dict[key].isNotNull().alias("dict_has"),
        region_dict[parent].alias("region_name"),
        F.concat_ws(
            ",", key.cast("string"), parent.cast("string")
        ).alias("hierarchy_path"),
        (parent == F.lit(101)).alias("in_region_1"),
        "n_customers",
    )
