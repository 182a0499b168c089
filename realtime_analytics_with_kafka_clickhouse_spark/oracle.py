"""DuckDB oracle SQL for every driver-visible query.

Each entry is ANSI-ish SQL in DuckDB's dialect, equivalent to the Spark
DataFrame program of the same name in ``__spark_entry__.queries()``.  Column
aliases match the Spark side exactly (driver compares by sorted column name).

Money sums use the same decimal-exact trick as the Spark side
(``functions.scalars.dsum``):  CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)
— bit-identical to Spark's decimal sum regardless of execution order.
"""

from __future__ import annotations

DSUM = "CAST(SUM(CAST({x} AS DECIMAL(25,6))) AS DOUBLE)"


def _dsum(x: str) -> str:
    return DSUM.format(x=x)


def _davg(x: str) -> str:
    return f"{_dsum(x)} / COUNT({x})"


ORACLE: dict[str, str] = {}

# ---------------------------------------------------------------- rollups

# A1's category dimension: a props-derived bucket independent of the status
# column (event_type), so the MV's WHERE order_status='completed' filter is
# carried faithfully.  Matches operators.rollups.category_key/quantity_key.
_QTY = "coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)"
_CAT = f"'cat_' || CAST({_QTY} % 5 AS VARCHAR)"

_A1 = f"""
SELECT date_trunc('hour', ts) AS hour,
       {_CAT} AS category,
       count(*) AS order_count,
       {_dsum('value')} AS total_revenue,
       CAST(sum({_QTY}) AS BIGINT) AS total_quantity
FROM events
WHERE event_type = 'purchase'
GROUP BY 1, 2
"""

ORACLE["hourly_category_rollup"] = _A1

ORACLE["daily_region_rollup"] = f"""
SELECT CAST(ts AS DATE) AS date,
       'region_' || CAST(user_id % 7 AS VARCHAR) AS region,
       count(*) AS order_count,
       {_dsum('value')} AS total_revenue
FROM events
WHERE event_type = 'purchase'
GROUP BY 1, 2
"""

ORACLE["global_totals"] = f"""
SELECT count(*) AS total_orders, {_dsum('value')} AS total_revenue
FROM events WHERE event_type = 'purchase'
"""

ORACLE["category_revenue_share"] = f"""
WITH per_cat AS (
  SELECT {_CAT} AS category, {_dsum('value')} AS revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT category, revenue,
       round(revenue / sum(revenue) OVER () * 100, 4) AS revenue_share_pct
FROM per_cat
"""

ORACLE["region_revenue_sorted"] = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date,
         'region_' || CAST(user_id % 7 AS VARCHAR) AS region,
         count(*) AS order_count,
         {_dsum('value')} AS total_revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT region, CAST(sum(order_count) AS BIGINT) AS order_count,
       {_dsum('total_revenue')} AS total_revenue
FROM daily GROUP BY 1 ORDER BY total_revenue DESC
"""

ORACLE["hourly_trend"] = f"""
WITH a1 AS ({_A1})
SELECT hour, CAST(sum(order_count) AS BIGINT) AS order_count,
       {_dsum('total_revenue')} AS total_revenue
FROM a1 GROUP BY 1
"""

# ---------------------------------------------------------------- relational
ORACLE["q1_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       {_dsum('l_extendedprice')} AS sum_base_price,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_davg('l_quantity')} AS avg_qty,
       {_davg('l_extendedprice')} AS avg_price,
       {_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""

ORACLE["q3_shipping_priority"] = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

ORACLE["q5_region_supplier_volume"] = f"""
SELECT n_name, {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1
"""

ORACLE["q6_forecast_revenue"] = f"""
SELECT {_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLE["q10_returned_items"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLE["q14_promo_revenue"] = f"""
SELECT round(100.0 * {_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {_dsum('l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""

ORACLE["q18_large_volume_customers"] = f"""
WITH big AS (
  SELECT l_orderkey, {_dsum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY 1 HAVING {_dsum('l_quantity')} > 200
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

ORACLE["q19_bracket_predicates"] = f"""
SELECT {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""

ORACLE["q13_customer_order_distribution"] = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS order_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY 1)
SELECT order_count, count(*) AS n_customers
FROM per_cust GROUP BY 1
"""

ORACLE["q17_small_quantity_revenue"] = f"""
WITH per_part AS (
  SELECT l_partkey AS avg_partkey, {_davg('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY 1)
SELECT round({_dsum('l_extendedprice')} / 7.0, 6) AS avg_yearly
FROM lineitem JOIN per_part ON l_partkey = avg_partkey
WHERE l_quantity < 0.2 * avg_qty
"""

ORACLE["q22_idle_rich_customers"] = f"""
WITH avg_bal AS (
  SELECT {_davg('c_acctbal')} AS avg_bal FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment, count(*) AS n_customers, {_dsum('c_acctbal')} AS total_balance
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""

ORACLE["q4_late_shipment_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY 1
"""

ORACLE["q7_nation_volume_shipping"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

_Q8_VOLUME = "l_extendedprice * (1 - l_discount)"
_Q8_TARGET = f"CASE WHEN n2.n_name = 'NATION_3' THEN {_Q8_VOLUME} ELSE 0.0 END"

ORACLE["q8_market_share"] = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       round({_dsum(_Q8_TARGET)} / {_dsum(_Q8_VOLUME)}, 6) AS mkt_share,
       {_dsum(_Q8_VOLUME)} AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""

ORACLE["market_segment_totals"] = f"""
SELECT c_mktsegment,
       count(*) AS order_count,
       {_dsum('o_totalprice')} AS total_revenue,
       {_davg('o_totalprice')} AS avg_order_value
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""

ORACLE["customers_with_orders"] = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

ORACLE["customers_without_orders"] = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
"""

ORACLE["top_customers_by_revenue"] = f"""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS order_count, {_dsum('o_totalprice')} AS revenue
  FROM orders GROUP BY 1
)
SELECT c_custkey, c_name, order_count, revenue
FROM per_cust JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLE["q2_min_cost_supplier"] = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), mc AS (
  SELECT l_partkey AS mc_partkey, min(cost) AS min_cost FROM cost GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, min_cost
FROM cost
JOIN mc ON cost.l_partkey = mc_partkey AND cost.cost = min_cost
JOIN part ON cost.l_partkey = p_partkey
JOIN eu_supp ON cost.l_suppkey = eu_supp.s_suppkey
WHERE p_type = 'STANDARD' AND p_size <= 10
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

ORACLE["q9_product_type_profit"] = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {_dsum('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
"""

ORACLE["q11_important_parts"] = f"""
WITH n1_rows AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
), per_part AS (
  SELECT l_partkey AS partkey, {_dsum('val')} AS part_value FROM n1_rows GROUP BY 1
), total AS (
  SELECT {_dsum('val')} AS nation_total FROM n1_rows
)
SELECT partkey, part_value FROM per_part, total
WHERE part_value > nation_total * 0.001
"""

ORACLE["q12_ship_channel_priority"] = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 7 THEN 'FAST'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'REGULAR'
            ELSE 'SLOW' END AS ship_channel,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""

ORACLE["q15_top_supplier"] = f"""
WITH revenue AS (
  SELECT l_suppkey, {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

ORACLE["q16_supplier_part_counts"] = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 23, 25, 45)
  AND NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
GROUP BY 1, 2, 3
"""

ORACLE["q20_promotion_suppliers"] = f"""
WITH per_pair AS (
  SELECT l_suppkey, l_partkey,
         {_dsum('l_quantity')} AS qty_all,
         {_dsum("CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' THEN l_quantity ELSE 0.0 END")} AS qty_1997
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE EXISTS (SELECT 1 FROM per_pair
              WHERE l_suppkey = s_suppkey
                AND qty_1997 > 0.5 * qty_all AND qty_all >= 50)
ORDER BY s_suppkey
"""

ORACLE["q21_waiting_suppliers"] = """
WITH joined AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS po_orderkey,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supps
  FROM joined GROUP BY 1
), late_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM joined WHERE is_late
)
SELECT s_name, count(*) AS numwait
FROM late_pairs
JOIN per_order ON l_orderkey = po_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supps > 1 AND n_late_supps = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 20
"""

ORACLE["distinct_customers_per_nation"] = """
SELECT n_name,
       count(DISTINCT o_custkey) AS distinct_customers,
       count(*) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1
"""

ORACLE["repeat_customers_both_years"] = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
"""

ORACLE["one_year_only_customers"] = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
"""

ORACLE["priority_status_rollup"] = f"""
SELECT o_orderpriority, o_orderstatus,
       count(*) AS order_count, {_dsum('o_totalprice')} AS total_revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

ORACLE["status_pivot"] = """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
FROM orders GROUP BY 1
"""

ORACLE["part_type_stats"] = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substr(p_type, 1, 6) AS type_prefix,
       length(p_name) AS name_len,
       round(sqrt(CAST(p_size AS DOUBLE)), 6) AS size_sqrt,
       round(ln(p_retailprice + 1), 6) AS log_price,
       p_size % 5 AS size_mod5
FROM part
"""

ORACLE["customer_name_features"] = """
SELECT c_custkey,
       array_to_string(list_transform(string_split(lower(c_name), ' '),
                       w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS name_initcap,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       translate(c_name, '#', '-') AS name_translated,
       reverse(c_name) AS name_reversed,
       string_split(c_name, '#')[2] AS name_number,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS seg_edit_dist,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation
FROM customer
"""

# dayofweek: Spark is 1=Sunday, DuckDB 0=Sunday -> +1.
ORACLE["order_date_features"] = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(quarter(o_orderdate) AS BIGINT) AS quarter,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_two_months,
       CAST(o_orderdate AS DATE) + 30 AS plus_30_days,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
FROM orders
"""

ORACLE["order_value_distribution"] = """
SELECT o_orderpriority, o_orderkey, o_totalprice, pct_rank, cume,
       max_in_class, min_in_class, second_in_class
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER w AS rn,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume,
         first_value(o_totalprice) OVER wf AS max_in_class,
         last_value(o_totalprice) OVER wf AS min_in_class,
         nth_value(o_totalprice, 2) OVER wf AS second_in_class
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC),
         wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
WHERE rn <= 100
"""

# ---------------------------------------------------------------- windows
ORACLE["top_parts_per_brand"] = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rank_in_brand FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rank_in_brand
  FROM part
) WHERE rank_in_brand <= 3
"""

_DAILY_REV = f"""
  SELECT CAST(o_orderdate AS DATE) AS order_date, {_dsum('o_totalprice')} AS daily_revenue
  FROM orders GROUP BY 1
"""

ORACLE["moving_avg_daily_revenue"] = f"""
WITH daily AS ({_DAILY_REV})
SELECT order_date, daily_revenue,
       round(
         CAST(sum(CAST(daily_revenue AS DECIMAL(25,6)))
              OVER (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / count(*) OVER (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
         6) AS revenue_ma7
FROM daily
"""

ORACLE["cumulative_daily_revenue"] = f"""
WITH daily AS ({_DAILY_REV})
SELECT order_date, daily_revenue,
       CAST(sum(CAST(daily_revenue AS DECIMAL(25,6)))
            OVER (ORDER BY order_date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS cum_revenue
FROM daily
"""

ORACLE["order_gaps_per_customer"] = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev
FROM orders
"""

ORACLE["customer_order_rank"] = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         rank()       OVER w AS price_rank,
         dense_rank() OVER w AS price_dense_rank,
         ntile(4)     OVER w AS price_quartile
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
) WHERE price_rank <= 50
"""

# ---------------------------------------------------------------- dedup [EXT]

_H = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def _h(x: str) -> str:
    return _H.format(x=x)


# Shared CTE: distinct word-3-gram shingles per doc, with the same
# absolute document-frequency cap as operators.dedup
# (anti-join against shingles with df > MAX_SHINGLE_DOC_FREQ).
_SHINGLES = """
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3),
sh0 AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)),
frequent AS (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) > 100),
sh AS (SELECT doc_id, shingle FROM sh0
       WHERE shingle NOT IN (SELECT shingle FROM frequent)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
"""

ORACLE["dedup_exact"] = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS dup_count
FROM documents GROUP BY text
"""

ORACLE["ngram_jaccard_pairs"] = f"""
WITH {_SHINGLES}
SELECT doc_a, doc_b, inter / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter / (sa.n + sb.n - inter) >= 0.5
"""

# MinHash hash family: identical literal coefficients as the Spark side
# (operators.dedup.MINHASH_COEFFS) over the same 28-bit md5 base.
from .operators.dedup import (  # noqa: E402
    MINHASH_BAND_ROWS,
    MINHASH_COEFFS,
    MINHASH_K,
    MINHASH_MOD,
)

_MH_COLS = ",\n         ".join(
    f"min(({a} * base + {b}) % {MINHASH_MOD}) AS mh_{i}"
    for i, (a, b) in enumerate(MINHASH_COEFFS)
)


def _band_sig(band: int) -> str:
    parts = [
        f"printf('%02d:%d', {i}, mh_{i})"
        for i in range(band * MINHASH_BAND_ROWS, (band + 1) * MINHASH_BAND_ROWS)
    ]
    return " || ',' || ".join(parts)


_SIGS_UNION = "\n  UNION ALL\n  ".join(
    f"SELECT doc_id, {band} AS band, {_band_sig(band)} AS sig FROM minh"
    for band in range(MINHASH_K // MINHASH_BAND_ROWS)
)

ORACLE["minhash_near_dup"] = f"""
WITH {_SHINGLES},
hashes AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS base FROM sh),
minh AS (
  SELECT doc_id,
         {_MH_COLS}
  FROM hashes GROUP BY 1),
sigs AS (
  {_SIGS_UNION}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, inter / (sa.n + sb.n - inter) AS jaccard
FROM cand
JOIN inter USING (doc_a, doc_b)
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter / (sa.n + sb.n - inter) >= 0.5
"""

# Fuzzy decontamination: corpus x benchmark LSH candidates, exact-Jaccard
# verified, aggregated to each contaminated corpus doc's worst overlap.
ORACLE["minhash_contamination"] = f"""
WITH {_SHINGLES},
hashes AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS base FROM sh),
minh AS (
  SELECT doc_id,
         {_MH_COLS}
  FROM hashes GROUP BY 1),
sigs AS (
  {_SIGS_UNION}),
bench AS (SELECT doc_id FROM documents WHERE {_h('text')} % 7 = 0),
cand AS (
  SELECT DISTINCT c.doc_id AS corpus_id, b.doc_id AS bench_id
  FROM sigs c JOIN sigs b ON c.band = b.band AND c.sig = b.sig
  WHERE b.doc_id IN (SELECT doc_id FROM bench)
    AND c.doc_id NOT IN (SELECT doc_id FROM bench)),
inter2 AS (
  SELECT a.doc_id AS corpus_id, b.doc_id AS bench_id, count(*) AS inter
  FROM sh a
  JOIN sh b ON a.shingle = b.shingle
  JOIN cand ON cand.corpus_id = a.doc_id AND cand.bench_id = b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT corpus_id, bench_id, inter / (sa.n + sb.n - inter) AS jaccard
  FROM inter2
  JOIN sizes sa ON corpus_id = sa.doc_id
  JOIN sizes sb ON bench_id = sb.doc_id
  WHERE inter / (sa.n + sb.n - inter) >= 0.5)
SELECT corpus_id, max(jaccard) AS max_jaccard, count(*) AS n_bench_hits
FROM pairs GROUP BY 1
"""


# Global shuffle: md5(salt:doc_id) permutation, position by one global
# rank (the Spark side's bucketed prefix-sum equals it exactly), shard =
# position DIV docs-per-shard.
ORACLE["global_shuffle_shards"] = """
WITH k AS (
  SELECT doc_id,
         md5(concat_ws(':', 'shuffle', CAST(doc_id AS VARCHAR))) AS skey
  FROM documents),
r AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY skey, doc_id) - 1 AS BIGINT) AS shuffle_pos
  FROM k)
SELECT doc_id, shuffle_pos,
       CAST(shuffle_pos // 100 AS BIGINT) AS shard_id
FROM r
"""


# Incremental-index ingest: the full-corpus LSH result restricted to
# pairs touching the arriving batch (doc_id % 5 == 0) — what the stored
# index's (band, sig) probe discovers on arrival.
ORACLE["minhash_index_ingest"] = f"""
SELECT * FROM ({ORACLE["minhash_near_dup"]})
WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
"""


# Connected components over the verified near-dup pairs via a recursive
# transitive-closure CTE (tractable because the pair set is LSH-small).
ORACLE["near_dup_clusters"] = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({ORACLE['minhash_near_dup']})),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
"""

_SIMHASH_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
th AS (SELECT doc_id, {_h('word')} AS h FROM tok),
bits AS (SELECT doc_id, h, b FROM th, UNNEST(range(0, 32)) AS t(b)),
per_bit AS (
  SELECT doc_id, b,
         CAST(sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
  FROM bits GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY 1
"""

ORACLE["simhash_fingerprints"] = _SIMHASH_SQL

# SimHash banding: 4 bands of 8 bits; Hamming <= 3 pairs agree on >= 1 band
# (pigeonhole), so banded candidates are exact for the threshold.
ORACLE["simhash_near_dup"] = f"""
WITH sh AS ({_SIMHASH_SQL}),
bands AS (
  SELECT doc_id, simhash, b AS band, (simhash >> (8 * b)) & 255 AS val
  FROM sh, UNNEST(range(0, 4)) AS t(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
"""

# ---------------------------------------------------------------- text [EXT]

# Rational idf (N+1)/(df+1), not ln(): IEEE division is correctly rounded on
# both engines, libm ln() is not guaranteed to agree in the last ulp.
ORACLE["tfidf_top_terms"] = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word, tf,
         round(CAST(tf AS DOUBLE)
               * (CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df USING (word), n)
SELECT doc_id, word, tf, tfidf, term_rank FROM (
  SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, word ASC) AS BIGINT) AS term_rank
  FROM scored)
WHERE term_rank <= 3
"""

# Sliding-window chunking: starts 1, 1+stride, ... while start <= n
# (DuckDB range(1, n+1, stride) == Spark sequence(1, n, stride)); chunks are
# 1-based inclusive list slices, truncated at the end of the document.
ORACLE["chunk_documents"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (SELECT doc_id, words,
             unnest(range(1, len(words) + 1, 48)) AS start
      FROM w)
SELECT doc_id,
       CAST((start - 1) / 48 AS BIGINT) AS chunk_id,
       CAST(least(start + 63, len(words)) - start + 1 AS BIGINT) AS n_chunk_tokens,
       array_to_string(words[start : least(start + 63, len(words))], ' ') AS chunk_text
FROM s
"""

ORACLE["best_doc_per_source"] = """
WITH q AS (
  SELECT source, doc_id,
         round(0.4 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
             + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / CAST(len(string_split(text, ' ')) AS DOUBLE))
             + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                            / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0),
             6) AS quality_score
  FROM documents)
SELECT source, doc_id, quality_score FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY quality_score DESC, doc_id ASC) AS rn
  FROM q)
WHERE rn = 1
"""

_PII_TEXT = """'Contact ' || c_name || ' at ' || lower(replace(c_name, '#', '.')) || '@example.com'
  || ' or call 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
  || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
  || ' (card 4111-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
  || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
  || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ').'"""

_PII_EMAIL = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
_PII_CARD = "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"
_PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

ORACLE["pii_scrub"] = f"""
WITH built AS (SELECT c_custkey AS custkey, {_PII_TEXT} AS text FROM customer)
SELECT custkey,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_CARD}', '[CARD]', 'g'),
           '{_PII_PHONE}', '[PHONE]', 'g') AS scrubbed_text,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_CARD}')) AS BIGINT) AS n_cards,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones
FROM built
"""

# Word n-grams as 1-based inclusive list slices; generate_series(1, 0) is
# empty, so short documents contribute no grams (mirrors the Spark guard).
_GRAMS4 = """list_transform(generate_series(1, len(string_split(text, ' ')) - 3),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 3), ' '))"""

ORACLE["contamination_check"] = f"""
WITH g AS (SELECT doc_id, unnest({_GRAMS4}) AS gram FROM documents),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0)
SELECT doc_id, count(DISTINCT gram) AS n_shared_grams
FROM g
WHERE doc_id % 7 <> 0 AND gram IN (SELECT gram FROM bench)
GROUP BY 1
"""

ORACLE["repetition_score"] = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')) AS tri
  FROM documents)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_tokens,
       CASE WHEN len(tri) > 0
            THEN round(1 - CAST(len(list_distinct(tri)) AS DOUBLE) / CAST(len(tri) AS DOUBLE), 6)
            ELSE 0.0 END AS dup_trigram_ratio,
       round(CAST(list_max(list_transform(list_distinct(words),
                  t -> len(list_filter(words, x -> x = t)))) AS DOUBLE)
             / CAST(len(words) AS DOUBLE), 6) AS top_token_ratio,
       CASE WHEN len(tri) > 0
            THEN round(1 - CAST(len(list_distinct(tri)) AS DOUBLE) / CAST(len(tri) AS DOUBLE), 6)
            ELSE 0.0 END > 0.1 AS is_repetitive
FROM w
"""

_QUALITY_EXPR = """round(0.4 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
           + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
           + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                          / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0),
           6)"""

ORACLE["quality_filter_pipeline"] = f"""
WITH reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
q AS (
  SELECT doc_id, lang, {_QUALITY_EXPR} AS quality_score,
         len(string_split(text, ' ')) >= 5 AS passes
  FROM documents)
SELECT doc_id, lang, quality_score
FROM q JOIN reps USING (doc_id)
WHERE passes AND quality_score >= 0.5
"""

ORACLE["token_stats"] = """
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
FROM documents
"""

ORACLE["quality_score"] = """
SELECT doc_id,
       round(0.4 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
           + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
           + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                          / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0),
           6) AS quality_score,
       len(string_split(text, ' ')) >= 5 AS passes_min_length
FROM documents
"""

# r12 profile scorer: integer evidence scores (function-word hits x3 +
# diagnostic-char hits) mirrored term-for-term from text.LANG_PROFILES;
# argmax via greatest + alphabetical-first CASE chain, 'und' when no
# profile fires — pure integer arithmetic, portable by construction.
ORACLE["language_id"] = """
WITH s AS (
  SELECT doc_id, lang,
         string_split(lower(text), ' ') AS toks,
         lower(text) AS ltext
  FROM documents),
sc AS (
  SELECT doc_id, lang,
         3 * len(list_filter(toks, t -> t IN
             ('der','die','das','und','ist','nicht','ein','eine','mit','von')))
           + len(regexp_extract_all(ltext, '[äöüß]')) AS s_de,
         3 * len(list_filter(toks, t -> t IN
             ('the','a','of','and','to','is','it','that','for','on'))) AS s_en,
         3 * len(list_filter(toks, t -> t IN
             ('el','los','las','una','por','con','para','como','pero','sus')))
           + len(regexp_extract_all(ltext, '[áíñóú¿¡]')) AS s_es,
         3 * len(list_filter(toks, t -> t IN
             ('le','les','et','est','dans','que','pour','des','avec','sur')))
           + len(regexp_extract_all(ltext, '[àâçéèêîôû]')) AS s_fr,
         len(regexp_extract_all(ltext, '[一-鿿]')) AS s_zh
  FROM s),
p AS (
  SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
         greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
  FROM sc)
SELECT doc_id, lang,
       CASE WHEN best = 0 THEN 'und'
            WHEN s_de = best THEN 'de'
            WHEN s_en = best THEN 'en'
            WHEN s_es = best THEN 'es'
            WHEN s_fr = best THEN 'fr'
            WHEN s_zh = best THEN 'zh' END AS predicted_lang,
       lang = (CASE WHEN best = 0 THEN 'und'
            WHEN s_de = best THEN 'de'
            WHEN s_en = best THEN 'en'
            WHEN s_es = best THEN 'es'
            WHEN s_fr = best THEN 'fr'
            WHEN s_zh = best THEN 'zh' END) AS correct
FROM p
"""

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

ORACLE["bpe_token_stats"] = f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text, '{_BPE_RE}') AS toks,
         regexp_extract_all(text, '[A-Za-z]+') AS words,
         regexp_extract_all(text, '[0-9]+') AS numbers
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(len(words) AS BIGINT) AS n_word_tokens,
       CAST(len(numbers) AS BIGINT) AS n_number_tokens,
       CAST(len(toks) - len(words) - len(numbers) AS BIGINT) AS n_symbol_tokens,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS avg_bpe_token_len
FROM t
"""

ORACLE["deterministic_sample"] = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {_h('CAST(doc_id AS VARCHAR)')} % 100 < 10
"""

ORACLE["stratified_sample"] = f"""
SELECT doc_id, lang, pick_rank FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY {_h('CAST(doc_id AS VARCHAR)')} ASC, doc_id ASC) AS BIGINT) AS pick_rank
  FROM documents)
WHERE pick_rank <= 5
"""

ORACLE["doc_fingerprint"] = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ' '), w -> {_h('w')})),
         (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM documents
"""

# ------------------------------------------------------------ similarity [EXT]

_DOT_AB = """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
  list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
  (acc, x) -> acc + x)"""


def _dot_sql(a: str, b: str) -> str:
    return _DOT_AB.format(a=a, b=b)


_NORMED_V = f"""
v AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
  FROM embeddings)
"""

ORACLE["ann_cosine_topk"] = f"""
WITH {_NORMED_V},
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos_sim
  FROM v a, v b WHERE a.vec_id <> b.vec_id)
SELECT vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM p)
WHERE rank <= 5
"""

# Query-batch serving: label-0 queries x label!=0 corpus, exact top-5.
ORACLE["ann_query_broadcast_topk"] = f"""
WITH {_NORMED_V},
lv AS (SELECT v.vec_id, v.embedding, v.nrm, e.label
       FROM v JOIN embeddings e ON v.vec_id = e.vec_id),
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         round({_dot_sql('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 6)
           AS cos_sim
  FROM lv q, lv c WHERE q.label = 0 AND c.label <> 0)
SELECT query_id, corpus_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, corpus_id ASC) AS BIGINT) AS rank
  FROM p)
WHERE rank <= 5
"""

_PLANE_COMP = (
    "(CASE WHEN " + _H.format(x="CAST(p AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
    + " % 2 = 1 THEN 1.0 ELSE -1.0 END)"
)

# Plane count derives from n exactly like similarity.n_lsh_planes:
# max(8, ceil(log2(n / 4))) — the Spark side and the oracle stay in
# lockstep at every scale factor.
_N_PLANES = (
    "(SELECT GREATEST(8, CAST(ceil(log2(count(*) / 4.0)) AS BIGINT)) FROM embeddings)"
)

ORACLE["ann_lsh_bucketed"] = f"""
WITH {_NORMED_V},
sv AS (
  SELECT vec_id, embedding, nrm,
         CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(0, {_N_PLANES}), p ->
             CASE WHEN
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, 65), j ->
                   {_PLANE_COMP} * CAST(embedding[j] AS DOUBLE))),
                 (acc, x) -> acc + x) > 0
             THEN pow(2.0, CAST(p AS DOUBLE)) ELSE 0.0 END)),
           (acc, x) -> acc + x) AS BIGINT) AS sig
  FROM v)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos_sim
FROM sv a JOIN sv b ON a.sig = b.sig AND a.vec_id < b.vec_id
"""

ORACLE["embedding_near_dup"] = f"""
SELECT * FROM ({ORACLE['ann_lsh_bucketed']}) WHERE cos_sim >= 0.3
"""

# Symmetric int8 quantization.  floor(x + 0.5) instead of round(): half-away
# vs half-even conventions differ across engines, floor does not.  The
# unrounded scale feeds quantization and the error bound; only the OUTPUT
# scale is rounded for display.  quant rides as a CSV string — the driver's
# pandas canonicalizer cannot hash list cells (round-3 red row).
ORACLE["embedding_quantize_int8"] = """
WITH s AS (
  SELECT vec_id, embedding,
         greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                  1e-30) / 127.0 AS scale
  FROM embeddings),
q AS (
  SELECT vec_id, embedding, scale,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)) AS quant
  FROM s)
SELECT vec_id,
       round(scale, 6) AS scale,
       array_to_string(quant, ',') AS quant_csv,
       round(list_max(list_transform(range(1, len(embedding) + 1),
             i -> abs(CAST(embedding[i] AS DOUBLE)
                      - CAST(quant[i] AS DOUBLE) * scale))), 6) AS max_abs_err
FROM q
"""

ORACLE["ann_ivf_topk"] = f"""
WITH v AS (
  SELECT vec_id, label, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
  FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos_sim
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id)
SELECT vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM p)
WHERE rank <= 5
"""

# Recall@k eval: IVF (probe=1 label cells) vs the exact baseline — the
# two index oracles compose as subqueries, then the eval is pure id-pair
# set arithmetic (identical on both engines).
ORACLE["ann_recall_at_k"] = f"""
WITH exact_k AS (SELECT vec_id, neighbor_id FROM ({ORACLE['ann_cosine_topk']})),
approx_k AS (SELECT vec_id, neighbor_id FROM ({ORACLE['ann_ivf_topk']})),
k_per_q AS (SELECT vec_id, count(*) AS k FROM exact_k GROUP BY 1),
hits AS (
  SELECT e.vec_id, count(*) AS n_hits
  FROM exact_k e JOIN approx_k a USING (vec_id, neighbor_id)
  GROUP BY 1)
SELECT q.vec_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / k, 6) AS recall_at_k
FROM k_per_q q LEFT JOIN hits h ON q.vec_id = h.vec_id
"""

# Vocabulary growth: word -> first doc, conditional counts at the same
# row_number checkpoint boundaries — all exact integers.
def _vocab_growth_sql() -> str:
    cps = (1, 2, 3, 5, 10, 50, 1000)
    bcols = ", ".join(
        f"max(CASE WHEN rn <= {c} THEN doc_id END) AS b_{c}" for c in cps
    )
    vcols = ", ".join(
        f"CAST(sum(CASE WHEN first_doc <= b_{c} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS v_{c}"
        for c in cps
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT CAST({c} AS BIGINT) AS checkpoint_docs, v_{c} AS vocab_size,"
        f" vocab_total, n_docs_total FROM g"
        for c in cps
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
first AS (SELECT word, min(doc_id) AS first_doc FROM tok GROUP BY 1),
ranked AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents),
bounds AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_total, {bcols} FROM ranked),
g AS (SELECT CAST(count(*) AS BIGINT) AS vocab_total, n_docs_total, {vcols}
      FROM first, bounds GROUP BY n_docs_total)
{arms}
"""


ORACLE["vocab_growth_curve"] = _vocab_growth_sql()


# Embedding quality audit: per-label pathology counts; norms round-6
# via the mirrored fold before min/max selection.
ORACLE["embedding_quality_audit"] = f"""
WITH per AS (
  SELECT label,
         len(embedding) AS dim,
         CAST(len(list_filter(embedding, x -> isnan(x))) AS BIGINT) AS nan_dims,
         CASE WHEN len(list_filter(embedding, x -> x <> 0.0)) = 0
              THEN 1 ELSE 0 END AS is_zero,
         round(sqrt({_dot_sql('embedding', 'embedding')}), 6) AS nrm
  FROM embeddings)
SELECT CAST(label AS INT) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(DISTINCT dim) AS BIGINT) AS n_distinct_dims,
       CAST(max(dim) AS BIGINT) AS dim,
       CAST(sum(nan_dims) AS BIGINT) AS total_nan_dims,
       CAST(sum(is_zero) AS BIGINT) AS n_zero_vectors,
       min(nrm) AS min_norm,
       max(nrm) AS max_norm
FROM per GROUP BY 1
"""


# Exact media dedup: md5-digest grouping, all-integer rollup.
ORACLE["media_exact_dedup"] = """
WITH per AS (
  SELECT (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
         md5(text) AS digest,
         count(*) AS copies,
         max(CAST(octet_length(encode(text)) AS BIGINT)) AS sz
  FROM documents GROUP BY 1, 2)
SELECT format,
       CAST(sum(copies) AS BIGINT) AS n_media,
       CAST(count(*) AS BIGINT) AS n_unique_content,
       CAST(sum(copies) - count(*) AS BIGINT) AS n_dup_rows,
       CAST(sum((copies - 1) * sz) AS BIGINT) AS reclaimable_bytes
FROM per GROUP BY 1
"""


# Tokenizer fertility: exact integer sums, two mirrored divisions.
ORACLE["tokenizer_fertility_by_source"] = """
WITH g AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS n_bytes,
         CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM documents GROUP BY 1, 2)
SELECT lang, source, n_docs, n_tokens, n_bytes,
       round(CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS bytes_per_token,
       round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS chars_per_token
FROM g
"""


# Hard-negative mining: the same fold-cosine ranking with the source
# exclusion applied before the window — true top-3-excluding.  Cosine
# rides the portable floor(x*1e6+0.5)/1e6 chain (r10: matches the
# engine's mapInPandas partial-top-k rewrite; pure correctly-rounded
# IEEE ops, identical bits in numpy, Catalyst and DuckDB).
ORACLE["hard_negative_mining"] = f"""
WITH cand AS (
  SELECT e.vec_id, e.embedding, d.source
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
anch AS (
  SELECT vec_id AS qid, embedding AS qe, source AS q_src
  FROM cand WHERE vec_id % 100 = 0),
scored AS (
  SELECT qid, c.vec_id AS neighbor_id,
         floor({_dot_sql('c.embedding', 'qe')}
               / (sqrt({_dot_sql('c.embedding', 'c.embedding')})
                  * sqrt({_dot_sql('qe', 'qe')}))
               * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
  FROM cand c CROSS JOIN anch
  WHERE c.source <> q_src)
SELECT qid AS vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT)
      AS rank
  FROM scored)
WHERE rank <= 3
"""


# Binary (1-bit) ANN: sign-bit packing mirrored as the same
# shift-accumulate fold (init-less list_reduce == 0-seeded since
# 0*2+b == b); XOR+POPCNT Hamming ranking is all-integer — bit-exact.
ORACLE["ann_hamming_topk"] = """
WITH codes AS (
  SELECT vec_id,
    list_reduce(list_transform(range(1, 33),
      i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT ELSE 0::BIGINT END),
      (acc, x) -> acc * 2 + x) AS hi,
    list_reduce(list_transform(range(33, 65),
      i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT ELSE 0::BIGINT END),
      (acc, x) -> acc * 2 + x) AS lo
  FROM embeddings),
q AS (SELECT vec_id AS qid, hi AS q_hi, lo AS q_lo
      FROM codes WHERE vec_id % 100 = 0),
d AS (
  SELECT qid, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(c.hi, q_hi)) + bit_count(xor(c.lo, q_lo))
              AS BIGINT) AS hamming
  FROM codes c CROSS JOIN q WHERE c.vec_id <> qid)
SELECT qid AS vec_id, neighbor_id, hamming, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY qid ORDER BY hamming ASC, neighbor_id ASC) AS BIGINT)
      AS rank
  FROM d)
WHERE rank <= 5
"""

ORACLE["ann_hamming_rerank_topk"] = f"""
WITH short AS (
  SELECT vec_id AS qid, neighbor_id
  FROM ({ORACLE['ann_hamming_topk'].replace('rank <= 5', 'rank <= 50')})),
scored AS (
  SELECT qid, neighbor_id,
         round({_DOT_AB.format(a='ce.embedding', b='qe.embedding')}
               / (sqrt({_DOT_AB.format(a='ce.embedding', b='ce.embedding')})
                  * sqrt({_DOT_AB.format(a='qe.embedding', b='qe.embedding')})),
               6) AS cos_sim
  FROM short
  JOIN embeddings qe ON qe.vec_id = short.qid
  JOIN embeddings ce ON ce.vec_id = short.neighbor_id)
SELECT qid AS vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT)
      AS rank
  FROM scored)
WHERE rank <= 5
"""


ORACLE["ann_hamming_recall_at_k"] = f"""
WITH exact_k AS (SELECT vec_id, neighbor_id FROM ({ORACLE['ann_cosine_topk']})
                 WHERE vec_id % 100 = 0),
approx_k AS (SELECT vec_id, neighbor_id FROM ({ORACLE['ann_hamming_topk']})),
k_per_q AS (SELECT vec_id, count(*) AS k FROM exact_k GROUP BY 1),
hits AS (
  SELECT e.vec_id, count(*) AS n_hits
  FROM exact_k e JOIN approx_k a USING (vec_id, neighbor_id)
  GROUP BY 1)
SELECT q.vec_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / k, 6) AS recall_at_k
FROM k_per_q q LEFT JOIN hits h ON q.vec_id = h.vec_id
"""

# Training-mix data card: CC membership composes as a subquery; all stats
# are exact integers, fractions are one float divide rounded to 6.
ORACLE["corpus_mix_report"] = f"""
WITH members AS (SELECT DISTINCT doc_id FROM ({ORACLE['near_dup_clusters']})),
d AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CASE WHEN doc_id IN (SELECT doc_id FROM members) THEN 1 ELSE 0 END AS is_dup
  FROM documents)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
       CAST(sum(is_dup * n_tokens) AS BIGINT) AS dup_tokens,
       round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_doc_fraction,
       round(CAST(sum(is_dup * n_tokens) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE), 6)
         AS dup_token_fraction
FROM d GROUP BY 1, 2
"""

# ------------------------------------------------------- multimodal [EXT]

ORACLE["media_metadata_stats"] = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
       (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] <> 'wav' AS is_image,
       CAST((doc_id % 4) * 160 + 320 AS DOUBLE)
         / CAST((doc_id % 3) * 120 + 240 AS DOUBLE) AS aspect_ratio
FROM documents
"""
# decode_features: the stub decoder is plain integer arithmetic over the
# UTF-8 bytes (rolling checksum + 8-bin histogram), so the oracle re-derives
# it from hex pairs of encode(text).  A real image decoder would not be
# SQL-expressible and would fall back to the rows-only check.
_HIST = ",\n       ".join(
    f"CAST(len(list_filter(bytes, x -> (x >> 5) = {i})) AS BIGINT) AS hist_{i}"
    for i in range(8)
)

ORACLE["decode_features"] = f"""
WITH b AS (
  SELECT doc_id,
         (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents)
SELECT doc_id, format,
       CAST(len(bytes) AS BIGINT) AS n_bytes,
       list_reduce(list_prepend(CAST(0 AS BIGINT), bytes), (a, x) -> (a * 131 + x) % 1000000007) AS checksum,
       {_HIST}
FROM b
"""

ORACLE["frame_sample_features"] = """
WITH b AS (
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents),
fr AS (
  SELECT doc_id, t.f AS frame_idx, bytes[(t.f*64+1):(t.f*64+64)] AS fb
  FROM b, UNNEST(range(0, CAST(ceil(len(bytes) / 64.0) AS BIGINT))) AS t(f)
  WHERE t.f % 2 = 0)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(len(fb) AS BIGINT) AS frame_bytes,
       list_reduce(list_prepend(CAST(0 AS BIGINT), fb), (a, x) -> a + x)
         / CAST(len(fb) AS DOUBLE) AS frame_mean
FROM fr
"""

def _thumb_cell(i: int) -> str:
    s = f"(({i} * n) // 16 + 1)"
    e = f"((({i} + 1) * n) // 16)"
    blk = f"bytes[{s}:{e}]"
    return (
        f"CASE WHEN {e} >= {s} THEN "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {blk}), (a, x) -> a + x)"
        f" / CAST(len({blk}) AS DOUBLE) ELSE 0.0 END AS t_{i}"
    )


_THUMB_CELLS_SQL = ",\n       ".join(_thumb_cell(i) for i in range(16))

ORACLE["resize_thumbnail"] = f"""
WITH b AS (
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes,
         octet_length(encode(text)) AS n
  FROM documents)
SELECT doc_id,
       {_THUMB_CELLS_SQL}
FROM b
"""

# ------------------------------------------------------- streaming parity

# Incremental-equals-batch invariant: the MERGE-maintained rollup must equal
# the one-shot aggregation (A1), late/out-of-order batches included.
ORACLE["incremental_hourly_rollup"] = _A1

ORACLE["incremental_daily_region_rollup"] = ORACLE["daily_region_rollup"]

# Same invariant through the transactional table format: atomic-commit
# MERGE must land on the identical one-shot aggregation.
ORACLE["incremental_rollup_txlog"] = _A1

# SummingMergeTree lifecycle: per-epoch partial-aggregate APPEND commits,
# then compact_tx's re-summing fold (OPTIMIZE ... FINAL) — the compacted
# table must equal the one-shot aggregation.
ORACLE["compacted_rollup_txlog"] = _A1

# Rollup-as-accelerator: the trend served from the STORED incremental
# rollup must equal the raw-events A8 aggregation.
ORACLE["hourly_trend_from_rollup"] = ORACLE["hourly_trend"]

# ------------------------------------------------------- timeseries [EXT]

ORACLE["user_sessionization"] = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       {_dsum('value')} AS session_revenue,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_sec
FROM sess GROUP BY 1, 2
"""

# session_window semantics: a gap of EXACTLY the gap duration opens a NEW
# session (window is [start, last+gap)), and session_end = last event + gap.
ORACLE["session_window_rollup"] = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       {_dsum('value')} AS session_revenue
FROM sess GROUP BY user_id, sid
"""

# Each event is in exactly two 2h/1h sliding windows: starts at
# trunc(ts, hour) and trunc(ts, hour) - 1h (Spark windows are epoch-aligned).
ORACLE["sliding_hourly_trend"] = f"""
WITH starts AS (
  SELECT value, date_trunc('hour', ts) AS ws FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT value, date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws
  FROM events WHERE event_type = 'purchase')
SELECT ws AS window_start, ws + INTERVAL 2 HOUR AS window_end,
       count(*) AS order_count, {_dsum('value')} AS total_revenue
FROM starts GROUP BY 1, 2
"""

ORACLE["median_value_grouped_udf"] = """
SELECT event_type, quantile_cont(value, 0.5) AS median_value, count(*) AS n
FROM events GROUP BY 1
"""

ORACLE["dashboard_cards_sql"] = f"""
SELECT count(*) AS total_orders,
       {_dsum('value')} AS total_revenue,
       {_dsum('value')} / count(*) AS avg_order_value
FROM events WHERE event_type = 'purchase'
"""

ORACLE["last_purchase_asof"] = """
SELECT event_id, user_id, ts, event_type,
       last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts,
       CASE WHEN last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL
            THEN (epoch_us(ts) - epoch_us(
                   last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))) / 1000000.0
       END AS secs_since_purchase
FROM events
"""

ORACLE["value_percentiles"] = """
SELECT event_type,
       quantile_cont(value, 0.5)  AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99
FROM events GROUP BY 1
"""

ORACLE["approx_value_percentiles"] = """
SELECT event_type,
       quantile_cont(value, 0.5)  AS p50,
       quantile_cont(value, 0.95) AS p95,
       TRUE AS sketch_within_10pct
FROM events GROUP BY 1
"""

ORACLE["top_event_types_sketch"] = """
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, event_type ASC) AS BIGINT) AS rank,
         event_type, cnt, TRUE AS sketch_exact
  FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1))
WHERE rank <= 3
"""

ORACLE["value_dispersion"] = """
WITH agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS s2
  FROM events GROUP BY 1)
SELECT event_type, n,
       round(s1 / n, 6) AS mean_value,
       round((s2 - s1 * s1 / n) / (n - 1), 6) AS var_value,
       round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS stddev_value
FROM agg
"""

ORACLE["events_props_normalize"] = """
SELECT event_id, event_type,
       coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k,
       coalesce(json_extract_string(props, '$.missing'), 'n/a') AS missing_field,
       coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) % 10 AS k_bucket,
       value * CAST(coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS DOUBLE)
         AS weighted_value
FROM events
"""

# The map is an intermediate; the oracle asserts the scalar values the map
# operations must yield (keys are 'type','bucket' + props' 'k').
# Derived from props (not fixture-shape literals): n_keys / keys_sorted /
# has_missing all come from json_keys(props) with the built keys
# ('type','bucket') excluded, mirroring the Spark side's map_filter.
ORACLE["event_feature_map"] = """
WITH pk AS (
  SELECT event_id, event_type, props,
         coalesce(list_filter(json_keys(props), kk -> kk NOT IN ('type', 'bucket')),
                  []) AS prop_keys
  FROM events)
SELECT event_id,
       CAST(2 + length(prop_keys) AS BIGINT) AS n_keys,
       array_to_string(list_sort(list_concat(['bucket', 'type'], prop_keys)), ',')
         AS keys_sorted,
       event_type AS type_val,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       list_contains(prop_keys, 'missing') AS has_missing
FROM pk
"""

ORACLE["revenue_union_ledger"] = """
SELECT 'orders' AS source, o_orderkey AS ref_id, o_orderdate AS ts, o_totalprice AS amount
FROM orders
UNION ALL
SELECT 'events' AS source, event_id AS ref_id, ts, value AS amount
FROM events WHERE event_type = 'purchase'
"""

# approx_distinct_users: the sketch value itself differs across engines, so
# the contract is (exact count, sketch-within-tolerance boolean); the oracle
# asserts the tolerance holds by emitting TRUE.
ORACLE["approx_distinct_users"] = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_10x_rsd
FROM events GROUP BY 1
"""

ORACLE["price_band_join"] = f"""
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1500.0), ('premium', 1500.0, 10000000.0))
SELECT band, count(*) AS n_parts, {_davg('p_retailprice')} AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY 1
"""

ORACLE["priority_status_cube"] = f"""
SELECT o_orderpriority, o_orderstatus,
       count(*) AS order_count, {_dsum('o_totalprice')} AS total_revenue
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""

ORACLE["label_centroids"] = """
WITH ed AS (
  SELECT label, vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(range(1, 65)) AS t(i))
SELECT label, CAST(dim AS INT) AS dim,
       round(CAST(sum(CAST(x AS DECIMAL(25,12))) AS DOUBLE) / count(*), 6) AS centroid
FROM ed GROUP BY 1, 2
"""

# applyInArrow grouped profile: integer-exact per-label measures.
ORACLE["arrow_grouped_label_profile"] = """
SELECT label,
       count(*) AS n_vecs,
       min(vec_id) AS min_vec,
       max(vec_id) AS max_vec,
       CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT))
            AS BIGINT) AS dim1_milli_sum
FROM embeddings GROUP BY 1
"""

# ------------------------------------------------------- curation [EXT]

from .operators.curation import (  # noqa: E402
    MIX_SAMPLE_MOD as _MIX_MOD,
    SHARD_TOKEN_BUDGET as _SHARD_BUDGET,
)

ORACLE["pack_training_shards"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM t)
SELECT doc_id, n_tokens, cum_tokens,
       CAST((cum_tokens - n_tokens) // {_SHARD_BUDGET} AS BIGINT) AS shard_id
FROM c
"""

ORACLE["shard_packing_efficiency"] = f"""
WITH packed AS ({ORACLE["pack_training_shards"]}),
s AS (
  SELECT shard_id, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
  FROM packed GROUP BY 1)
SELECT shard_id, n_docs, shard_tokens,
       CAST(greatest(shard_tokens - {_SHARD_BUDGET}, 0) AS BIGINT)
         AS overflow_tokens,
       CAST((shard_tokens * 10000) // {_SHARD_BUDGET} AS BIGINT)
         AS utilization_bp
FROM s
"""

ORACLE["dedup_keep_best"] = f"""
WITH clusters AS ({ORACLE['near_dup_clusters']}),
q AS (SELECT doc_id, {_QUALITY_EXPR} AS quality_score FROM documents),
m AS (
  SELECT q.doc_id, c.cluster_id, q.quality_score,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality_score DESC, q.doc_id) AS rn
  FROM clusters c JOIN q ON c.doc_id = q.doc_id)
SELECT doc_id, cluster_id, quality_score FROM m WHERE rn = 1
UNION ALL
SELECT q.doc_id, q.doc_id AS cluster_id, q.quality_score
FROM q LEFT JOIN clusters c ON q.doc_id = c.doc_id
WHERE c.doc_id IS NULL
"""

ORACLE["lang_balance_resample"] = f"""
WITH counts AS (SELECT lang, count(*) AS lang_docs FROM documents GROUP BY 1),
m AS (SELECT min(lang_docs) AS min_docs FROM counts)
SELECT doc_id, lang, source
FROM documents JOIN counts USING (lang), m
WHERE {_h("concat_ws(chr(1), 'mix', CAST(doc_id AS VARCHAR))")} % {_MIX_MOD}
      < least({_MIX_MOD}, min_docs * {_MIX_MOD} // lang_docs)
"""

ORACLE["ann_quantized_topk"] = """
WITH s AS (
  SELECT vec_id,
         greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                  1e-30) / 127.0 AS scale,
         embedding
  FROM embeddings),
q AS (
  SELECT vec_id, scale,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS qv
  FROM s),
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         (CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i]))
               AS DOUBLE) * a.scale) * b.scale AS qdot
  FROM q a, q b WHERE a.vec_id <> b.vec_id)
SELECT vec_id, neighbor_id, qdot, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                                    ORDER BY qdot DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM p)
WHERE rank <= 5
"""

ORACLE["bigram_fluency"] = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
e AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                                       i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM w),
c AS (SELECT bigram, count(*) AS cnt FROM e GROUP BY 1)
SELECT e.doc_id, count(*) AS n_bigrams,
       CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) / count(*) AS avg_bigram_freq
FROM e JOIN c USING (bigram)
GROUP BY 1
"""

# Gopher rule pass flags compare the RAW (unrounded) ratios, mirroring the
# Spark side; every ratio is an exact-integer division so IEEE doubles agree.
ORACLE["gopher_quality_rules"] = r"""
WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len(words) AS DOUBLE) AS mwl,
         len(list_filter(words,
             x -> x IN ('the','a','and','of','to','in','is','that'))) AS stops,
         CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           / CAST(len(words) AS DOUBLE) AS alpha,
         CAST(len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
           / CAST(len(words) AS DOUBLE) AS sym
  FROM w)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mwl, 6) AS mean_word_len,
       CAST(stops AS BIGINT) AS stopword_count,
       round(alpha, 6) AS alpha_word_ratio,
       round(sym, 6) AS symbol_ratio,
       (n_words BETWEEN 20 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
         AND stops >= 2 AND alpha >= 0.8 AND sym <= 0.1 AS passes_gopher
FROM m
"""

_GRAMS3 = """list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))"""

ORACLE["boilerplate_spans"] = f"""
WITH g AS (SELECT doc_id, unnest({_GRAMS3}) AS span FROM documents),
df AS (SELECT span, count(DISTINCT doc_id) AS df FROM g GROUP BY 1),
n AS (SELECT greatest(3, CAST(ceil(count(*) * 0.005) AS BIGINT)) AS df_min
      FROM documents),
agg AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN df >= df_min THEN 1 ELSE 0 END) AS n_boiler
  FROM g JOIN df USING (span), n
  GROUP BY 1)
SELECT doc_id,
       CAST(n_spans AS BIGINT) AS n_spans,
       CAST(n_boiler AS BIGINT) AS n_boiler_spans,
       round(CAST(n_boiler AS DOUBLE) / CAST(n_spans AS DOUBLE), 6) AS boiler_ratio,
       CAST(n_boiler AS DOUBLE) / CAST(n_spans AS DOUBLE) > 0.5 AS is_boilerplate
FROM agg
"""

ORACLE["substring_dedup_docs"] = f"""
WITH g AS (SELECT DISTINCT doc_id, unnest({_GRAMS4}) AS span FROM documents),
own AS (SELECT span, min(doc_id) AS owner FROM g GROUP BY 1),
agg AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END) AS n_dup
  FROM g JOIN own USING (span)
  GROUP BY 1)
SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
       CAST(n_dup AS BIGINT) AS n_dup_spans,
       n_dup > 0 AS is_substring_dup
FROM agg
"""


def _kmeans_parts(
    k: int = 10, iters: int = 2, dim: int = 64, src: str = "embeddings"
) -> tuple[list[str], str]:
    """Unrolled Lloyd-iteration CTEs; returns (parts, final_centroid_cte).
    The distance chain is explicit `t1 + t2 + ... + t64` (left-assoc, same
    IEEE order as the Spark fold); centroid means are exact decimal sums +
    one double divide (dsum convention).  ``src`` (r14) selects the
    training set — the quantizer-REFRESH oracle fits on the union CTE."""
    chain = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        for i in range(1, dim + 1)
    )
    means = ", ".join(
        f"CAST(SUM(CAST(CAST(e.embedding[{i}] AS DOUBLE) AS DECIMAL(38,15)))"
        f" AS DOUBLE) / COUNT(*) AS m{i}"
        for i in range(1, dim + 1)
    )
    clist = "[" + ", ".join(f"m{i}" for i in range(1, dim + 1)) + "]"

    def assign(n: int, prev: str) -> str:
        return f"""a{n} AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM (SELECT e.vec_id, c.cluster, round({chain}, 6) AS dist
          FROM {src} e CROSS JOIN {prev} c))
  WHERE rn = 1)"""

    def update(n: int) -> str:
        return f"""c{n} AS (
  SELECT cluster, {clist} AS centroid FROM (
    SELECT a.cluster, {means}
    FROM a{n} a JOIN {src} e USING (vec_id)
    GROUP BY a.cluster))"""

    parts = [
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT vec_id, embedding FROM {src} ORDER BY vec_id LIMIT {k}))"""
    ]
    for it in range(1, iters + 1):
        parts.append(assign(it, f"c{it - 1}"))
        parts.append(update(it))
    parts.append(assign(iters + 1, f"c{iters}"))
    return parts, f"c{iters}"


def _kmeans_sql() -> str:
    parts, _ = _kmeans_parts()
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT vec_id, cluster, dist AS dist_sq FROM a{2 + 1}"
    )


ORACLE["kmeans_train"] = _kmeans_sql()


def _ivf_kmeans_sql(
    dim: int = 64, probe: int = 2, top_k: int = 5, src: str = "embeddings"
) -> str:
    """IVF search over the trained quantizer: index cells = argmin
    assignment (the kmeans CTEs' final a3), probe cells = top-`probe`
    nearest centroids per query, exact cosine within probed cells.
    ``src`` restricts the SEARCHED vector set (queries + index members)
    while the quantizer CTEs stay trained on the full corpus — the
    frozen-quantizer delete/ingest contract."""
    parts, final_c = _kmeans_parts(dim=dim)
    chain = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        for i in range(1, dim + 1)
    )
    parts.append(
        f"""s AS (
  SELECT vec_id, cluster, rn FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM (SELECT e.vec_id, c.cluster, round({chain}, 6) AS dist
          FROM {src} e CROSS JOIN {final_c} c))
  WHERE rn <= {probe})"""
    )
    parts.append(
        f"""v AS (
  SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
  FROM {src})"""
    )
    parts.append(
        f"""p AS (
  SELECT q.vec_id AS vec_id, i.vec_id AS neighbor_id,
         round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos_sim
  FROM (SELECT vec_id, cluster FROM s WHERE rn <= {probe}) q
  JOIN (SELECT vec_id, cluster FROM s WHERE rn = 1) i
    ON q.cluster = i.cluster AND q.vec_id <> i.vec_id
  JOIN v a ON a.vec_id = q.vec_id
  JOIN v b ON b.vec_id = i.vec_id)"""
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM p)
WHERE rank <= {top_k}"""
    )


ORACLE["ann_ivf_kmeans"] = _ivf_kmeans_sql()


def _ivf_nprobe_sweep_sql(dim: int = 64, k_cells: int = 10) -> str:
    """nprobe sweep: probe ranks off the same trained quantizer CTEs
    (identical round-6 sq-dist + cell tiebreak total order), recall and
    scanned cost as pure integer arithmetic, ratios through the portable
    floor chain — mirrors operators.similarity.ann_ivf_nprobe_sweep."""
    from .operators.similarity import NPROBE_RECALL_TARGET, PQ_QUERY_MOD

    parts, final_c = _kmeans_parts(dim=dim)
    chain = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        for i in range(1, dim + 1)
    )
    parts.append(
        f"""qs AS (
  SELECT vec_id, cluster, rn FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM (SELECT e.vec_id, c.cluster, round({chain}, 6) AS dist
          FROM embeddings e CROSS JOIN {final_c} c
          WHERE e.vec_id % {PQ_QUERY_MOD} = 0)))"""
    )
    parts.append(
        f"""gt AS (
  SELECT vec_id AS qid, neighbor_id
  FROM ({ORACLE['ann_cosine_topk']}) WHERE vec_id % {PQ_QUERY_MOD} = 0)"""
    )
    parts.append(
        """gtr AS (
  SELECT qs.rn AS probe_rank
  FROM gt JOIN a3 m ON gt.neighbor_id = m.vec_id
  JOIN qs ON qs.vec_id = gt.qid AND qs.cluster = m.cluster)"""
    )
    parts.append("cellsz AS (SELECT cluster, count(*) AS cell_n FROM a3 GROUP BY 1)")
    parts.append(
        "csz AS (SELECT qs.rn AS probe_pos, cell_n FROM qs JOIN cellsz USING (cluster))"
    )
    parts.append(
        f"ns AS (SELECT unnest(generate_series(1, {k_cells})) AS nprobe)"
    )
    parts.append(
        """rec AS (
  SELECT nprobe,
         CAST(sum(CASE WHEN probe_rank <= nprobe THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM gtr CROSS JOIN ns GROUP BY 1)"""
    )
    parts.append(
        """scn AS (
  SELECT nprobe,
         CAST(sum(CASE WHEN probe_pos <= nprobe THEN cell_n ELSE 0 END) AS BIGINT) AS scanned_rows
  FROM csz CROSS JOIN ns GROUP BY 1)"""
    )
    parts.append(
        """tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_gt,
         CAST(count(DISTINCT qid) AS BIGINT) AS n_q FROM gt)"""
    )
    parts.append("nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM embeddings)")
    parts.append(
        """sel AS (
  SELECT CAST(rec.nprobe AS BIGINT) AS nprobe, n_hits,
         floor(CAST(n_hits AS DOUBLE) / CAST(n_gt AS DOUBLE) * 1000000.0 + 0.5)
           / 1000000.0 AS recall_at_k,
         scanned_rows,
         floor(CAST(scanned_rows AS DOUBLE) / CAST(n_q * n_vec AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0 AS scanned_frac
  FROM rec JOIN scn ON rec.nprobe = scn.nprobe CROSS JOIN tot CROSS JOIN nv)"""
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT nprobe, n_hits, recall_at_k, scanned_rows, scanned_frac,
       nprobe = min(CASE WHEN recall_at_k >= {NPROBE_RECALL_TARGET} THEN nprobe END)
                  OVER () AS chosen
FROM sel"""
    )


ORACLE["ann_ivf_nprobe_sweep"] = _ivf_nprobe_sweep_sql()

# Persisted-index IVF serve: identical pairs/ranks as the in-memory IVF,
# restricted to the deterministic cell-0 query set.
ORACLE["ann_ivf_persisted"] = f"""
SELECT * FROM ({ORACLE["ann_ivf_kmeans"]})
WHERE vec_id IN (
  SELECT vec_id FROM ({ORACLE["kmeans_train"]}) WHERE cluster = 0)
"""

# Streaming IVF ingest: after the epochs drain + ranged OPTIMIZE, the
# serve must equal the same full-corpus IVF the persisted index serves.
ORACLE["stream_ivf_index_ingest"] = ORACLE["ann_ivf_persisted"]

# Incremental IVF maintenance: after batch append + ranged OPTIMIZE the
# served answers must equal the in-memory IVF over the UNIONED corpus —
# the oracle recomputes exactly that from raw parquet; neighbor_is_batch
# marks results only searchable because the ingest landed (FAISS's
# add-then-search contract, mirrored from operators.similarity).
from .operators.similarity import IVF_INGEST_MOD as _IVF_INGEST_MOD

ORACLE["ann_ivf_incremental"] = f"""
SELECT vec_id, neighbor_id, cos_sim, rank,
       neighbor_id % {_IVF_INGEST_MOD} = 0 AS neighbor_is_batch
FROM ({ORACLE["ann_ivf_kmeans"]})
WHERE vec_id IN (
  SELECT vec_id FROM ({ORACLE["kmeans_train"]}) WHERE cluster = 0)
"""

# Tombstone DELETE on the IVF index: after the delete-applying ranged
# OPTIMIZE, answers equal the in-memory IVF over the REMAINING corpus
# under the frozen full-corpus quantizer.
from .operators.similarity import IVF_DELETE_MOD as _IVF_DEL_MOD
from .operators.similarity import IVF_DELETE_REM as _IVF_DEL_REM

_IVF_REMAINING = (
    f"(SELECT * FROM embeddings WHERE vec_id % {_IVF_DEL_MOD}"
    f" <> {_IVF_DEL_REM})"
)
ORACLE["ann_ivf_delete_vectors"] = f"""
SELECT * FROM ({_ivf_kmeans_sql(src=_IVF_REMAINING)})
WHERE vec_id IN (
  SELECT vec_id FROM ({ORACLE["kmeans_train"]}) WHERE cluster = 0)
  AND vec_id % {_IVF_DEL_MOD} <> {_IVF_DEL_REM}
"""

ORACLE["dsir_importance"] = """
WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents),
vocab AS (SELECT word, count(*) AS c_all,
                 sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
          FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS tot_all,
               CAST(sum(c_tgt) AS BIGINT) AS tot_tgt,
               count(*) AS v
        FROM vocab),
scored AS (
  SELECT doc_id,
         CAST(floor((CAST(c_tgt + 1 AS DOUBLE) * CAST(tot_all + v AS DOUBLE))
               / (CAST(c_all + 1 AS DOUBLE) * CAST(tot_tgt + v AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS r_micros
  FROM tok JOIN vocab USING (word), tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST((2 * CAST(sum(r_micros) AS BIGINT) + count(*))
            // (2 * count(*)) AS BIGINT) AS avg_importance_micros,
       CAST(sum(r_micros) AS BIGINT) > count(*) * 1000000 AS is_target_like
FROM scored GROUP BY 1
"""

ORACLE["bpe_merge_topk"] = """
WITH w AS (
  SELECT word FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) >= 2),
p AS (
  SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                               i -> substr(word, CAST(i AS INT), 2))) AS pair
  FROM w),
c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY 1)
SELECT pair, CAST(cnt AS BIGINT) AS cnt, merge_rank FROM (
  SELECT pair, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS merge_rank
  FROM c)
WHERE merge_rank <= 20
"""

ORACLE["media_phash"] = f"""
WITH b AS (
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents),
h AS (SELECT doc_id, {_HIST} FROM b),
ph AS (
  SELECT doc_id,
         CAST({" + ".join(f"(CASE WHEN hist_{i} * 8 > ({' + '.join(f'hist_{j}' for j in range(8))}) THEN {1 << i} ELSE 0 END)" for i in range(8))} AS BIGINT) AS phash
  FROM h),
c AS (SELECT phash, count(*) AS n FROM ph GROUP BY 1)
SELECT doc_id, phash, CAST(n AS BIGINT) AS n_same_hash, n > 1 AS is_dup_candidate
FROM ph JOIN c USING (phash)
"""


def _phash64_bit_terms() -> str:
    """64 aHash bit terms: block i's byte sum vs the global sum,
    cross-multiplied (no division).  Block slice is the 1-based-inclusive
    image of Python's data[i*n//64 : (i+1)*n//64]; empty slices list_sum to
    NULL, coalesced to 0 on both factors.  Bit 63 adds the signed-min
    literal so the SQL value equals Spark's two's-complement long."""
    terms = []
    for i in range(64):
        lo = f"(({i} * n) // 64)"
        hi = f"((({i} + 1) * n) // 64)"
        bit = (
            f"(CASE WHEN coalesce(list_sum(bytes[{lo} + 1 : {hi}]), 0) * n"
            f" > total * ({hi} - {lo})"
            f" THEN {(-9223372036854775807 - 1) if i == 63 else (1 << i)} ELSE 0 END)"
        )
        terms.append(bit)
    return " + ".join(terms)


# Banded-Hamming media near-dup: identical band join as the Spark side —
# banding is pigeonhole-exact for Hamming <= 7 over 8 bands, so neither
# engine loses recall.  DuckDB's >> is an arithmetic shift like Spark's
# shiftright; the & 255 mask makes the band bytes agree for negative hashes.
ORACLE["media_phash_near_dup"] = f"""
WITH b AS (
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents),
h AS (
  SELECT doc_id, bytes, len(bytes) AS n,
         coalesce(list_sum(bytes), 0) AS total
  FROM b),
ph0 AS (
  SELECT doc_id, CAST({{BITS}} AS BIGINT) AS phash64
  FROM h),
-- recall canaries: every 100th fingerprint re-emitted under
-- doc_id + 1e9 with bits 0/17/42 flipped (a planted Hamming-3 neighbor
-- the banded join must recover) — identical derivation on the Spark side
ph AS (
  SELECT doc_id, phash64 FROM ph0
  UNION ALL
  SELECT doc_id + 1000000000,
         CAST(xor(phash64, CAST(4398046642177 AS BIGINT)) AS BIGINT)
  FROM ph0 WHERE doc_id % 100 = 0),
bands AS (
  SELECT doc_id, phash64, bnd AS band, (phash64 >> (8 * bnd)) & 255 AS val
  FROM ph, UNNEST(range(0, 8)) AS t(bnd)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash64 AS ph_a, b.phash64 AS ph_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 7
""".replace("{BITS}", _phash64_bit_terms())


# -- round 5: semantic curation over the shared k-means quantizer ----------

def _semantic_dedup_sql(threshold: float = 0.3) -> str:
    """SemDeDup: final k-means assignment (the kmeans CTEs' a3), pairwise
    cosine within each cell against LOWER-id members only."""
    parts, _ = _kmeans_parts()
    parts.append(_NORMED_V.strip())
    parts.append(f"""m AS (
  SELECT a.vec_id,
         max(round({_dot_sql('va.embedding', 'vb.embedding')} / (va.nrm * vb.nrm), 6)) AS max_cos_lower
  FROM a3 a
  JOIN a3 b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
  GROUP BY a.vec_id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT a.vec_id, a.cluster, m.max_cos_lower,
       coalesce(m.max_cos_lower >= {threshold}, FALSE) AS is_dup
FROM a3 a LEFT JOIN m USING (vec_id)"""
    )


ORACLE["semantic_dedup"] = _semantic_dedup_sql()


def _prototypicality_sql(keep_num: int = 9, keep_den: int = 10) -> str:
    parts, _ = _kmeans_parts()
    return (
        "WITH " + ",\n".join(parts)
        + f""",
r AS (
  SELECT vec_id, cluster, dist AS dist_sq,
         CAST(row_number() OVER (PARTITION BY cluster
                                 ORDER BY dist ASC, vec_id ASC) AS BIGINT) AS proto_rank,
         CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_cluster
  FROM a3)
SELECT vec_id, cluster, dist_sq, proto_rank, n_cluster,
       (proto_rank * {keep_den} > n_cluster * {keep_num}) AS is_pruned
FROM r"""
    )


ORACLE["embedding_prototypicality"] = _prototypicality_sql()

ORACLE["vocab_oov_rate"] = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
freq AS (SELECT word, count(*) AS cnt FROM tok GROUP BY 1),
vocab AS (SELECT word FROM (
  SELECT word, row_number() OVER (ORDER BY cnt DESC, word ASC) AS rn FROM freq)
  WHERE rn <= 16),
per_doc AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM tok t LEFT JOIN vocab v USING (word)
  GROUP BY t.doc_id)
SELECT doc_id, n_tokens, n_oov,
       round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS oov_rate
FROM per_doc
"""

ORACLE["train_test_split"] = f"""
WITH b AS (
  SELECT doc_id,
         {_h("concat_ws(chr(1), 'split', CAST(doc_id AS VARCHAR))")} % 100 AS bucket
  FROM documents)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


ORACLE["build_inverted_index"] = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT word, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT word,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       array_to_string(
         list_slice(
           list(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR) ORDER BY doc_id),
           1, 1000),
         ',') AS postings_csv
FROM tf GROUP BY word
"""


def _bm25_sql(terms: tuple = ("join", "spark", "table"), top_k: int = 20) -> str:
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf_{t}" for t in terms
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in terms
    )
    # EXACTLY the Spark association order: ((idf * (tf*2.5)) / denom),
    # summed left-to-right in BM25_QUERY order — bit-identical IEEE chains.
    score = " + ".join(
        f"((CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{t} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{t} AS DOUBLE) * 2.5)"
        f" / (CAST(tf_{t} AS DOUBLE) + 1.5 * (0.25 + 0.75"
        f" * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        for t in terms
    )
    tf_list = ", ".join(f"tf_{t}" for t in terms)
    return f"""
WITH s AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, string_split(text, ' ') AS w, text FROM documents)),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM s),
scored AS (
  SELECT doc_id, dl, {tf_list}, round({score}, 6) AS bm25
  FROM s, g)
SELECT doc_id, dl, {tf_list}, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
FROM scored WHERE bm25 > 0
ORDER BY bm25 DESC, doc_id ASC LIMIT {top_k}
"""


ORACLE["bm25_topk"] = _bm25_sql()


# Streaming sessionizer emitted-set oracle: batch sessionization + the
# deterministic closure rule (arrival-closed = every non-last session;
# timeout-closed = last session iff final watermark passed end + gap).
ORACLE["stream_sessionize_events"] = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked),
agg AS (
  SELECT user_id, session_id,
         min(ts) AS session_start,
         max(ts) AS session_end,
         CAST(count(*) AS BIGINT) AS n_events,
         round({_dsum('value')}, 6) AS session_revenue
  FROM sess GROUP BY 1, 2),
last AS (SELECT user_id, max(session_id) AS last_sid FROM agg GROUP BY 1),
mx AS (SELECT max(ts) AS max_ts FROM events)
SELECT a.user_id, a.session_start, a.session_end, a.n_events, a.session_revenue
FROM agg a JOIN last l USING (user_id), mx
WHERE a.session_id < l.last_sid
   OR epoch_us(a.session_end) + 1800 * 1000000
      < epoch_us(max_ts) - 1800 * 1000000
"""


ORACLE["temperature_mix_weights"] = """
WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
w AS (
  SELECT lang, n_docs,
         CAST(sum(n_docs) OVER ww AS BIGINT) AS total_docs,
         sqrt(CAST(n_docs AS DOUBLE)) AS w_raw,
         sum(sqrt(CAST(n_docs AS DOUBLE))) OVER ww AS w_total
  FROM counts
  WINDOW ww AS (ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT lang, n_docs,
       round(CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE), 6) AS p_lang,
       round(w_raw / w_total, 6) AS mix_weight,
       CAST(floor(w_raw / w_total * CAST(total_docs AS DOUBLE) + 0.5) AS BIGINT) AS expected_docs
FROM w
"""


def _hybrid_search_sql(top_k: int = 20, rrf_k: float = 60.0) -> str:
    return f"""
WITH {_NORMED_V.strip().rstrip()},
sem_top AS (
  SELECT a.vec_id AS doc_id,
         round({_dot_sql('a.embedding', 'q.embedding')} / (a.nrm * q.nrm), 6) AS cos_sim
  FROM v a, (SELECT embedding, nrm FROM v WHERE vec_id = 0) q
  WHERE a.vec_id <> 0
  ORDER BY cos_sim DESC, a.vec_id ASC LIMIT {top_k}),
sem AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT) AS sem_rank
  FROM sem_top),
lex AS (SELECT doc_id, rank AS lex_rank FROM ({ORACLE['bm25_topk']})),
f AS (
  SELECT doc_id, lex_rank, sem_rank,
         round(coalesce(1.0 / ({rrf_k} + CAST(lex_rank AS DOUBLE)), 0.0)
             + coalesce(1.0 / ({rrf_k} + CAST(sem_rank AS DOUBLE)), 0.0), 6) AS rrf
  FROM lex FULL OUTER JOIN sem USING (doc_id))
SELECT doc_id, lex_rank, sem_rank, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
FROM f
"""


ORACLE["hybrid_search_topk"] = _hybrid_search_sql()


# RESTORE VERSION AS OF 2: after the rollback commit, the CURRENT read
# must equal the one-shot A1 aggregation over only epochs 0-1.
ORACLE["txlog_restore_version"] = f"""
SELECT date_trunc('hour', ts) AS hour,
       {_CAT} AS category,
       count(*) AS order_count,
       {_dsum('value')} AS total_revenue,
       CAST(sum({_QTY}) AS BIGINT) AS total_quantity
FROM events
WHERE event_type = 'purchase' AND event_id % 4 IN (0, 1)
GROUP BY 1, 2
"""


# Time travel: the AS-OF-version-2 read must equal the one-shot A1
# aggregation over ONLY the first two appended epochs.
ORACLE["txlog_time_travel"] = f"""
SELECT date_trunc('hour', ts) AS hour,
       {_CAT} AS category,
       count(*) AS order_count,
       {_dsum('value')} AS total_revenue,
       CAST(sum({_QTY}) AS BIGINT) AS total_quantity
FROM events
WHERE event_type = 'purchase' AND event_id % 4 IN (0, 1)
GROUP BY 1, 2
"""


# system.parts analog: per appended epoch (event_id % 4 -> commit order),
# the independent construction of each part's row count, order volume and
# hour range — all exact integers/timestamps.
ORACLE["table_parts_report"] = f"""
WITH p AS (
  SELECT event_id % 4 AS part0, date_trunc('hour', ts) AS hour,
         {_CAT} AS category, count(*) AS c
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3)
SELECT CAST(part0 + 1 AS BIGINT) AS part_seq,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c) AS BIGINT) AS n_orders,
       min(hour) AS min_hour,
       max(hour) AS max_hour
FROM p GROUP BY 1
"""


# TTL ... TO VOLUME tiering: tier = month CASE against the cutoff; the
# equality proves the metadata-only moves conserved and placed every row.
ORACLE["ttl_move_tiering"] = f"""
SELECT CASE WHEN year(o_orderdate) * 100 + month(o_orderdate) < 199901
            THEN 'cold' ELSE 'hot' END AS tier,
       CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY 1, 2
"""


# GDPR delete audit: the month-partitioned table after erasing the minimum
# custkey must equal orders minus that customer, month-aggregated.
ORACLE["gdpr_delete_audit"] = f"""
WITH victim AS (SELECT min(o_custkey) AS k FROM orders)
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_dsum('o_totalprice')} AS total_revenue
FROM orders, victim
WHERE o_custkey <> k
GROUP BY 1
"""


# Watermarked tumbling-window MV: append mode finalizes a window when the
# watermark (max ts - 2h delay) passes its end, so emitted == A1 rollup
# restricted to finalized hours.
ORACLE["stream_windowed_rollup_events"] = f"""
SELECT hour, category, order_count, total_revenue, total_quantity
FROM ({_A1}) a, (SELECT max(ts) AS max_ts FROM events) m
WHERE a.hour + INTERVAL 1 HOUR <= m.max_ts - INTERVAL 2 HOUR
"""


# Stream-stream join: emitted pairs == the batch key+range join over the
# same derived ack stream (hash-split in/out of the 1-hour window).
ORACLE["stream_join_orders_acks"] = f"""
WITH o AS (
  SELECT o_orderkey AS order_id,
         CAST(o_orderdate AS TIMESTAMP) AS order_timestamp,
         o_totalprice AS total_amount
  FROM orders),
a AS (
  SELECT order_id,
         CASE WHEN {_h("CAST(order_id AS VARCHAR)")} % 2 = 0
              THEN order_timestamp + INTERVAL 10 MINUTE
              ELSE order_timestamp + INTERVAL 3 HOUR END AS ack_timestamp,
         'ok' AS ack_status
  FROM o)
SELECT o.order_id, o.order_timestamp, a.ack_timestamp, a.ack_status, o.total_amount
FROM o JOIN a ON o.order_id = a.order_id
 AND a.ack_timestamp >= o.order_timestamp
 AND a.ack_timestamp <= o.order_timestamp + INTERVAL 1 HOUR
"""


# ------------------------------------------- r5 statistical aggregates

ORACLE["value_quantity_correlation"] = f"""
WITH agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         sum(q) AS sy_long,
         CAST(sum(CAST(value * CAST(q AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
         sum(q * q) AS syy_long
  FROM (SELECT event_type, value, {_QTY} AS q FROM events)
  GROUP BY 1)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * sxy - sx * CAST(sy_long AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * CAST(syy_long AS DOUBLE)
                       - CAST(sy_long AS DOUBLE) * CAST(sy_long AS DOUBLE))),
             6) AS corr_value_quantity
FROM agg
"""

ORACLE["value_histogram"] = f"""
WITH ext AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
b AS (
  SELECT CAST(least(9.0, floor((value - mn) * 10.0 / greatest(mx - mn, 1e-30))) AS BIGINT) AS bin,
         value
  FROM events, ext)
SELECT bin, CAST(count(*) AS BIGINT) AS n_events, {_dsum('value')} AS total_value
FROM b GROUP BY bin
"""

ORACLE["daily_revenue_trend"] = f"""
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x, rev
  FROM (SELECT CAST(ts AS DATE) AS day, {_dsum('value')} AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1)),
agg AS (
  SELECT count(*) AS n, sum(x) AS sx_long,
         CAST(sum(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(x AS DOUBLE) * rev AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
         sum(x * x) AS sxx_long
  FROM daily)
SELECT n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx_long AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx_long AS DOUBLE)
                - CAST(sx_long AS DOUBLE) * CAST(sx_long AS DOUBLE)), 6) AS slope_per_day,
       round((sy - (CAST(n AS DOUBLE) * sxy - CAST(sx_long AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * CAST(sxx_long AS DOUBLE)
                      - CAST(sx_long AS DOUBLE) * CAST(sx_long AS DOUBLE))
                   * CAST(sx_long AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
FROM agg
"""


# Zone-map pruned read: the pruned+filtered time-range read equals the A1
# rollup restricted to the second epoch-hour quarter.
ORACLE["txlog_pruned_read"] = f"""
WITH a AS (
  SELECT date_trunc('hour', ts) AS hour,
         {_CAT} AS category,
         count(*) AS order_count,
         {_dsum('value')} AS total_revenue,
         CAST(sum({_QTY}) AS BIGINT) AS total_quantity,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour_epoch
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2, 6),
ext AS (SELECT min(hour_epoch) AS mn, max(hour_epoch) AS mx FROM a)
SELECT hour, category, order_count, total_revenue, total_quantity
FROM a, ext
WHERE hour_epoch >= mn + (mx - mn + 1) * 1 // 4
  AND hour_epoch <  mn + (mx - mn + 1) * 2 // 4
"""

# Bucketed co-located join: results must equal the plain join+aggregate.
ORACLE["bucketed_orders_lineitem_join"] = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       {_dsum('l_extendedprice')} AS total_revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""


ORACLE["dense_hourly_series"] = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         count(*) AS order_count, {_dsum('value')} AS total_revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
axis AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds)
SELECT axis.hour,
       CAST(coalesce(order_count, 0) AS BIGINT) AS order_count,
       coalesce(total_revenue, 0.0) AS total_revenue
FROM axis LEFT JOIN hourly ON axis.hour = hourly.hour
"""

ORACLE["similar_customer_names"] = """
WITH c AS (
  SELECT c_custkey, c_nationkey, c_name, length(c_name) AS ln,
         row_number() OVER (PARTITION BY c_nationkey, length(c_name)
                            ORDER BY c_name, c_custkey) AS rn
  FROM customer)
SELECT least(a.c_custkey, b.c_custkey) AS cust_a,
       greatest(a.c_custkey, b.c_custkey) AS cust_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
FROM c a JOIN c b
  ON a.c_nationkey = b.c_nationkey AND a.ln = b.ln
 AND b.rn > a.rn AND b.rn - a.rn <= 10
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


# The min-chain funnel CTEs, shared by funnel_steps and funnel_step_latency.
_FUNNEL_CTES = """s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts >= s1.t1
    AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s2.t2
    AND e.ts <= s2.t2 + INTERVAL 24 HOUR GROUP BY 1),
s4 AS (
  SELECT e.user_id, min(ts) AS t4 FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s3.t3
    AND e.ts <= s3.t3 + INTERVAL 24 HOUR GROUP BY 1)"""

ORACLE["funnel_steps"] = f"""
WITH {_FUNNEL_CTES},
per_user AS (
  SELECT u.user_id,
         CASE WHEN s4.user_id IS NOT NULL THEN 4
              WHEN s3.user_id IS NOT NULL THEN 3
              WHEN s2.user_id IS NOT NULL THEN 2
              WHEN s1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS steps_completed
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
  LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id))
SELECT CAST(steps_completed AS BIGINT) AS steps_completed,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1
"""


ORACLE["cohort_retention"] = """
WITH activity AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
  FROM events WHERE event_type = 'purchase'),
first AS (SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY 1),
sizes AS (SELECT cohort_day, count(*) AS cohort_users FROM first GROUP BY 1),
matrix AS (
  SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
         CAST(count(*) AS BIGINT) AS active_users
  FROM activity a JOIN first f USING (user_id)
  GROUP BY 1, 2)
SELECT m.cohort_day, m.day_offset, m.active_users,
       round(CAST(m.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6) AS retention
FROM matrix m JOIN sizes s USING (cohort_day)
"""


ORACLE["brand_basket_lift"] = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS okey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
totals AS (SELECT count(DISTINCT okey) AS n_orders FROM baskets),
brand_n AS (SELECT p_brand, count(*) AS n_brand FROM baskets GROUP BY 1),
co AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_co
  FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.p_brand < b.p_brand
  GROUP BY 1, 2)
SELECT brand_a, brand_b, n_co,
       CAST(na.n_brand AS BIGINT) AS n_a,
       CAST(nb.n_brand AS BIGINT) AS n_b,
       round(CAST(n_co AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(na.n_brand AS DOUBLE) * CAST(nb.n_brand AS DOUBLE)), 6) AS lift
FROM co
JOIN brand_n na ON na.p_brand = co.brand_a
JOIN brand_n nb ON nb.p_brand = co.brand_b
CROSS JOIN totals
"""


# Media near-dup clusters: transitive closure over the phash pair graph
# (pairs are LSH-banding-bounded, so the recursive closure stays tiny);
# cluster label = min reachable doc_id, mirroring union-find min-labels.
ORACLE["media_phash_clusters"] = f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({ORACLE['media_phash_near_dup']})),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
  UNION SELECT doc_a, doc_a FROM pairs
  UNION SELECT doc_b, doc_b FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY 1
"""


# Media near-dup-on-arrival (r13): the 4-epoch acceptance recursion
# unrolled as chained MATERIALIZED CTEs (the curation-oracle precedent),
# with BRUTE-FORCE Hamming candidacy — an INDEPENDENT construction (the
# engine probes a banded index; pigeonhole proves band-join candidacy ==
# all-pairs candidacy for the <= 7 threshold).  Arrival order 2,0,3,1;
# canaries shift one epoch over (+1000000001 ≡ +1 mod 4).  The matched
# pick is the packed key min(hamming*1e10 + doc_id) — equal to the
# engine's struct-extrema argmin over (hamming, doc_id) BECAUSE fixture
# doc ids (incl. canary offsets ~2e9) are < 1e10 at every SF; the
# engine itself no longer packs (r14, no id-width bound there).
ORACLE["stream_media_ingest"] = f"""
WITH b AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents),
h AS MATERIALIZED (
  SELECT doc_id, bytes, len(bytes) AS n,
         coalesce(list_sum(bytes), 0) AS total
  FROM b),
ph0 AS MATERIALIZED (
  SELECT doc_id, CAST({{BITS}} AS BIGINT) AS phash64
  FROM h),
ph AS MATERIALIZED (
  SELECT doc_id, phash64, doc_id % 4 AS e,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END
           AS format
  FROM (SELECT doc_id, phash64 FROM ph0
        UNION ALL
        SELECT doc_id + 1000000001,
               CAST(xor(phash64, CAST(4398046642177 AS BIGINT)) AS BIGINT)
        FROM ph0 WHERE doc_id % 100 = 0
        UNION ALL
        -- exact-copy canaries: unchanged fingerprint, epoch +2
        SELECT doc_id + 1000000002, phash64
        FROM ph0 WHERE doc_id % 100 = 50)),
acc0 AS MATERIALIZED (SELECT doc_id, phash64 FROM ph WHERE e = 2),
hit1 AS MATERIALIZED (
  SELECT a.doc_id,
         min(bit_count(xor(a.phash64, x.phash64)) * 10000000000 + x.doc_id)
           AS mkey
  FROM ph a JOIN acc0 x ON bit_count(xor(a.phash64, x.phash64)) <= 7
  WHERE a.e = 0 GROUP BY 1),
acc1 AS MATERIALIZED (
  SELECT doc_id, phash64 FROM ph
  WHERE e = 0 AND doc_id NOT IN (SELECT doc_id FROM hit1)),
idx1 AS MATERIALIZED (
  SELECT * FROM acc0 UNION ALL SELECT * FROM acc1),
hit2 AS MATERIALIZED (
  SELECT a.doc_id,
         min(bit_count(xor(a.phash64, x.phash64)) * 10000000000 + x.doc_id)
           AS mkey
  FROM ph a JOIN idx1 x ON bit_count(xor(a.phash64, x.phash64)) <= 7
  WHERE a.e = 3 GROUP BY 1),
acc2 AS MATERIALIZED (
  SELECT doc_id, phash64 FROM ph
  WHERE e = 3 AND doc_id NOT IN (SELECT doc_id FROM hit2)),
idx2 AS MATERIALIZED (
  SELECT * FROM idx1 UNION ALL SELECT * FROM acc2),
hit3 AS MATERIALIZED (
  SELECT a.doc_id,
         min(bit_count(xor(a.phash64, x.phash64)) * 10000000000 + x.doc_id)
           AS mkey
  FROM ph a JOIN idx2 x ON bit_count(xor(a.phash64, x.phash64)) <= 7
  WHERE a.e = 1 GROUP BY 1),
acc3 AS MATERIALIZED (
  SELECT doc_id, phash64 FROM ph
  WHERE e = 1 AND doc_id NOT IN (SELECT doc_id FROM hit3)),
kept AS MATERIALIZED (
  SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1
  UNION ALL SELECT doc_id FROM acc2 UNION ALL SELECT doc_id FROM acc3),
allhits AS MATERIALIZED (
  SELECT doc_id, mkey FROM hit1
  UNION ALL SELECT doc_id, mkey FROM hit2
  UNION ALL SELECT doc_id, mkey FROM hit3)
SELECT p.format,
       CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(count(k.doc_id) AS BIGINT) AS n_kept,
       CAST(count(CASE WHEN hq.mkey // 10000000000 = 0 THEN 1 END) AS BIGINT)
         AS n_exact_quarantined,
       CAST(count(CASE WHEN hq.mkey // 10000000000 > 0 THEN 1 END) AS BIGINT)
         AS n_near_dup_quarantined
FROM ph p
LEFT JOIN kept k ON p.doc_id = k.doc_id
LEFT JOIN allhits hq ON p.doc_id = hq.doc_id
GROUP BY 1
""".replace("{BITS}", _phash64_bit_terms())


# Streaming dedup: injected redeliveries (every 50th event twice) must
# collapse back to exactly the original distinct events.
ORACLE["stream_dedup_events"] = """
SELECT event_id, ts, user_id, value FROM events
"""


# Salted two-phase top-k == the plain windowed top-k (physical rewrite only).
ORACLE["top_orders_per_priority_salted"] = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(rn AS BIGINT) AS rank_in_group
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders)
WHERE rn <= 20
"""


# DSIR resampling: deterministic hash-threshold acceptance under the
# clamped, halved importance weight.
ORACLE["dsir_resample"] = f"""
WITH s AS (SELECT doc_id, avg_importance_micros FROM ({ORACLE['dsir_importance']}))
SELECT d.doc_id, d.lang, s.avg_importance_micros
FROM documents d JOIN s USING (doc_id)
WHERE {_h("concat_ws(chr(1), 'dsir', CAST(d.doc_id AS VARCHAR))")} % 1000000
      < least(s.avg_importance_micros, 2000000) // 2
"""


# ------------------------------------------------------- r5 window analytics

_DAILY_REV_DEC = """
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DECIMAL(14,2)) AS rev_dec
  FROM orders GROUP BY 1
"""


def _ewma_sql(n_lags: int = 20) -> str:
    # Pure-double formulation mirroring the Spark side bit for bit: weights
    # 0.5^k are powers of two (exact exponent-shift multiplies), sums are
    # fixed left-associated, the 6-place truncation is floor-based (no ties).
    num_terms, den_terms, lag_cols = [], [], []
    for k in range(n_lags):
        w = repr(0.5**k)
        src = ("daily_revenue" if k == 0
               else f"lag(daily_revenue, {k}) OVER (ORDER BY order_date)")
        lag_cols.append(f"{src} AS x{k}")
        num_terms.append(f"CASE WHEN x{k} IS NOT NULL THEN x{k} * {w} ELSE 0.0 END")
        den_terms.append(f"CASE WHEN x{k} IS NOT NULL THEN {w} ELSE 0.0 END")
    return f"""
WITH daily AS (
  SELECT order_date, CAST(rev_dec AS DOUBLE) AS daily_revenue
  FROM ({_DAILY_REV_DEC})
),
lagged AS (SELECT order_date, daily_revenue, {', '.join(lag_cols)} FROM daily)
SELECT order_date, daily_revenue,
       CAST(floor(({' + '.join(num_terms)}) / ({' + '.join(den_terms)})
                  * 1000000.0) AS DOUBLE) / 1000000.0 AS revenue_ewma
FROM lagged
"""


ORACLE["ewma_daily_revenue"] = _ewma_sql()


# Trailing z>2 anomaly test with sqrt eliminated:
#   (n-1)*(n*x - S1)^2 > 4*n*(n*S2 - S1^2)  — exact decimal throughout.
ORACLE["revenue_anomaly_days"] = f"""
WITH daily AS ({_DAILY_REV_DEC}),
stats AS (
  SELECT order_date, rev_dec,
         count(*) OVER w AS n_trailing,
         CAST(sum(rev_dec) OVER w AS DECIMAL(19,2)) AS s1,
         -- widen one operand first: DuckDB caps a DECIMAL(14)*DECIMAL(14)
         -- product at DECIMAL(18), which overflows at sf>=0.1 magnitudes
         CAST(sum(CAST(CAST(rev_dec AS DECIMAL(19,2)) * rev_dec AS DECIMAL(25,4)))
              OVER w AS DECIMAL(25,4)) AS s2
  FROM daily
  WINDOW w AS (ORDER BY order_date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT order_date,
       CAST(rev_dec AS DOUBLE) AS daily_revenue,
       CAST(n_trailing AS BIGINT) AS n_trailing,
       CASE WHEN n_trailing >= 3 THEN
         CAST(CAST(CAST(n_trailing AS DECIMAL(2,0)) * rev_dec - s1 AS DECIMAL(19,2))
              * CAST(CAST(n_trailing AS DECIMAL(2,0)) * rev_dec - s1 AS DECIMAL(19,2))
              AS DECIMAL(34,4))
         * CAST(n_trailing - 1 AS DECIMAL(2,0))
         >
         CAST(CAST(n_trailing AS DECIMAL(2,0)) * s2 - s1 * s1 AS DECIMAL(33,4))
         * CAST(n_trailing * 4 AS DECIMAL(3,0))
       ELSE FALSE END AS is_anomaly
FROM stats
"""


# Mergeable HLL rollup: oracle pins the exact daily distincts and asserts
# the sketch-merge contract held (TRUE column).
ORACLE["sketch_rollup_distinct_users"] = """
SELECT CAST(ts AS DATE) AS day,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS merged_sketch_within_2pct
FROM events GROUP BY 1
"""


# UDTF sentence expansion: literal '. ' split, empties dropped, indices
# re-counted over emitted sentences only.
ORACLE["split_sentences_udtf"] = """
WITH parts AS (
  SELECT doc_id,
         unnest(string_split(text, '. ')) AS sentence,
         unnest(generate_series(1, len(string_split(text, '. ')))) AS raw_ix
  FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY raw_ix) - 1 AS BIGINT)
         AS sentence_ix,
       sentence,
       CAST(length(sentence) AS BIGINT) AS n_chars
FROM parts
WHERE sentence <> ''
"""


# transformWithState running totals: chunk-0 rows carry the chunk-0
# aggregate, chunk-1 rows carry the combined lifetime aggregate (state
# handed across the batch boundary).  Cents are exact integers.
ORACLE["stream_running_totals_events"] = """
WITH c0 AS (
  SELECT user_id, count(*) AS n0,
         SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS cents0
  FROM events WHERE event_id % 2 = 0 GROUP BY 1
),
c1 AS (
  SELECT user_id, count(*) AS n1,
         SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS cents1
  FROM events WHERE event_id % 2 = 1 GROUP BY 1
)
SELECT user_id, CAST(n0 AS BIGINT) AS n_events_so_far,
       CAST(cents0 AS BIGINT) AS revenue_cents_so_far
FROM c0
UNION ALL
SELECT c1.user_id,
       CAST(COALESCE(c0.n0, 0) + c1.n1 AS BIGINT) AS n_events_so_far,
       CAST(COALESCE(c0.cents0, 0) + c1.cents1 AS BIGINT) AS revenue_cents_so_far
FROM c1 LEFT JOIN c0 ON c0.user_id = c1.user_id
"""


# GROUPING SETS with grouping_id disambiguation (DuckDB: GROUPING()).
ORACLE["priority_status_grouping_sets"] = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
         AS grouping_level,
       count(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def _bpe_ctes(steps: int = 3) -> list:
    # Shared CTE chain for BPE training: s0 char-split seqs, per-step pair
    # counts (p_k), argmax pair (t_k), merged seqs (s_k).  replace() applies
    # merges with the same non-overlapping left-to-right semantics as the
    # Spark side.
    S = "chr(31)"
    parts = [
        f"""w AS (
  SELECT word FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) >= 2),
s0 AS (SELECT {S} || regexp_replace(word, '(.)', '\\1' || {S}, 'g') AS seq FROM w)"""
    ]
    for k in range(1, steps + 1):
        prev = f"s{k - 1}"
        parts.append(f"""p{k} AS (
  SELECT unnest(list_transform(generate_series(1, len(sym) - 1),
                               i -> sym[i] || {S} || sym[i + 1])) AS pair
  FROM (SELECT list_filter(string_split(seq, {S}), x -> x <> '') AS sym FROM {prev})),
t{k} AS (
  SELECT pair, count(*) AS cnt FROM p{k} GROUP BY 1
  ORDER BY cnt DESC, pair ASC LIMIT 1)""")
        if k < steps:
            parts.append(f"""s{k} AS (
  SELECT replace(seq,
                 {S} || (SELECT pair FROM t{k}) || {S},
                 {S} || replace((SELECT pair FROM t{k}), {S}, '') || {S}) AS seq
  FROM {prev})""")
    return parts


def _bpe_train_sql(steps: int = 3) -> str:
    S = "chr(31)"
    selects = [
        f"""SELECT CAST({k} AS BIGINT) AS merge_step,
       split_part(pair, {S}, 1) AS "left",
       split_part(pair, {S}, 2) AS "right",
       replace(pair, {S}, '') AS merged,
       CAST(cnt AS BIGINT) AS cnt
FROM t{k}"""
        for k in range(1, steps + 1)
    ]
    return "WITH " + ",\n".join(_bpe_ctes(steps)) + "\n" + "\nUNION ALL\n".join(selects)


ORACLE["bpe_train_merges"] = _bpe_train_sql()


def _bpe_tokenize_sql(steps: int = 3) -> str:
    # Tokenizer application: every word of every doc encoded with the
    # learned merges (scalar subqueries into the shared training CTEs).
    S = "chr(31)"
    seq = f"{S} || regexp_replace(word, '(.)', '\\1' || {S}, 'g')"
    for k in range(1, steps + 1):
        seq = f"""replace({seq},
      {S} || (SELECT pair FROM t{k}) || {S},
      {S} || replace((SELECT pair FROM t{k}), {S}, '') || {S})"""
    ctes = ",\n".join(_bpe_ctes(steps))
    return f"""WITH {ctes},
dw AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''),
enc AS (
  SELECT doc_id, length(word) AS n_chars,
         len(list_filter(string_split({seq}, {S}), x -> x <> '')) AS n_bpe
  FROM dw)
SELECT doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS n_char_tokens,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(floor(CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE)
                  * 1000000.0) AS DOUBLE) / 1000000.0 AS compression
FROM enc GROUP BY doc_id"""


ORACLE["bpe_tokenize_stats"] = _bpe_tokenize_sql()


# One-pass column profile: DuckDB mirrors with a per-column UNION (same
# values; the single-Expand shape is the Spark side's plan property).
ORACLE["events_column_profile"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       count({c}) AS n_nonnull, count(DISTINCT {c}) AS n_distinct
FROM events"""
    for c in ["event_id", "user_id", "event_type", "value", "props"]
)


# mapInArrow L2 norms: left-fold float64 squares (same association as the
# Arrow side), floor-truncated at 6 places; unit-renormalization contract
# pinned TRUE.
ORACLE["embedding_norm_arrow"] = f"""
SELECT vec_id,
       CAST(floor(sqrt({_dot_sql('embedding', 'embedding')}) * 1000000.0) AS DOUBLE)
         / 1000000.0 AS norm_6,
       TRUE AS unit_after_normalize
FROM embeddings
"""


# Winsorized per-type stats: global p05/p95 as a broadcast scalar pair,
# map-side clip, decimal-exact sum.
ORACLE["winsorized_value_stats"] = """
WITH pct AS (
  SELECT quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
  FROM events)
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       CAST(SUM(CAST(least(greatest(value, lo), hi) AS DECIMAL(25,6))) AS DOUBLE)
         AS winsorized_total
FROM events, pct
GROUP BY event_type
"""


# PageRank over the minhash near-dup graph: 3 unrolled damped rounds,
# decimal-exact contribution folds, floor-truncated output.


def _pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    parts = [
        f"""mh AS ({ORACLE["minhash_near_dup"]}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM mh
      UNION ALL SELECT doc_b AS src, doc_a AS dst FROM mh),
d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT src AS doc_id, CAST(1.0 AS DOUBLE) AS rank FROM d)"""
    ]
    for k in range(1, iters + 1):
        parts.append(f"""r{k} AS (
  SELECT e.dst AS doc_id,
         CAST(0.15 AS DOUBLE) + CAST({damping!r} AS DOUBLE) *
           CAST(SUM(CAST(r.rank / CAST(d.deg AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE)
           AS rank
  FROM e JOIN r{k - 1} r ON e.src = r.doc_id JOIN d ON d.src = e.src
  GROUP BY e.dst)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT doc_id,
       CAST(floor(rank * 1000000.0) AS DOUBLE) / 1000000.0 AS pagerank
FROM r{iters}"""
    )


ORACLE["near_dup_pagerank"] = _pagerank_sql()


# ReplacingMergeTree keep-latest: window argmax over base ∪ derived updates.
ORACLE["replacing_merge_latest"] = f"""
WITH rows_all AS (
  SELECT o_orderkey, CAST(0 AS BIGINT) AS version, o_orderstatus AS status,
         o_totalprice AS total_price
  FROM orders
  UNION ALL
  SELECT o_orderkey, CAST(1 AS BIGINT) AS version, 'D' AS status, o_totalprice
  FROM orders
  WHERE {_h("CAST(o_orderkey AS VARCHAR)")} % 3 = 0
)
SELECT o_orderkey, version, status, total_price FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
  FROM rows_all)
WHERE rn = 1
"""


# RANGE-frame trailing 30 calendar days over the daily series.
ORACLE["trailing_30d_revenue"] = f"""
WITH daily AS (
  SELECT order_date, date_diff('day', DATE '1970-01-01', order_date) AS d, rev_dec
  FROM ({_DAILY_REV_DEC})
)
SELECT order_date,
       CAST(rev_dec AS DOUBLE) AS daily_revenue,
       CAST(sum(rev_dec) OVER w AS DOUBLE) AS revenue_30d,
       CAST(count(*) OVER w AS BIGINT) AS days_in_frame
FROM daily
WINDOW w AS (ORDER BY d RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
"""


# FULL OUTER day-calendar coverage report.
ORACLE["order_event_days_full_outer"] = """
WITH od AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
            FROM orders GROUP BY 1),
     ed AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
            FROM events GROUP BY 1)
SELECT COALESCE(od.day, ed.day) AS day,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       n_orders IS NOT NULL AS has_orders,
       n_events IS NOT NULL AS has_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
"""


# CollapsingMergeTree net visibility: the uncancelled two-thirds survive
# with net sign +1.
ORACLE["collapsing_merge_net"] = f"""
SELECT o_orderkey, o_orderstatus AS status, CAST(1 AS BIGINT) AS sign
FROM orders
WHERE {_h("CAST(o_orderkey AS VARCHAR)")} % 3 <> 0
"""


# Cascading continuous aggregates: monthly from daily from hourly partials.
ORACLE["rollup_cascade"] = f"""
WITH hourly AS ({_A1}),
daily AS (
  SELECT CAST(hour AS DATE) AS date,
         CAST(SUM(order_count) AS BIGINT) AS order_count,
         {_dsum('total_revenue')} AS total_revenue,
         CAST(SUM(total_quantity) AS BIGINT) AS total_quantity,
         COUNT(DISTINCT hour) AS n_hours
  FROM hourly GROUP BY 1)
SELECT strftime(date, '%Y-%m') AS month,
       CAST(SUM(order_count) AS BIGINT) AS order_count,
       {_dsum('total_revenue')} AS total_revenue,
       CAST(SUM(total_quantity) AS BIGINT) AS total_quantity,
       CAST(SUM(n_hours) AS BIGINT) AS n_hours,
       COUNT(*) AS n_days
FROM daily GROUP BY 1
"""


# CDC apply: latest-seq-wins fold with tombstone deletes.  The change log
# (seq 0 insert all / seq 1 double hash%10==0 / seq 2 delete hash%10==1)
# re-derives here; deleted keys vanish, updated keys carry 2x price.
ORACLE["cdc_apply"] = f"""
WITH b AS (SELECT o_orderkey AS order_id, o_totalprice AS price,
                  {_h("CAST(o_orderkey AS VARCHAR)")} % 10 AS bucket
           FROM orders)
SELECT order_id,
       CASE WHEN bucket = 0 THEN 'U' ELSE 'I' END AS final_op,
       CASE WHEN bucket = 0 THEN price * 2 ELSE price END AS final_price,
       CAST(CASE WHEN bucket = 0 THEN 1 ELSE 0 END AS BIGINT) AS last_seq
FROM b WHERE bucket <> 1
"""


# SCD2 history from the same change log: version rows with lead()-closed
# validity intervals; deletes close, never emit.
ORACLE["cdc_scd2_history"] = f"""
WITH b AS (SELECT o_orderkey AS order_id, o_totalprice AS price,
                  {_h("CAST(o_orderkey AS VARCHAR)")} % 10 AS bucket
           FROM orders),
chg AS (
  SELECT order_id, 0 AS seq, 'I' AS op, price FROM b
  UNION ALL
  SELECT order_id, 1 AS seq, 'U' AS op, price * 2 AS price FROM b WHERE bucket = 0
  UNION ALL
  SELECT order_id, 2 AS seq, 'D' AS op, 0.0 AS price FROM b WHERE bucket = 1),
v AS (
  SELECT order_id, op, price, seq,
         lead(seq) OVER (PARTITION BY order_id ORDER BY seq) AS next_seq
  FROM chg)
SELECT order_id, price,
       CAST(seq AS BIGINT) AS valid_from_seq,
       CAST(next_seq AS BIGINT) AS valid_to_seq,
       next_seq IS NULL AS is_current
FROM v WHERE op <> 'D'
"""


# Stored SCD2 history (3 out-of-order epochs merged into the bucketed
# history table) must equal the one-shot lead() derivation exactly —
# the append+merge == derive discipline.
ORACLE["scd2_stored_history"] = ORACLE["cdc_scd2_history"]

# Point-in-time probe join over the SCD2 history: per-key t = hash % 3,
# interval containment; deleted-at-2 keys probed at t=2 drop out.
ORACLE["scd2_asof_lookup"] = f"""
WITH h AS ({ORACLE["cdc_scd2_history"]}),
p AS (SELECT o_orderkey AS order_id,
             {_h("CAST(o_orderkey AS VARCHAR)")} % 3 AS t
      FROM orders)
SELECT p.order_id, CAST(p.t AS BIGINT) AS t, h.price AS price_at_t
FROM p JOIN h USING (order_id)
WHERE h.valid_from_seq <= p.t
  AND (h.valid_to_seq IS NULL OR p.t < h.valid_to_seq)
"""

# Selinger estimate vs truth: exact counts/NDV, integer-floor estimate,
# one rounded divide.
ORACLE["join_size_estimate"] = """
WITH r AS (SELECT count(*) AS n_r, count(DISTINCT o_orderkey) AS ndv_r FROM orders),
s AS (SELECT count(*) AS n_s, count(DISTINCT l_orderkey) AS ndv_s FROM lineitem),
a AS (SELECT count(*) AS actual_rows
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
SELECT CAST(n_r AS BIGINT) AS n_orders,
       CAST(n_s AS BIGINT) AS n_lineitem,
       CAST(ndv_r AS BIGINT) AS ndv_orders_key,
       CAST(ndv_s AS BIGINT) AS ndv_lineitem_key,
       CAST(floor(CAST(n_r AS DOUBLE) * CAST(n_s AS DOUBLE)
                  / CAST(greatest(ndv_r, ndv_s) AS DOUBLE)) AS BIGINT)
         AS estimated_rows,
       CAST(actual_rows AS BIGINT) AS actual_rows,
       round(abs(floor(CAST(n_r AS DOUBLE) * CAST(n_s AS DOUBLE)
                       / CAST(greatest(ndv_r, ndv_s) AS DOUBLE))
                 - CAST(actual_rows AS DOUBLE)) / CAST(actual_rows AS DOUBLE), 6)
         AS rel_error
FROM r, s, a
"""


# Distribution-rank window battery: unique ordering (price, orderkey) makes
# every rank/frame unambiguous; percent_rank and cume_dist are single IEEE
# divisions of exact integers — bit-identical cross-engine.
ORACLE["value_rank_battery"] = """
SELECT o_orderkey AS order_id,
       o_orderpriority AS priority,
       o_totalprice AS price,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist,
       first_value(o_totalprice) OVER w AS cheapest_so_far,
       nth_value(o_totalprice, 2) OVER w AS second_cheapest_seen
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# Join-MV maintained through MERGE: partials enriched customer -> nation
# per batch; decimal folds make 4-epoch == one-shot exact.
ORACLE["incremental_nation_rollup"] = f"""
SELECT n_name AS nation,
       strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS order_count,
       {_dsum('o_totalprice')} AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2
"""


# Additive schema evolution: epochs 0-1 lack total_quantity (NULL after the
# mergeSchema union), epochs 2-3 carry it.
ORACLE["txlog_schema_evolution"] = f"""
WITH e AS (SELECT *, event_id % 4 AS epoch FROM events),
p AS (
  SELECT epoch, date_trunc('hour', ts) AS hour, {_CAT} AS category,
         count(*) AS order_count, {_dsum('value')} AS total_revenue,
         CASE WHEN epoch >= 2 THEN CAST(sum({_QTY}) AS BIGINT) END AS total_quantity
  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2, 3)
SELECT category,
       CAST(SUM(order_count) AS BIGINT) AS order_count,
       {_dsum('total_revenue')} AS total_revenue,
       CAST(SUM(total_quantity) AS BIGINT) AS total_quantity,
       COUNT(*) AS n_partials,
       COUNT(total_quantity) AS n_with_qty
FROM p GROUP BY 1
"""


# Bloom-pruned point lookup: min-user probe over raw events.
ORACLE["txlog_bloom_pruned_read"] = f"""
SELECT user_id, count(*) AS n_events, {_dsum('value')} AS total_value
FROM events
WHERE user_id = (SELECT min(user_id) FROM events)
GROUP BY user_id
"""


# Z-order pruned read: the two-predicate aggregate over the Z-clustered
# txlog equals the same aggregate over raw orders (pruning changes the
# scan set, never the answer).  Windows mirror pipeline._ZO_CK/_ZO_TP.
ORACLE["txlog_zorder_pruned_read"] = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_dsum('o_totalprice')} AS revenue
FROM orders
WHERE o_custkey BETWEEN 10 AND 60
  AND o_totalprice BETWEEN 50000.0 AND 150000.0
GROUP BY 1
"""


# JL ±1 random projection 64 -> 8: per-component left folds with the
# rp:p:j-seeded sign family; one correctly-rounded division by sqrt(8).
ORACLE["embedding_random_projection"] = """
SELECT vec_id,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:0:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_0,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:1:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_1,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:2:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_2,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:3:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_3,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:4:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_4,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:5:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_5,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:6:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_6,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:7:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(8.0) AS proj_7
FROM embeddings
"""


# ReplacingMergeTree(ver, is_deleted): latest version per key, tombstoned
# keys filtered at read.  bucket 1 -> doubled update wins; bucket 2 ->
# deleted; rest keep their base row.
ORACLE["replacing_merge_tombstone"] = f"""
WITH b AS (SELECT o_orderkey, o_totalprice,
                  {_h("CAST(o_orderkey AS VARCHAR)")} % 5 AS bucket
           FROM orders)
SELECT o_orderkey,
       CAST(CASE WHEN bucket = 1 THEN 1 ELSE 0 END AS BIGINT) AS version,
       CASE WHEN bucket = 1 THEN o_totalprice * 2 ELSE o_totalprice END
         AS total_price
FROM b WHERE bucket <> 2
"""


# Stream-static broadcast enrichment: emitted == the batch join.
ORACLE["stream_static_enrich"] = """
SELECT o_orderkey AS order_id, c_mktsegment AS segment,
       CAST(c_nationkey AS BIGINT) AS nation_key,
       o_totalprice AS total_amount
FROM orders JOIN customer ON o_custkey = c_custkey
"""


# MV reconciliation: rollup-then-total equals total exactly (decimal sums).
ORACLE["mv_consistency_report"] = f"""
SELECT count(*) AS raw_orders, {_dsum('value')} AS raw_revenue,
       TRUE AS a1_consistent, TRUE AS a2_consistent
FROM events WHERE event_type = 'purchase'
"""


# AggregatingMergeTree storage lifecycle: stored HLL states merged at read;
# exact-plus-tolerance contract (sketch binaries differ across engines).
ORACLE["aggregating_merge_sketch_mv"] = """
SELECT CAST(ts AS DATE) AS day,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS stored_states_within_2pct
FROM events GROUP BY 1
"""


# Equi-depth histogram: bucket = count of decile boundaries strictly below
# the value; boundaries are exact interpolated percentiles.
ORACLE["value_equidepth_histogram"] = f"""
WITH b AS (
  SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
  FROM events)
SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(bs, x -> CAST(CASE WHEN value > x THEN 1 ELSE 0 END AS BIGINT))),
         (a, c) -> a + c) AS bucket,
       count(*) AS n_events,
       {_dsum('value')} AS total_value
FROM events, b GROUP BY 1
"""


# A-ES weighted sample: sqrt-chain keys (w in {{1,2,4}}), top-100 by key.
ORACLE["weighted_sample_aes"] = f"""
WITH s AS (
  SELECT doc_id,
         CAST(CASE WHEN len(string_split(text, ' ')) >= 40 THEN 4
                   WHEN len(string_split(text, ' ')) >= 15 THEN 2
                   ELSE 1 END AS BIGINT) AS w,
         ({_h('CAST(doc_id AS VARCHAR)')} % 4503599627370496 + 1)
           / 4503599627370497.0 AS u
  FROM documents)
SELECT doc_id, w,
       CASE WHEN w = 4 THEN sqrt(sqrt(u))
            WHEN w = 2 THEN sqrt(u)
            ELSE u END AS key
FROM s
ORDER BY key DESC, doc_id ASC
LIMIT 100
"""


# Streaming LEFT OUTER join: matched half carries its +10min ack; the
# out-of-window half emits NULL-padded on watermark eviction.
ORACLE["stream_join_orders_acks_outer"] = f"""
WITH b AS (SELECT o_orderkey AS order_id,
                  CAST(o_orderdate AS TIMESTAMP) AS order_timestamp,
                  o_totalprice AS total_amount,
                  {_h("CAST(o_orderkey AS VARCHAR)")} % 2 AS bucket
           FROM orders)
SELECT order_id, order_timestamp,
       CASE WHEN bucket = 0
            THEN order_timestamp + INTERVAL 10 MINUTE END AS ack_timestamp,
       CASE WHEN bucket = 0 THEN 'ok' END AS ack_status,
       total_amount
FROM b
"""


# RP-accelerated ANN: candidate cut by 32-dim projected cosine (top-100),
# exact 64-dim rerank of only those candidates; round-6-before-rank
# discipline; every fold left-associated to match the numpy accumulation.
ORACLE["ann_rp_topk"] = f"""
WITH pr0 AS (
  SELECT vec_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:0:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_0,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:1:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:2:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_2,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:3:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_3,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:4:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_4,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:5:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_5,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:6:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_6,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:7:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_7,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:8:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_8,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:9:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_9,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:10:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_10,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:11:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_11,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:12:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_12,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:13:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_13,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:14:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_14,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:15:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_15,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:16:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_16,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:17:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_17,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:18:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_18,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:19:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_19,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:20:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_20,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:21:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_21,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:22:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_22,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:23:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_23,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:24:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_24,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:25:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_25,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:26:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_26,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:27:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_27,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:28:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_28,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:29:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_29,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:30:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_30,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), j -> (CASE WHEN CAST('0x' || substr(md5('rp:31:' || CAST(j AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) * CAST(embedding[j] AS DOUBLE))), (acc, x) -> acc + x) / sqrt(32.0) AS proj_31
  FROM embeddings),
pr AS (
  SELECT *, sqrt(((((((((((((((((((((((((((((((((proj_0 * proj_0) + (proj_1 * proj_1)) + (proj_2 * proj_2)) + (proj_3 * proj_3)) + (proj_4 * proj_4)) + (proj_5 * proj_5)) + (proj_6 * proj_6)) + (proj_7 * proj_7)) + (proj_8 * proj_8)) + (proj_9 * proj_9)) + (proj_10 * proj_10)) + (proj_11 * proj_11)) + (proj_12 * proj_12)) + (proj_13 * proj_13)) + (proj_14 * proj_14)) + (proj_15 * proj_15)) + (proj_16 * proj_16)) + (proj_17 * proj_17)) + (proj_18 * proj_18)) + (proj_19 * proj_19)) + (proj_20 * proj_20)) + (proj_21 * proj_21)) + (proj_22 * proj_22)) + (proj_23 * proj_23)) + (proj_24 * proj_24)) + (proj_25 * proj_25)) + (proj_26 * proj_26)) + (proj_27 * proj_27)) + (proj_28 * proj_28)) + (proj_29 * proj_29)) + (proj_30 * proj_30)) + (proj_31 * proj_31))) AS nproj FROM pr0),
cand AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         round(((((((((((((((((((((((((((((((((a.proj_0 * b.proj_0) + (a.proj_1 * b.proj_1)) + (a.proj_2 * b.proj_2)) + (a.proj_3 * b.proj_3)) + (a.proj_4 * b.proj_4)) + (a.proj_5 * b.proj_5)) + (a.proj_6 * b.proj_6)) + (a.proj_7 * b.proj_7)) + (a.proj_8 * b.proj_8)) + (a.proj_9 * b.proj_9)) + (a.proj_10 * b.proj_10)) + (a.proj_11 * b.proj_11)) + (a.proj_12 * b.proj_12)) + (a.proj_13 * b.proj_13)) + (a.proj_14 * b.proj_14)) + (a.proj_15 * b.proj_15)) + (a.proj_16 * b.proj_16)) + (a.proj_17 * b.proj_17)) + (a.proj_18 * b.proj_18)) + (a.proj_19 * b.proj_19)) + (a.proj_20 * b.proj_20)) + (a.proj_21 * b.proj_21)) + (a.proj_22 * b.proj_22)) + (a.proj_23 * b.proj_23)) + (a.proj_24 * b.proj_24)) + (a.proj_25 * b.proj_25)) + (a.proj_26 * b.proj_26)) + (a.proj_27 * b.proj_27)) + (a.proj_28 * b.proj_28)) + (a.proj_29 * b.proj_29)) + (a.proj_30 * b.proj_30)) + (a.proj_31 * b.proj_31)) / (a.nproj * b.nproj), 6) AS pcos
  FROM pr a JOIN pr b ON a.vec_id <> b.vec_id),
topm AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY pcos DESC, neighbor_id ASC) AS r
    FROM cand) WHERE r <= 100),
nv AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS n64
  FROM embeddings),
rr AS (
  SELECT t.vec_id, t.neighbor_id,
         round({_dot_sql('a.embedding', 'b.embedding')} / (a.n64 * b.n64), 6)
           AS cos_sim
  FROM topm t
  JOIN nv a ON a.vec_id = t.vec_id
  JOIN nv b ON b.vec_id = t.neighbor_id)
SELECT vec_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
             ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM rr) WHERE rank <= 5
"""


# Linear interpolation over the dense hour axis: IGNORE NULLS running
# neighbors, identical lerp expression tree -> bit-identical values.
ORACLE["interpolated_hourly_series"] = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         count(*) AS order_count, {_dsum('value')} AS total_revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
axis AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
j AS (
  SELECT axis.hour,
         CAST(coalesce(order_count, 0) AS BIGINT) AS order_count,
         total_revenue,
         epoch(axis.hour) // 3600 AS eh
  FROM axis LEFT JOIN hourly ON axis.hour = hourly.hour),
n AS (
  SELECT *,
         last_value(total_revenue IGNORE NULLS) OVER
           (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN total_revenue IS NOT NULL THEN eh END IGNORE NULLS) OVER
           (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
         first_value(total_revenue IGNORE NULLS) OVER
           (ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN total_revenue IS NOT NULL THEN eh END IGNORE NULLS) OVER
           (ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM j)
SELECT hour, order_count,
       CASE WHEN total_revenue IS NOT NULL THEN total_revenue
            WHEN prev_h IS NULL THEN next_v
            WHEN next_h IS NULL THEN prev_v
            ELSE prev_v + (next_v - prev_v) *
                 (CAST(eh - prev_h AS DOUBLE) / CAST(next_h - prev_h AS DOUBLE))
       END AS revenue_filled,
       total_revenue IS NULL AS was_interpolated
FROM n
"""


# CDF between versions 1 and 3 of the mod-4 append history = epochs 1-2.
ORACLE["txlog_changes_feed"] = f"""
SELECT date_trunc('hour', ts) AS hour,
       {_CAT} AS category,
       count(*) AS order_count,
       {_dsum('value')} AS total_revenue,
       CAST(sum({_QTY}) AS BIGINT) AS total_quantity
FROM events
WHERE event_type = 'purchase' AND event_id % 4 IN (1, 2)
GROUP BY 1, 2
"""


# Scene-change detection: per-doc consecutive frame-mean deltas; lag()
# reproduces the sequential pairing; abs() of identical doubles is exact.
ORACLE["scene_change_flags"] = """
WITH b AS (
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents),
fr AS (
  SELECT doc_id, t.f AS frame_idx,
         list_reduce(list_prepend(CAST(0 AS BIGINT), bytes[(t.f*64+1):(t.f*64+64)]),
                     (a, x) -> a + x)
           / CAST(len(bytes[(t.f*64+1):(t.f*64+64)]) AS DOUBLE) AS mean
  FROM b, UNNEST(range(0, CAST(ceil(len(bytes) / 64.0) AS BIGINT))) AS t(f)),
d AS (
  SELECT doc_id, frame_idx,
         abs(mean - lag(mean) OVER (PARTITION BY doc_id ORDER BY frame_idx))
           AS mean_delta
  FROM fr)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, mean_delta,
       coalesce(mean_delta > 4.0, FALSE) AS is_scene_change
FROM d
"""


# VersionedCollapsingMergeTree current state: updated bucket surfaces v2
# doubled, cancelled bucket vanishes, the rest keep v1.
ORACLE["versioned_collapse_current"] = f"""
WITH b AS (SELECT o_orderkey, o_totalprice,
                  {_h("CAST(o_orderkey AS VARCHAR)")} % 4 AS bucket
           FROM orders)
SELECT o_orderkey,
       CAST(CASE WHEN bucket = 1 THEN 2 ELSE 1 END AS BIGINT) AS version,
       CASE WHEN bucket = 1 THEN o_totalprice * 2 ELSE o_totalprice END
         AS total_price
FROM b WHERE bucket <> 2
"""


# JSON round-trip: identical to the A1 oracle — the JSON scan must be a
# fidelity-preserving identity.
ORACLE["json_roundtrip_rollup"] = _A1


# CSV round-trip: per-priority order stats straight off the orders table.
ORACLE["csv_roundtrip_stats"] = f"""
SELECT o_orderpriority AS priority,
       count(*) AS order_count,
       {_dsum('o_totalprice')} AS total_revenue,
       CAST(max(o_orderdate) AS TIMESTAMP) AS latest_order
FROM orders GROUP BY 1
"""


# ORC round-trip: per-event-type stats straight off the events table —
# the ORC scan must be a fidelity-preserving identity like JSON/CSV.
ORACLE["orc_roundtrip_stats"] = f"""
SELECT event_type,
       count(*) AS n_events,
       {_dsum('value')} AS total_value,
       CAST(max(ts) AS TIMESTAMP) AS latest_ts,
       count(DISTINCT user_id) AS n_users
FROM events WHERE value > 0 GROUP BY 1
"""


# XML round-trip: per-status order stats — the XML scan must be a
# fidelity-preserving identity like the other file formats.
ORACLE["xml_roundtrip_stats"] = f"""
SELECT o_orderstatus AS status,
       count(*) AS order_count,
       {_dsum('o_totalprice')} AS total_revenue,
       CAST(min(o_orderdate) AS TIMESTAMP) AS first_order
FROM orders GROUP BY 1
"""


# VARIANT-path props rollup: typed extraction then bucket aggregate —
# values must equal the string-path JSON extraction exactly.
ORACLE["variant_props_rollup"] = f"""
SELECT coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) % 10
         AS k_bucket,
       count(*) AS n_events,
       {_dsum('value')} AS total_value,
       max(coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0))
         AS max_k
FROM events GROUP BY 1
"""


# Recursive decay ladder: identical recursion in DuckDB; double halving
# is an exact exponent decrement on both engines.
ORACLE["recursive_decay_ladder"] = f"""
WITH RECURSIVE ladder(priority, step, amount) AS (
  SELECT o_orderpriority AS priority,
         CAST(0 AS BIGINT) AS step,
         CAST({_dsum('o_totalprice')} AS DOUBLE) AS amount
  FROM orders GROUP BY 1
  UNION ALL
  SELECT priority, step + 1, amount / 2 FROM ladder
  WHERE amount >= 2.0
)
SELECT priority, step, amount FROM ladder
"""


# Correlated LATERAL top-1 per nation; deterministic (bal DESC, name) tie
# order on both engines.
ORACLE["lateral_top_customer_per_nation"] = """
SELECT n.n_name AS nation, t.c_name AS top_customer, t.c_acctbal AS acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 1
) t
"""


# Python DataSource proof: every ledger value is a pure function of the
# row id, so range(n) reproduces the source exactly.
ORACLE["python_datasource_scan"] = """
SELECT CAST(range % 10 AS BIGINT) AS bucket,
       count(*) AS n_rows,
       CAST(sum((range * range) % 9973) AS BIGINT) AS total_amount,
       CAST(max(range) AS BIGINT) AS max_id
FROM range(100000) GROUP BY 1
"""

# Streaming twin: offset-tracked micro-batches + a checkpoint restart
# must reproduce exactly the batch ledger — any duplicated or dropped
# batch breaks the hash.
ORACLE["python_stream_datasource_rollup"] = ORACLE["python_datasource_scan"]

# Full Python-DataSource loop (source -> engine-coordinated sink commit ->
# manifest read): same ledger identity.
ORACLE["python_stream_datasource_sink_rollup"] = ORACLE["python_datasource_scan"]


def _pq_train_parts(
    vsub: str,
    dec: str,
    iters: int = 2,
    sub: int = 8,
    k: int = 16,
    prefix: str = "pq",
) -> tuple[list[str], str]:
    """Unrolled per-subspace Lloyd CTEs over a ``{vsub}`` source CTE of
    (vec_id, m, sub: 8 doubles); returns (parts, final codebook CTE).
    Mirrors ``similarity._pq_fit`` exactly: init = slices of the k
    lowest vec_ids, assignment = round-6 explicit chain with codeword-id
    tiebreak, update = exact {dec} sums + one double divide per
    sub-dimension, emptied codewords keep their previous centroid
    (coalesce)."""
    chain = " + ".join(
        f"(v.sub[{i}] - cb.cent[{i}]) * (v.sub[{i}] - cb.cent[{i}])"
        for i in range(1, sub + 1)
    )
    means = ", ".join(
        f"CAST(SUM(CAST(v.sub[{i}] AS {dec})) AS DOUBLE) / COUNT(*) AS m{i}"
        for i in range(1, sub + 1)
    )
    clist = "[" + ", ".join(f"m{i}" for i in range(1, sub + 1)) + "]"
    parts = [
        f"""{prefix}cb0 AS (
  SELECT m, CAST(row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1 AS INTEGER) AS c,
         sub AS cent
  FROM {vsub}
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))"""
    ]
    for n in range(1, iters + 1):
        parts.append(
            f"""{prefix}as{n} AS (
  SELECT vec_id, m, c AS code FROM (
    SELECT v.vec_id, v.m, cb.c,
           row_number() OVER (PARTITION BY v.vec_id, v.m
                              ORDER BY round({chain}, 6) ASC, cb.c ASC) AS rn
    FROM {vsub} v JOIN {prefix}cb{n - 1} cb USING (m))
  WHERE rn = 1)"""
        )
        parts.append(
            f"""{prefix}mu{n} AS (
  SELECT m, c, {clist} AS cent FROM (
    SELECT a.m, a.code AS c, {means}
    FROM {prefix}as{n} a JOIN {vsub} v ON v.vec_id = a.vec_id AND v.m = a.m
    GROUP BY a.m, a.code))"""
        )
        parts.append(
            f"""{prefix}cb{n} AS (
  SELECT p.m, p.c, coalesce(u.cent, p.cent) AS cent
  FROM {prefix}cb{n - 1} p LEFT JOIN {prefix}mu{n} u ON u.m = p.m AND u.c = p.c)"""
        )
    return parts, f"{prefix}cb{iters}"


def _pq_adc_sql(
    m: int = 8, sub: int = 8, k: int = 16, qmod: int = 100, top_k: int = 5,
    iters: int = 2,
) -> str:
    """PQ-ADC mirror: TRAINED codebooks (per-subspace Lloyd rounds from
    the lowest-vec_id init), per-subspace argmin codes (round-6 explicit
    chain, codeword tiebreak), query LUTs, and ADC = exact DECIMAL(25,6)
    sum of the m round-6 subspace lookups — order-independent, so
    DuckDB's SUM equals Spark's array fold bit-for-bit."""
    chain = " + ".join(
        f"(v.sub[{i}] - cb.cent[{i}]) * (v.sub[{i}] - cb.cent[{i}])"
        for i in range(1, sub + 1)
    )
    vsub = f"""vsub AS (
  SELECT e.vec_id, ms.m,
         list_transform(list_slice(e.embedding, ms.m * {sub} + 1, ms.m * {sub} + {sub}),
                        x -> CAST(x AS DOUBLE)) AS sub
  FROM embeddings e, (SELECT unnest(range({m})) AS m) ms)"""
    train, cb_final = _pq_train_parts(
        "vsub", "DECIMAL(38,15)", iters=iters, sub=sub, k=k
    )
    return (
        "WITH "
        + ",\n".join([vsub, *train])
        + f""",
codes AS (
  SELECT vec_id, m, c AS code FROM (
    SELECT v.vec_id, v.m, cb.c,
           row_number() OVER (PARTITION BY v.vec_id, v.m
                              ORDER BY round({chain}, 6) ASC, cb.c ASC) AS rn
    FROM vsub v JOIN {cb_final} cb USING (m))
  WHERE rn = 1),
qlut AS (
  SELECT v.vec_id AS qid, cb.m, cb.c, round({chain}, 6) AS d
  FROM vsub v JOIN {cb_final} cb USING (m)
  WHERE v.vec_id % {qmod} = 0),
adc AS (
  SELECT l.qid, x.vec_id AS neighbor_id,
         CAST(SUM(CAST(l.d AS DECIMAL(25,6))) AS DOUBLE) AS adc_dist
  FROM codes x JOIN qlut l ON x.m = l.m AND x.code = l.c
  WHERE x.vec_id <> l.qid
  GROUP BY 1, 2)
SELECT qid AS vec_id, neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rank FROM (
  SELECT qid, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rn
  FROM adc)
WHERE rn <= {top_k}
"""
    )


ORACLE["ann_pq_adc_topk"] = _pq_adc_sql()


def _ivfpq_sql(
    m: int = 8,
    sub: int = 8,
    k_pq: int = 16,
    qmod: int = 100,
    probe: int = 2,
    top_k: int = 5,
    dim: int = 64,
    iters: int = 2,
) -> str:
    """IVF + PQ mirror with RESIDUAL ENCODING (by_residual=true): the
    kmeans CTE chain supplies cell membership (rn=1), probe sets
    (rn<=probe), and cell centroids; residuals are round-6 by definition
    (vector − cell centroid); PQ codebooks are TRAINED on the member
    residuals (exact DECIMAL(25,6) means); each query gets a PER-CELL
    LUT from its residual against that probed cell's centroid;
    candidates are the cell equi-join, distances the exact-decimal ADC
    sum."""
    parts, final_c = _kmeans_parts(dim=dim)
    cell_chain = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        for i in range(1, dim + 1)
    )
    parts.append(
        f"""s AS (
  SELECT vec_id, cluster, rn FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM (SELECT e.vec_id, c.cluster, round({cell_chain}, 6) AS dist
          FROM embeddings e CROSS JOIN {final_c} c))
  WHERE rn <= {probe})"""
    )
    rlist = "[" + ", ".join(
        f"round(CAST(e.embedding[{i}] AS DOUBLE) - cc.centroid[{i}], 6)"
        for i in range(1, dim + 1)
    ) + "]"
    parts.append(
        f"""rv AS (
  SELECT e.vec_id, s1.cluster, {rlist} AS r
  FROM embeddings e
  JOIN (SELECT vec_id, cluster FROM s WHERE rn = 1) s1 USING (vec_id)
  JOIN {final_c} cc USING (cluster))"""
    )
    parts.append(
        f"""rsub AS (
  SELECT vec_id, cluster, ms.m,
         list_slice(r, ms.m * {sub} + 1, ms.m * {sub} + {sub}) AS sub
  FROM rv, (SELECT unnest(range({m})) AS m) ms)"""
    )
    train, cb_final = _pq_train_parts(
        "rsub", "DECIMAL(25,6)", iters=iters, sub=sub, k=k_pq
    )
    parts.extend(train)
    pq_chain = " + ".join(
        f"(v.sub[{i}] - cb.cent[{i}]) * (v.sub[{i}] - cb.cent[{i}])"
        for i in range(1, sub + 1)
    )
    parts.append(
        f"""pq_codes AS (
  SELECT vec_id, cluster, m, c AS code FROM (
    SELECT v.vec_id, v.cluster, v.m, cb.c,
           row_number() OVER (PARTITION BY v.vec_id, v.m
                              ORDER BY round({pq_chain}, 6) ASC, cb.c ASC) AS rn
    FROM rsub v JOIN {cb_final} cb USING (m))
  WHERE rn = 1)"""
    )
    parts.append(
        f"""qrv AS (
  SELECT e.vec_id AS qid, sp.cluster, {rlist.replace('cc.centroid', 'qc.centroid')} AS r
  FROM embeddings e
  JOIN (SELECT vec_id, cluster FROM s WHERE rn <= {probe}) sp USING (vec_id)
  JOIN {final_c} qc USING (cluster)
  WHERE e.vec_id % {qmod} = 0)"""
    )
    parts.append(
        f"""qrsub AS (
  SELECT qid, cluster, ms.m,
         list_slice(r, ms.m * {sub} + 1, ms.m * {sub} + {sub}) AS sub
  FROM qrv, (SELECT unnest(range({m})) AS m) ms)"""
    )
    parts.append(
        f"""qlut AS (
  SELECT v.qid, v.cluster, cb.m, cb.c, round({pq_chain}, 6) AS d
  FROM qrsub v JOIN {cb_final} cb USING (m))"""
    )
    parts.append(
        """adc AS (
  SELECT l.qid, x.vec_id AS neighbor_id,
         CAST(SUM(CAST(l.d AS DECIMAL(25,6))) AS DOUBLE) AS adc_dist
  FROM pq_codes x
  JOIN qlut l ON l.cluster = x.cluster AND l.m = x.m AND l.c = x.code
  WHERE x.vec_id <> l.qid
  GROUP BY 1, 2)"""
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT qid AS vec_id, neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rank FROM (
  SELECT qid, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rn
  FROM adc)
WHERE rn <= {top_k}"""
    )


ORACLE["ann_ivfpq_topk"] = _ivfpq_sql()


# PQ recall vs the exact full-dim squared-L2 baseline over the same
# query batch: id-pair semi-join + per-query ratio.
# Skew diagnosis: exact counts, one rounded divide, integer ceil.
ORACLE["join_key_skew_report"] = """
WITH t AS (SELECT count(*) AS total FROM events),
c AS (SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1)
SELECT user_id, CAST(n_rows AS BIGINT) AS n_rows,
       round(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       CAST(ceil(CAST(n_rows AS DOUBLE) / 1000.0) AS BIGINT) AS suggested_salt
FROM c, t
ORDER BY n_rows DESC, user_id ASC
LIMIT 10
"""

def _l2_chain_sql(a: str, b: str, dim: int = 64) -> str:
    """Explicit left-assoc `t1 + ... + t{dim}` squared-L2 chain between
    two list columns — the IEEE order of the Spark zip_with fold."""
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1)
    )


def _pq_recall_sql(approx_sql: str, qmod: int = 100, top_k: int = 5) -> str:
    """Recall@k of an approximate (vec_id, neighbor_id) result against
    the exact full-dim squared-L2 top-k over the PQ query batch:
    id-pair semi-join + per-query ratio."""
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % {qmod} = 0),
d AS (SELECT q.qid, e.vec_id AS neighbor_id,
             round({_l2_chain_sql("e.embedding", "q.qe")}, 6) AS dist
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
exact_k AS (SELECT vec_id, neighbor_id FROM (
  SELECT qid AS vec_id, neighbor_id,
         row_number() OVER (PARTITION BY qid ORDER BY dist ASC, neighbor_id ASC) AS rn
  FROM d) WHERE rn <= {top_k}),
approx_k AS (SELECT vec_id, neighbor_id FROM ({approx_sql})),
k_per_q AS (SELECT vec_id, count(*) AS k FROM exact_k GROUP BY 1),
hits AS (
  SELECT e.vec_id, count(*) AS n_hits
  FROM exact_k e JOIN approx_k a USING (vec_id, neighbor_id)
  GROUP BY 1)
SELECT p.vec_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / k, 6) AS recall_at_k
FROM k_per_q p LEFT JOIN hits h ON p.vec_id = h.vec_id
"""


ORACLE["ann_pq_recall_at_k"] = _pq_recall_sql(ORACLE["ann_pq_adc_topk"])

# IVFADC recall: same exact baseline, approximate side = the residual
# IVF+PQ index — measures probe loss on top of quantization loss.
ORACLE["ann_ivfpq_recall_at_k"] = _pq_recall_sql(ORACLE["ann_ivfpq_topk"])

# Two-stage serving: ADC shortlist of 20 per query, exact round-6 L2
# re-rank of the shortlist, final top-5 with neighbor-id tiebreak.
ORACLE["ann_ivfpq_rerank_topk"] = f"""
WITH sl AS (SELECT vec_id, neighbor_id FROM ({_ivfpq_sql(top_k=20)})),
d AS (SELECT sl.vec_id, sl.neighbor_id,
             round({_l2_chain_sql("e.embedding", "qe.embedding")}, 6) AS l2_dist
      FROM sl
      JOIN embeddings e ON e.vec_id = sl.neighbor_id
      JOIN embeddings qe ON qe.vec_id = sl.vec_id)
SELECT vec_id, neighbor_id, l2_dist, CAST(rn AS BIGINT) AS rank FROM (
  SELECT vec_id, neighbor_id, l2_dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY l2_dist ASC, neighbor_id ASC) AS rn
  FROM d)
WHERE rn <= 5
"""


# Polymorphic-UDTF n-gram phrase mining: trigram occurrences via 1-based
# list positions, counted, thresholded.
ORACLE["ngram_phrases_udtf"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (SELECT words[i] AS gram_1, words[i + 1] AS gram_2, words[i + 2] AS gram_3
      FROM w, LATERAL unnest(range(1, len(words) - 1)) AS t(i))
SELECT gram_1, gram_2, gram_3, CAST(count(*) AS BIGINT) AS cnt
FROM g GROUP BY 1, 2, 3 HAVING count(*) >= 5
"""


# Dynamic-partition backfill: the two earliest months carry doubled
# totals; everything else is the original table.
ORACLE["dynamic_partition_backfill"] = f"""
WITH m AS (
  SELECT DISTINCT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS ym
  FROM orders ORDER BY ym LIMIT 2)
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
         AS order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(
         CASE WHEN year(o_orderdate) * 100 + month(o_orderdate)
                   IN (SELECT ym FROM m)
              THEN o_totalprice * 2 ELSE o_totalprice END
         AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
FROM orders GROUP BY 1
"""


# State-store audit: recovered streaming state must equal the batch
# GROUP BY over all events (integer-exact measures).
ORACLE["statestore_inspect"] = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events GROUP BY 1
"""


# Dedup-on-ingest: first (lowest doc_id) copy per content hash wins, the
# pure-SQL argmin of what the out-of-order Replacing ingest converges to.
ORACLE["dedup_ingest_documents"] = f"""
SELECT {_h('text')} AS content_key,
       min(doc_id) AS keep_doc_id,
       arg_min(lang, doc_id) AS lang,
       arg_min(source, doc_id) AS source
FROM documents GROUP BY 1
"""


# Triangle participation over the minhash near-dup graph: canonical
# a<b<c wedge-close enumeration, one count per member per triangle.
ORACLE["near_dup_triangles"] = f"""
WITH mh AS ({ORACLE["minhash_near_dup"]}),
e AS (SELECT doc_a AS a, doc_b AS b FROM mh),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
m AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT doc_id, count(*) AS n_triangles FROM m GROUP BY 1
"""


# Audience overlap: exact pairwise shared-user counts; sketch quality is
# part of the hashed contract via the tolerance boolean.
ORACLE["user_overlap_matrix"] = """
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(DISTINCT a.user_id) AS exact_shared,
       TRUE AS sketch_within_5pct
FROM (SELECT DISTINCT event_type, user_id FROM events) a
JOIN (SELECT DISTINCT event_type, user_id FROM events) b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


# Per-source CHAR-VOLUME quota: cap = mean source char volume (bigint
# sum-then-DIV); survivors are the inclusive char-prefix in
# (n_chars DESC, doc_id) priority inside each source.
ORACLE["source_quota_cap"] = """
WITH totals AS (
  SELECT source, count(*) AS total_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY 1),
q AS (SELECT CAST(sum(total_chars) // count(*) AS BIGINT) AS quota_chars
      FROM totals),
r AS (
  SELECT source, n_chars,
         sum(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents),
kept AS (
  SELECT source, count(*) AS kept_docs,
         CAST(sum(n_chars) AS BIGINT) AS kept_chars
  FROM r, q WHERE cum <= quota_chars GROUP BY 1)
SELECT t.source, t.total_docs, t.total_chars, q.quota_chars,
       CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(coalesce(k.kept_chars, 0) AS BIGINT) AS kept_chars,
       CAST(t.total_chars > q.quota_chars AS INTEGER) AS capped
FROM totals t LEFT JOIN kept k ON t.source = k.source, q
"""


# sequenceMatch/sequenceCount parity: the greedy left-to-right
# first-A-then-first-B scan == non-overlapping lazy-regex count of
# 'A.*?B' over the per-user event-time symbol string.
ORACLE["event_sequence_counts"] = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'signup' THEN 'A' ELSE 'B' END AS s
  FROM events WHERE event_type IN ('signup', 'purchase')),
seqs AS (
  SELECT user_id, string_agg(s, '' ORDER BY ts, event_id) AS seq
  FROM e GROUP BY 1)
SELECT user_id,
       CAST(len(regexp_extract_all(seq, 'A.*?B')) AS BIGINT) AS seq_count,
       CAST(len(regexp_extract_all(seq, 'A.*?B')) > 0 AS BIGINT) AS matched
FROM seqs
"""


# ER blocking + sorted-neighborhood: within each (nation, segment)
# block, rank by (name, custkey); only pairs within 10 ranks compare;
# Levenshtein <= 2, canonical least/greatest custkey — identical DP
# distance and identical window in both engines.
ORACLE["customer_blocking_linkage"] = """
WITH ranked AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
                            ORDER BY c_name, c_custkey) AS rn
  FROM customer)
SELECT least(a.c_custkey, b.c_custkey) AS custkey_a,
       greatest(a.c_custkey, b.c_custkey) AS custkey_b,
       a.c_nationkey,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
FROM ranked a
JOIN ranked b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND b.rn > a.rn AND b.rn <= a.rn + 10
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


# Markov transition counts: adjacent (from, to) event types per user in
# (ts, event_id) order.
ORACLE["event_type_transitions"] = """
WITH l AS (
  SELECT user_id, event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events)
SELECT from_type, to_type, count(*) AS n_transitions
FROM l WHERE from_type IS NOT NULL GROUP BY 1, 2
"""


# Dedup-aware split: assignment hashed on the near-dup CLUSTER id; the
# leak audit recomputes cross-split pair counts for both the safe and
# the naive per-doc split from scratch.
ORACLE["leakage_safe_split"] = f"""
WITH clusters AS ({ORACLE['near_dup_clusters']}),
allc AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
assigned AS (
  SELECT doc_id, cluster_id,
         CASE WHEN {_h("concat_ws(chr(1), 'split', CAST(cluster_id AS VARCHAR))")} % 100 < 90 THEN 'train'
              WHEN {_h("concat_ws(chr(1), 'split', CAST(cluster_id AS VARCHAR))")} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split,
         CASE WHEN {_h("concat_ws(chr(1), 'split', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'train'
              WHEN {_h("concat_ws(chr(1), 'split', CAST(doc_id AS VARCHAR))")} % 100 < 95 THEN 'val'
              ELSE 'test' END AS naive_split
  FROM allc),
ndp AS (SELECT doc_a, doc_b FROM ({ORACLE['minhash_near_dup']})),
leaks AS (
  SELECT CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT)
           AS safe_leaky_pairs,
         CAST(sum(CASE WHEN a.naive_split <> b.naive_split THEN 1 ELSE 0 END) AS BIGINT)
           AS naive_leaky_pairs
  FROM ndp p JOIN assigned a ON p.doc_a = a.doc_id
             JOIN assigned b ON p.doc_b = b.doc_id)
SELECT split, count(*) AS n_docs, count(DISTINCT cluster_id) AS n_clusters,
       safe_leaky_pairs, naive_leaky_pairs
FROM assigned, leaks GROUP BY 1, 4, 5
"""


# Strict-order windowed funnel: a level-k chain is k CONSECUTIVE events
# of the user's (ts, event_id)-sorted stream matching steps 1..k, all
# within 24h of the chain's first event (see
# operators.timeseries.window_funnel_strict for why contiguity holds).
ORACLE["window_funnel_strict"] = """
WITH s AS (
  SELECT user_id, ts, event_type,
         lead(event_type, 1) OVER w AS t1, lead(ts, 1) OVER w AS ts1,
         lead(event_type, 2) OVER w AS t2, lead(ts, 2) OVER w AS ts2,
         lead(event_type, 3) OVER w AS t3, lead(ts, 3) OVER w AS ts3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
lvl AS (
  SELECT user_id,
    CASE WHEN event_type = 'signup' THEN
      CASE WHEN t1 = 'view' AND ts1 <= ts + INTERVAL 24 HOUR THEN
        CASE WHEN t2 = 'click' AND ts2 <= ts + INTERVAL 24 HOUR THEN
          CASE WHEN t3 = 'purchase' AND ts3 <= ts + INTERVAL 24 HOUR
               THEN 4 ELSE 3 END
        ELSE 2 END
      ELSE 1 END
    ELSE 0 END AS lv
  FROM s),
per_user AS (SELECT user_id, CAST(max(lv) AS BIGINT) AS steps_completed
             FROM lvl GROUP BY 1)
SELECT steps_completed, count(*) AS n_users FROM per_user GROUP BY 1
"""


# Default-mode windowFunnel — INDEPENDENT-construction oracle (the
# dau_wau precedent; exact integers): the CH chain-anchor fold is
# provably equivalent to "exists a single-anchor chain e1<...<ek, all
# within ts(e1)+W" (anchors only increase, so any fold chain maps to a
# single-anchor chain and vice versa), and for a FIXED anchor the
# greedy earliest-next-step chain is optimal (exchange argument).  So:
# per signup anchor, chase min-next view/click/purchase keys within the
# window.  (NOT list_reduce: DuckDB 1.0's grouped list_reduce leaks
# cross-group state at sf0.1 — verified single-group vs full-group.)
# Keys are hugeint (epoch_us * 1e9 + event_id): the total (ts, event_id)
# order as ONE comparable integer.
ORACLE["window_funnel_default"] = """
WITH f AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS HUGEINT) * 1000000000 + event_id AS k,
         epoch_us(ts) AS t, event_type AS et
  FROM events
  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
anch AS (SELECT user_id, k AS k1, t AS a FROM f WHERE et = 'signup'),
c2 AS (
  SELECT anch.user_id, anch.k1, anch.a, min(f.k) AS k2
  FROM anch JOIN f ON f.user_id = anch.user_id AND f.et = 'view'
                  AND f.k > anch.k1 AND f.t <= anch.a + 86400000000
  GROUP BY 1, 2, 3),
c3 AS (
  SELECT c2.user_id, c2.k1, c2.a, min(f.k) AS k3
  FROM c2 JOIN f ON f.user_id = c2.user_id AND f.et = 'click'
                AND f.k > c2.k2 AND f.t <= c2.a + 86400000000
  GROUP BY 1, 2, 3),
c4 AS (
  SELECT DISTINCT c3.user_id
  FROM c3 JOIN f ON f.user_id = c3.user_id AND f.et = 'purchase'
                AND f.k > c3.k3 AND f.t <= c3.a + 86400000000),
lv AS (
  SELECT user_id,
         CASE WHEN user_id IN (SELECT user_id FROM c4) THEN 4
              WHEN user_id IN (SELECT user_id FROM c3) THEN 3
              WHEN user_id IN (SELECT user_id FROM c2) THEN 2
              WHEN user_id IN (SELECT user_id FROM anch) THEN 1
              ELSE 0 END AS lvl
  FROM (SELECT DISTINCT user_id FROM events))
SELECT CAST(lvl AS BIGINT) AS steps_completed,
       CAST(count(*) AS BIGINT) AS n_users
FROM lv GROUP BY 1
"""


# strict_dedup funnel: under dedup-interrupt each anchor's chain is
# decided by the NEXT RELEVANT event (arg_min over next-step +
# satisfied-steps) — independent of the engine's fold.
ORACLE["window_funnel_strict_dedup"] = """
WITH f AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(epoch_us(ts) AS HUGEINT) * 1000000000 + event_id AS k,
         event_type AS et
  FROM events
  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
anch AS (SELECT user_id, k AS k1, t AS a FROM f WHERE et = 'signup'),
c2 AS (
  SELECT anch.user_id, anch.k1, anch.a,
         arg_min(f.et, f.k) AS et2, arg_min(f.t, f.k) AS t2, min(f.k) AS k2
  FROM anch JOIN f ON f.user_id = anch.user_id AND f.k > anch.k1
                  AND f.et IN ('signup', 'view')
  GROUP BY 1, 2, 3),
a2 AS (SELECT user_id, k1, a, k2 FROM c2 WHERE et2 = 'view' AND t2 <= a + 86400000000),
c3 AS (
  SELECT a2.user_id, a2.k1, a2.a,
         arg_min(f.et, f.k) AS et3, arg_min(f.t, f.k) AS t3, min(f.k) AS k3
  FROM a2 JOIN f ON f.user_id = a2.user_id AND f.k > a2.k2
                AND f.et IN ('signup', 'view', 'click')
  GROUP BY 1, 2, 3),
a3 AS (SELECT user_id, k1, a, k3 FROM c3 WHERE et3 = 'click' AND t3 <= a + 86400000000),
c4 AS (
  SELECT a3.user_id, a3.k1,
         arg_min(f.et, f.k) AS et4, arg_min(f.t, f.k) AS t4
  FROM a3 JOIN f ON f.user_id = a3.user_id AND f.k > a3.k3
  GROUP BY 1, 2),
a4 AS (SELECT DISTINCT c4.user_id FROM c4 JOIN a3 USING (user_id, k1)
       WHERE et4 = 'purchase' AND t4 <= a3.a + 86400000000),
lv AS (
  SELECT user_id,
         CASE WHEN user_id IN (SELECT user_id FROM a4) THEN 4
              WHEN user_id IN (SELECT user_id FROM a3) THEN 3
              WHEN user_id IN (SELECT user_id FROM a2) THEN 2
              WHEN user_id IN (SELECT user_id FROM anch) THEN 1
              ELSE 0 END AS lvl
  FROM (SELECT DISTINCT user_id FROM events))
SELECT CAST(lvl AS BIGINT) AS steps_completed, CAST(count(*) AS BIGINT) AS n_users
FROM lv GROUP BY 1
"""


# Rolling exact median (quantileExactLow/High conventions): selection
# only, via the SAME explicit order statistic the engine computes —
# list_sort of the windowed list indexed at (n+1)//2 and n//2+1.  The
# r10 gate proved quantile_disc's discrete-index convention drifts
# across DuckDB builds (bit-exact under local 1.0.0, red in the driver
# env); explicit sorted-list selection over exact decimals has no
# engine-owned convention left to drift (SURVEY §5 portability class 4).
# sparkbar: dense 24-slot integer-micros profile, SQL-standard ntile-free
# level rule in pure int64 (mirrors SPARKBAR_CHARS codepoint indexing).
ORACLE["sparkbar_hourly_revenue"] = """
WITH per AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
         CAST(sum(CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT))
              AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, CAST(g.h AS BIGINT) AS h
  FROM (SELECT DISTINCT event_type FROM per) t
  CROSS JOIN (SELECT unnest(range(0, 24)) AS h) g),
dense AS (
  SELECT grid.event_type, grid.h, coalesce(per.v, 0) AS v
  FROM grid LEFT JOIN per USING (event_type, h)),
lv AS (
  SELECT event_type, h, v,
         min(v) OVER (PARTITION BY event_type) AS vmin,
         max(v) OVER (PARTITION BY event_type) AS vmax
  FROM dense),
ch AS (
  SELECT event_type, h, v, vmin, vmax,
         substr('▁▂▃▄▅▆▇█',
                CAST(CASE WHEN vmax > vmin
                          THEN ((v - vmin) * 7) // (vmax - vmin)
                          ELSE 7 END AS INTEGER) + 1, 1) AS glyph
  FROM lv)
SELECT event_type,
       string_agg(glyph, '' ORDER BY h) AS sparkbar,
       CAST(min(v) AS BIGINT) AS min_hour_micros,
       CAST(max(v) AS BIGINT) AS max_hour_micros,
       CAST(sum(v) AS BIGINT) AS total_micros
FROM ch GROUP BY 1
"""


# URL battery: the oracle re-derives each part with split/regexp over the
# identically-constructed well-formed URL (pure string facts).
ORACLE["url_functions_battery"] = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || lang || '/'
           || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&p='
           || CAST(doc_id % 7 AS VARCHAR) || '#s'
           || CAST(doc_id % 3 AS VARCHAR) AS url,
         source, lang
  FROM documents)
SELECT doc_id, url,
       'https' AS protocol,
       source || '.example.com' AS host,
       'com' AS tld,
       '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url_path,
       'lang=' || lang || '&p=' || CAST(doc_id % 7 AS VARCHAR)
         AS query_string,
       lang AS lang_param,
       CAST(doc_id % 7 AS VARCHAR) AS p_param,
       's' || CAST(doc_id % 3 AS VARCHAR) AS fragment
FROM u
"""


# Hopping-window streaming MV: 2-way window explode (each event's two
# hour-aligned 2h-window starts), finalized set = watermark-passed ends.
ORACLE["stream_sliding_rollup_events"] = """
SELECT win_start, category, order_count, total_revenue, total_quantity
FROM (
  SELECT win_start,
         'cat_' || CAST(coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) % 5 AS VARCHAR) AS category,
         count(*) AS order_count,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue,
         CAST(sum(coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS total_quantity
  FROM (
    SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS win_start, props, value
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT date_trunc('hour', ts) AS win_start, props, value
    FROM events WHERE event_type = 'purchase')
  GROUP BY 1, 2
) a, (SELECT max(ts) AS max_ts FROM events) m
WHERE a.win_start + INTERVAL 2 HOUR <= m.max_ts - INTERVAL 2 HOUR
"""


def _power_iter_sql(dim: int = 64, epochs: int = 3) -> str:
    """Unrolled power-iteration epochs mirroring
    operators.similarity.embedding_top_pc_power_iter: per-epoch projected
    dot chain (left fold, textual mirror of the Spark/driver arithmetic),
    integer-octopart term quantization, exact int64 sums, normalization
    recomputed from bigint->double-exact values with identical op order.
    """
    parts = ["v0 AS (SELECT " + ", ".join(f"0.125 AS v{j}" for j in range(dim)) + ")"]
    for e in range(1, epochs + 1):
        chain = "0.0 + " + " + ".join(
            f"CAST(embedding[{j + 1}] AS DOUBLE) * v{j}" for j in range(dim)
        )
        parts.append(
            f"p{e} AS (SELECT ({chain}) AS d, embedding"
            f" FROM embeddings CROSS JOIN v{e - 1})"
        )
        sums = ", ".join(
            f"CAST(sum(CAST(floor(d * CAST(embedding[{j + 1}] AS DOUBLE)"
            f" * 100000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s{j}"
            for j in range(dim)
        )
        parts.append(f"e{e} AS (SELECT {sums} FROM p{e})")
        if e < epochs:
            norm = "sqrt(0.0 + " + " + ".join(
                f"CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE)" for j in range(dim)
            ) + ")"
            vcols = ", ".join(
                f"CAST(s{j} AS DOUBLE) / nrm AS v{j}" for j in range(dim)
            )
            parts.append(
                f"v{e} AS (SELECT {vcols} FROM"
                f" (SELECT *, {norm} AS nrm FROM e{e}))"
            )
    norm = "sqrt(0.0 + " + " + ".join(
        f"CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE)" for j in range(dim)
    ) + ")"
    parts.append(f"nm AS (SELECT *, {norm} AS nrm FROM e{epochs})")
    parts.append("cnt AS (SELECT count(*) AS c FROM embeddings)")
    branches = "\nUNION ALL\n".join(
        f"SELECT CAST({j + 1} AS BIGINT) AS dim,"
        f" CAST(floor(CAST(s{j} AS DOUBLE) / nrm * 1000000.0 + 0.5) AS BIGINT)"
        f" AS loading_micros,"
        f" CAST(floor(nrm / (100000000.0 * CAST(c AS DOUBLE)) * 1000000.0"
        f" + 0.5) AS BIGINT) AS eigenvalue_micros FROM nm, cnt"
        for j in range(dim)
    )
    return "WITH " + ",\n".join(parts) + "\n" + branches


ORACLE["embedding_top_pc_power_iter"] = _power_iter_sql()


# boundingRatio: endpoint selection via min/max over (ts, event_id, v)
# structs mirrored as DuckDB arg_min/arg_max on the composite key; slope
# through the floor chain over exact-integer-derived doubles.
ORACLE["bounding_ratio_battery"] = """
WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(value AS DECIMAL(25,6)) AS v,
         CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id AS k
  FROM events),
a AS (
  SELECT event_type,
         arg_min(ts, k) AS first_ts, arg_max(ts, k) AS last_ts,
         CAST(arg_min(v, k) * 1000000 AS BIGINT) AS y_first_micros,
         CAST(arg_max(v, k) * 1000000 AS BIGINT) AS y_last_micros,
         CAST(arg_min(epoch_us(ts), k) AS BIGINT) AS x_first_us,
         CAST(arg_max(epoch_us(ts), k) AS BIGINT) AS x_last_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1)
SELECT event_type, first_ts, last_ts, y_first_micros, y_last_micros,
       y_last_micros - y_first_micros AS dy_micros,
       x_last_us - x_first_us AS dx_us,
       n_events,
       CAST(floor(CAST(y_last_micros - y_first_micros AS DOUBLE)
                  / CAST(x_last_us - x_first_us AS DOUBLE)
                  * 1000000000.0 + 0.5) AS BIGINT) AS slope_nanos_per_us
FROM a
"""


# quantileTiming: the documented accuracy contract (exact < 1024 ms,
# 16 ms resolution to 30 s, clamped) + Low selection (k = ceil(p*n)) —
# all integer arithmetic off the value-frequency table.
ORACLE["quantile_timing_battery"] = """
WITH t AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DECIMAL(25,6)) * 10) AS BIGINT) AS ms
  FROM events),
bk AS (
  SELECT event_type, ms,
         CASE WHEN ms < 1024 THEN ms
              ELSE 1024 + ((least(ms, 30000) - 1024)
                           - ((least(ms, 30000) - 1024) % 16)) END AS b
  FROM t),
vf AS (
  SELECT event_type, b, count(*) AS cnt,
         sum(CASE WHEN ms < 1024 THEN 1 ELSE 0 END) AS n_exact_part
  FROM bk GROUP BY 1, 2),
cum AS (
  SELECT event_type, b, cnt, n_exact_part,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM vf)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(sum(n_exact_part) AS BIGINT) AS n_exact_regime,
       CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN b END) AS BIGINT)
         AS p50_ms,
       CAST(min(CASE WHEN cum >= (95 * n + 99) // 100 THEN b END) AS BIGINT)
         AS p95_ms,
       CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN b END) AS BIGINT)
         AS p99_ms
FROM cum GROUP BY 1
"""


# groupArrayMovingAvg: frame sums quantize to integer micros, each
# element ONE mirrored exact integer division by the ACTUAL frame size.
ORACLE["group_array_moving_avg"] = """
WITH b AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
              OVER w * 1000000 AS BIGINT) AS s6,
         CAST(count(*) OVER w AS BIGINT) AS k
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)),
m AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST((2 * s6 + k) // (2 * k) AS BIGINT) AS avg3_micros
  FROM b)
SELECT o_custkey,
       array_to_string(
         list(CAST(avg3_micros AS VARCHAR) ORDER BY o_orderdate, o_orderkey),
         ',') AS moving_avg3_micros_csv,
       CAST(count(*) AS BIGINT) AS n_orders
FROM m GROUP BY 1
"""


# T5 span-corruption plan: deterministic seeded-hash span placement,
# all integer/hash arithmetic (the dsir_resample hash convention).
ORACLE["span_corruption_plan"] = f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
b AS (
  SELECT doc_id, n_tokens,
         greatest(1, (n_tokens * 15 // 100) // 3) AS n_spans
  FROM d),
ex AS (
  SELECT doc_id, n_tokens, n_spans,
         CAST(unnest(range(0, n_spans)) AS BIGINT) AS i
  FROM b),
s AS (
  SELECT doc_id, n_tokens, n_spans,
         i * (n_tokens // n_spans)
           + ({_h("concat_ws(chr(1), 'span', concat_ws(':', CAST(doc_id AS VARCHAR), CAST(i AS VARCHAR)))")}
              % greatest(1, n_tokens // n_spans - 3)) AS start
  FROM ex),
sl AS (
  SELECT doc_id, n_tokens, n_spans, start,
         least(3, n_tokens - start) AS span_len
  FROM s)
SELECT doc_id,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       CAST(max(n_spans) AS BIGINT) AS n_spans,
       CAST(sum(span_len) AS BIGINT) AS n_corrupted,
       CAST((2 * CAST(sum(span_len) AS BIGINT) * 1000000 + max(n_tokens))
            // (2 * max(n_tokens)) AS BIGINT) AS corruption_micros,
       array_to_string(list(CAST(start AS VARCHAR) ORDER BY start), ',')
         AS span_starts_csv
FROM sl GROUP BY 1
"""


# IPv4 battery: pure integer bit arithmetic + string round-trip, per-/8
# rollup; the oracle recomputes the render AND the reparse.
ORACLE["ip_functions_battery"] = f"""
WITH h AS (
  SELECT event_type,
         {_h("concat_ws(chr(1), 'ip', concat_ws(':', CAST(user_id AS VARCHAR), CAST(event_id AS VARCHAR)))")}
           & 4294967295 AS ip
  FROM events),
b AS (
  SELECT event_type, ip,
         (ip >> 24) & 255 AS o1, (ip >> 16) & 255 AS o2,
         (ip >> 8) & 255 AS o3, ip & 255 AS o4
  FROM h),
r AS (
  SELECT event_type, o1, ip,
         CAST(string_split(s, '.')[1] AS BIGINT) * 16777216
           + CAST(string_split(s, '.')[2] AS BIGINT) * 65536
           + CAST(string_split(s, '.')[3] AS BIGINT) * 256
           + CAST(string_split(s, '.')[4] AS BIGINT) = ip AS roundtrip_ok,
         ip - o4 AS net24,
         (o1 = 10) OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
           OR (o1 = 192 AND o2 = 168) AS is_private
  FROM (SELECT *, concat_ws('.', CAST(o1 AS VARCHAR), CAST(o2 AS VARCHAR),
                            CAST(o3 AS VARCHAR), CAST(o4 AS VARCHAR)) AS s
        FROM b))
SELECT CAST(o1 AS BIGINT) AS block8,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT ip) AS BIGINT) AS n_distinct_ips,
       CAST(count(DISTINCT net24) AS BIGINT) AS n_distinct_nets24,
       CAST(sum(CASE WHEN is_private THEN 1 ELSE 0 END) AS BIGINT)
         AS n_private,
       CAST(min(ip) AS BIGINT) AS min_ip,
       CAST(max(ip) AS BIGINT) AS max_ip,
       min(CASE WHEN NOT roundtrip_ok THEN 1 END) IS NULL AS all_roundtrip_ok
FROM r GROUP BY 1
"""


# OPTIMIZE ... DEDUPLICATE: full-row dedup must restore exactly one
# copy of every rollup row — the oracle is the plain A1 rollup.
ORACLE["optimize_deduplicate_rollup"] = ORACLE["hourly_category_rollup"]

# arrayCumSum/arrayDifference/arrayCompact: window transforms before
# collection, CSV of exact int64 — element order pinned by the unique
# (orderdate, orderkey) sort in both engines.
ORACLE["array_transform_battery"] = """
WITH b AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS p
  FROM orders),
t AS (
  SELECT o_custkey, o_orderdate, o_orderkey, p,
         sum(p) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         p - coalesce(lag(p) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey), 0)
           AS diff,
         CASE WHEN lag(p) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) IS NULL
                   OR lag(p) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) <> p
              THEN 1 ELSE 0 END AS is_new_run
  FROM b)
SELECT o_custkey,
       array_to_string(list(CAST(p AS VARCHAR)
                            ORDER BY o_orderdate, o_orderkey), ',')
         AS prices_micros_csv,
       array_to_string(list(CAST(cum AS VARCHAR)
                            ORDER BY o_orderdate, o_orderkey), ',')
         AS cumsum_csv,
       array_to_string(list(CAST(diff AS VARCHAR)
                            ORDER BY o_orderdate, o_orderkey), ',')
         AS difference_csv,
       CAST(sum(is_new_run) AS BIGINT) AS compact_len,
       CAST(count(*) AS BIGINT) AS n_orders
FROM t GROUP BY 1
"""


# Gini-Simpson diversity: exact integer power sums, one floor chain.
ORACLE["token_diversity_simpson"] = """
WITH vf AS (
  SELECT source, word, count(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY 1, 2),
a AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct_tokens,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM vf GROUP BY 1)
SELECT source, n_tokens, n_distinct_tokens,
       CAST(floor(CAST(s2 AS DOUBLE)
                  / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS hhi_micros,
       1000000 - CAST(floor(CAST(s2 AS DOUBLE)
                  / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS simpson_micros
FROM a
"""


# UNPIVOT round-trip: melt(pivot(x)) == the plain GROUP BY.
ORACLE["status_unpivot_roundtrip"] = """
SELECT o_orderpriority AS priority, o_orderstatus AS order_status,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1, 2
"""


# l-diversity: integer counts + one mirrored integer division.
ORACLE["l_diversity_report"] = """
WITH per AS (
  SELECT n_name, c_mktsegment, count(*) AS cnt
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT n_name AS nation,
       CAST(sum(cnt) AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS l_distinct_sensitive,
       CAST(max(cnt) AS BIGINT) AS dominant_count,
       CAST((2 * max(cnt) * 1000000 + sum(cnt)) // (2 * sum(cnt)) AS BIGINT)
         AS dominant_share_micros,
       count(*) >= 3 AS is_3_diverse
FROM per GROUP BY 1
"""


# DQ expectation suite: every check recomputed independently in SQL.
ORACLE["dq_expectations_report"] = """
WITH o AS (SELECT count(*) AS n,
                  sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nk,
                  sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS np,
                  sum(CASE WHEN o_orderdate < DATE '1990-01-01'
                            OR o_orderdate > DATE '2005-12-31'
                           THEN 1 ELSE 0 END) AS dob,
                  sum(CASE WHEN o_orderdate > DATE '1997-12-31'
                           THEN 1 ELSE 0 END) AS stale,
                  count(DISTINCT o_orderkey) AS ndk
           FROM orders),
c AS (SELECT count(*) AS n, count(DISTINCT c_custkey) AS nd FROM customer),
l AS (SELECT count(*) AS n,
             sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                      THEN 1 ELSE 0 END) AS qob
      FROM lineitem),
fkc AS (SELECT count(*) AS v FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
fko AS (SELECT count(*) AS v FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
SELECT * FROM (
  SELECT 'orders.o_orderkey not_null' AS check_name,
         CAST(n AS BIGINT) AS n_checked, CAST(nk AS BIGINT) AS n_violations,
         nk = 0 AS passed FROM o
  UNION ALL SELECT 'orders.o_totalprice positive', CAST(n AS BIGINT),
         CAST(np AS BIGINT), np = 0 FROM o
  UNION ALL SELECT 'orders.o_orderdate in_range', CAST(n AS BIGINT),
         CAST(dob AS BIGINT), dob = 0 FROM o
  UNION ALL SELECT 'orders.o_orderdate sla_1997', CAST(n AS BIGINT),
         CAST(stale AS BIGINT), stale = 0 FROM o
  UNION ALL SELECT 'orders.o_orderkey unique', CAST(n AS BIGINT),
         CAST(n - ndk AS BIGINT), n = ndk FROM o
  UNION ALL SELECT 'customer.c_custkey unique', CAST(n AS BIGINT),
         CAST(n - nd AS BIGINT), n = nd FROM c
  UNION ALL SELECT 'lineitem.l_quantity in_1_50', CAST(n AS BIGINT),
         CAST(qob AS BIGINT), qob = 0 FROM l
  UNION ALL SELECT 'orders.o_custkey fk_customer',
         CAST((SELECT n FROM o) AS BIGINT), CAST(v AS BIGINT), v = 0 FROM fkc
  UNION ALL SELECT 'lineitem.l_orderkey fk_orders',
         CAST((SELECT n FROM l) AS BIGINT), CAST(v AS BIGINT), v = 0 FROM fko)
"""


# Prometheus histogram_quantile: le-bucket interpolation, mirrored.
ORACLE["prometheus_histogram_quantile"] = """
WITH bk AS (
  SELECT event_type, CASE WHEN v <= 10.0 THEN 0 WHEN v <= 25.0 THEN 1 WHEN v <= 50.0 THEN 2 WHEN v <= 100.0 THEN 3 WHEN v <= 150.0 THEN 4 WHEN v <= 200.0 THEN 5 ELSE 6 END AS b
  FROM (SELECT event_type, value AS v FROM events)),
vf AS (SELECT event_type, b, count(*) AS cnt FROM bk GROUP BY 1, 2),
cum AS (
  SELECT event_type, b, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt AS cum_prev,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM vf),
q AS (
  SELECT event_type, max(n) AS n,
         min(CASE WHEN CAST(cum AS DOUBLE) >= CAST(n AS DOUBLE) * 0.5 THEN b END) AS b50,
         min(CASE WHEN CAST(cum AS DOUBLE) >= CAST(n AS DOUBLE) * 0.9 THEN b END) AS b90,
         min(CASE WHEN CAST(cum AS DOUBLE) >= CAST(n AS DOUBLE) * 0.99 THEN b END) AS b99
  FROM cum GROUP BY 1),
j50 AS (SELECT q.event_type, cum.cum_prev AS cp, cum.cnt AS c
        FROM q JOIN cum ON cum.event_type = q.event_type AND cum.b = q.b50),
j90 AS (SELECT q.event_type, cum.cum_prev AS cp, cum.cnt AS c
        FROM q JOIN cum ON cum.event_type = q.event_type AND cum.b = q.b90),
j99 AS (SELECT q.event_type, cum.cum_prev AS cp, cum.cnt AS c
        FROM q JOIN cum ON cum.event_type = q.event_type AND cum.b = q.b99)
SELECT q.event_type, CAST(q.n AS BIGINT) AS n_events,
       floor((CASE WHEN q.b50 >= 6 THEN 200.0 ELSE ([0.0, 10.0, 25.0, 50.0, 100.0, 150.0])[q.b50 + 1] + (([10.0, 25.0, 50.0, 100.0, 150.0, 200.0])[q.b50 + 1] - ([0.0, 10.0, 25.0, 50.0, 100.0, 150.0])[q.b50 + 1]) * (CAST(q.n AS DOUBLE) * 0.5 - CAST(j50.cp AS DOUBLE)) / CAST(j50.c AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0 AS q50,
       floor((CASE WHEN q.b90 >= 6 THEN 200.0 ELSE ([0.0, 10.0, 25.0, 50.0, 100.0, 150.0])[q.b90 + 1] + (([10.0, 25.0, 50.0, 100.0, 150.0, 200.0])[q.b90 + 1] - ([0.0, 10.0, 25.0, 50.0, 100.0, 150.0])[q.b90 + 1]) * (CAST(q.n AS DOUBLE) * 0.9 - CAST(j90.cp AS DOUBLE)) / CAST(j90.c AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0 AS q90,
       floor((CASE WHEN q.b99 >= 6 THEN 200.0 ELSE ([0.0, 10.0, 25.0, 50.0, 100.0, 150.0])[q.b99 + 1] + (([10.0, 25.0, 50.0, 100.0, 150.0, 200.0])[q.b99 + 1] - ([0.0, 10.0, 25.0, 50.0, 100.0, 150.0])[q.b99 + 1]) * (CAST(q.n AS DOUBLE) * 0.99 - CAST(j99.cp AS DOUBLE)) / CAST(j99.c AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0 AS q99
FROM q
JOIN j50 ON j50.event_type = q.event_type
JOIN j90 ON j90.event_type = q.event_type
JOIN j99 ON j99.event_type = q.event_type
"""


# Date battery: ISO-Monday week truncation, ISO week, quarter, integer
# month age — pure calendar arithmetic in both engines.
ORACLE["date_functions_battery"] = """
WITH b AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
         CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
         CAST(quarter(o_orderdate) AS BIGINT) AS quarter,
         CAST(dayofyear(o_orderdate) AS BIGINT) AS day_of_year,
         CAST((2000 * 12 + 1)
              - (year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT)
           AS age_months_to_y2k
  FROM orders)
SELECT week_start,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(order_date) AS first_date,
       max(order_date) AS last_date,
       CAST(min(iso_week) AS BIGINT) AS iso_week_min,
       CAST(max(iso_week) AS BIGINT) AS iso_week_max,
       CAST(min(quarter) AS BIGINT) AS q_min,
       CAST(max(quarter) AS BIGINT) AS q_max,
       CAST(min(day_of_year) AS BIGINT) AS doy_min,
       CAST(max(age_months_to_y2k) AS BIGINT) AS age_months_max
FROM b GROUP BY 1
"""


# ntile quartile banding: total order via the event_id tiebreak makes
# the SQL-standard bucket rule position-determined in both engines.
ORACLE["ntile_value_bands"] = """
WITH b AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS v,
         CAST(value AS DECIMAL(25,6)) AS vdec,
         ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS band
  FROM events)
SELECT event_type, CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_events,
       min(v) AS band_min_micros, max(v) AS band_max_micros,
       CAST(sum(vdec) * 1000000 AS BIGINT) AS band_sum_micros
FROM b GROUP BY 1, 2
"""


ORACLE["rolling_median_daily_revenue"] = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(value AS DECIMAL(25,6))) * 1000000 AS BIGINT)
           AS revenue_micros
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
w AS (
  SELECT day, revenue_micros,
         CAST(count(*) OVER win AS BIGINT) AS n_window,
         list_sort(list(revenue_micros) OVER win) AS warr
  FROM d
  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT day, revenue_micros, n_window,
       warr[CAST((n_window + 1) // 2 AS BIGINT)] AS median_low_micros,
       warr[CAST(n_window // 2 + 1 AS BIGINT)] AS median_high_micros
FROM w
"""


# Time-constrained sequenceMatch: first-following-view identity makes
# one reversed running-min window answer the whole gap grid.
ORACLE["sequence_match_gap_battery"] = """
WITH f AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type AS et
  FROM events WHERE event_type IN ('signup', 'view')),
nx AS (
  SELECT user_id, t, et,
         min(CASE WHEN et = 'view' THEN t END)
           OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
  FROM f),
gaps AS (
  SELECT user_id, nv - t AS gap_us FROM nx
  WHERE et = 'signup' AND nv IS NOT NULL),
g AS (SELECT CAST(unnest([300, 3600, 21600, 86400]) AS BIGINT) AS gap_s),
matched AS (
  SELECT gap_s, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM gaps CROSS JOIN g
  WHERE gap_us <= gap_s * CAST(1000000 AS BIGINT)
  GROUP BY 1),
tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total FROM events)
SELECT g.gap_s, COALESCE(m.n_users, 0) AS n_users,
       floor(CAST(COALESCE(m.n_users, 0) AS DOUBLE) / CAST(n_total AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS user_frac
FROM g LEFT JOIN matched m ON g.gap_s = m.gap_s CROSS JOIN tot
"""


# Sweep-line max-overlap: +1/-1 deltas at DATE grain, per-region running
# sum, first date attaining the per-region max.
ORACLE["max_concurrent_intervals"] = """
WITH o AS (
  SELECT r_name, CAST(o_orderdate AS DATE) AS start_d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey),
deltas AS (
  SELECT r_name, d, SUM(delta) AS delta FROM (
    SELECT r_name, start_d AS d, 1 AS delta FROM o
    UNION ALL
    SELECT r_name, start_d + 30 AS d, -1 AS delta FROM o)
  GROUP BY 1, 2),
cum AS (
  SELECT r_name, d,
         SUM(delta) OVER (PARTITION BY r_name ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS concurrent
  FROM deltas),
mx AS (SELECT r_name, d, concurrent,
              max(concurrent) OVER (PARTITION BY r_name) AS m FROM cum)
SELECT r_name, CAST(max(concurrent) AS BIGINT) AS peak_concurrent,
       min(d) AS peak_date
FROM mx WHERE concurrent = m GROUP BY 1
"""


# Exact weighted quantiles: cumulative DECIMAL weight, cross-multiplied
# thresholds (no fractional literals near decimals).
ORACLE["weighted_value_percentiles"] = """
WITH c AS (
  SELECT l_returnflag, l_extendedprice, CAST(l_quantity AS DECIMAL(25,6)) AS q,
         SUM(CAST(l_quantity AS DECIMAL(25,6))) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(CAST(l_quantity AS DECIMAL(25,6))) OVER (
           PARTITION BY l_returnflag) AS tot
  FROM lineitem)
SELECT l_returnflag,
       min(CASE WHEN cw * 4 >= tot THEN l_extendedprice END) AS wp25,
       min(CASE WHEN cw * 2 >= tot THEN l_extendedprice END) AS wp50,
       min(CASE WHEN cw * 4 >= tot * 3 THEN l_extendedprice END) AS wp75,
       CAST(SUM(q) AS DOUBLE) AS total_weight
FROM c GROUP BY 1
"""


# ClickHouse -If combinator battery: FILTER-style conditional aggregates
# in one grouped pass.
ORACLE["conditional_agg_rollup"] = """
SELECT n_name,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
              FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_revenue,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
              FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
         / count(*) FILTER (WHERE o_orderstatus = 'F') AS avg_final_price,
       count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
         AS open_customers,
       max(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT')
         AS max_urgent_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


# Novelty = share of a doc's capped shingles with corpus df == 1, as
# exact integer ppm (integer division — no float rounding cross-engine).
ORACLE["ngram_novelty_score"] = f"""
WITH {_SHINGLES},
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       (CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         // count(*) AS novelty_ppm
FROM sh JOIN dfreq USING (shingle)
GROUP BY 1
"""


# Linear quality probe trained by full-batch GD: unrolled epoch CTEs
# (the kmeans_train discipline) — each epoch's gradients fold round-6
# contributions through DECIMAL(25,6), weights replay the same IEEE
# arithmetic the Spark driver loop performs.
def _linear_probe_sql(epochs: int = 3, eta: str = "0.5") -> str:
    feats = """f AS (
  SELECT doc_id,
         len(string_split(text,' ')) / 128.0 AS x1,
         ((length(text) - (len(string_split(text,' ')) - 1)) * 1.0
            / len(string_split(text,' '))) / 8.0 AS x2,
         len(list_distinct(string_split(text,' '))) * 1.0
            / len(string_split(text,' ')) AS x3,
         len(list_filter(string_split(text,' '), t -> t IN ('a','the'))) * 1.0
            / len(string_split(text,' ')) AS x4,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents)"""

    def pred(w: str) -> str:
        return f"({w}.wb + {w}.w1 * x1 + {w}.w2 * x2 + {w}.w3 * x3 + {w}.w4 * x4)"

    def gsum(expr: str) -> str:
        return (
            f"CAST(SUM(CAST(round({expr}, 6) AS DECIMAL(25,6))) AS DOUBLE)"
            " / COUNT(*)"
        )

    parts = [
        feats,
        "w0 AS (SELECT 0.0 AS wb, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)",
    ]
    for n in range(1, epochs + 1):
        p = pred(f"w{n-1}")
        parts.append(
            f"""g{n} AS (
  SELECT {gsum(f"({p} - y)")} AS gb,
         {gsum(f"({p} - y) * x1")} AS g1,
         {gsum(f"({p} - y) * x2")} AS g2,
         {gsum(f"({p} - y) * x3")} AS g3,
         {gsum(f"({p} - y) * x4")} AS g4
  FROM f CROSS JOIN w{n-1}),
w{n} AS (
  SELECT w{n-1}.wb - {eta} * gb AS wb, w{n-1}.w1 - {eta} * g1 AS w1,
         w{n-1}.w2 - {eta} * g2 AS w2, w{n-1}.w3 - {eta} * g3 AS w3,
         w{n-1}.w4 - {eta} * g4 AS w4
  FROM g{n} CROSS JOIN w{n-1})"""
        )
    p0, pf = pred("w0"), pred(f"w{epochs}")
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT w{epochs}.wb, w{epochs}.w1, w{epochs}.w2, w{epochs}.w3, w{epochs}.w4,
       (SELECT {gsum(f"({p0} - y) * ({p0} - y)")} FROM f CROSS JOIN w0)
         AS mse_init,
       (SELECT {gsum(f"({pf} - y) * ({pf} - y)")} FROM f CROSS JOIN w{epochs})
         AS mse_final
FROM w{epochs}"""
    )


ORACLE["quality_linear_probe_train"] = _linear_probe_sql()


# VAD segments over the wav rows (doc_id % 3 = 2 is media_table's wav
# assignment): frame means from the UTF-8 payload bytes, threshold 94,
# lag/cumsum segment merge.
ORACLE["audio_vad_segments"] = """
WITH b AS (
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents WHERE doc_id % 3 = 2),
fr AS (
  SELECT doc_id, t.f AS frame_idx, bytes[(t.f*64+1):(t.f*64+64)] AS fb
  FROM b, UNNEST(range(0, CAST(ceil(len(bytes) / 64.0) AS BIGINT))) AS t(f)),
m AS (
  SELECT doc_id, frame_idx,
         list_reduce(list_prepend(CAST(0 AS BIGINT), fb), (a, x) -> a + x)
           / CAST(len(fb) AS DOUBLE) AS frame_mean
  FROM fr),
v AS (
  SELECT doc_id, frame_idx, frame_mean >= 94 AS voiced FROM m),
seg AS (
  SELECT doc_id, frame_idx, voiced,
         CASE WHEN voiced AND NOT coalesce(
                lag(voiced) OVER (PARTITION BY doc_id ORDER BY frame_idx),
                FALSE)
              THEN 1 ELSE 0 END AS st
  FROM v),
seg2 AS (
  SELECT doc_id, frame_idx, voiced, st,
         SUM(st) OVER (PARTITION BY doc_id ORDER BY frame_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS seg_id
  FROM seg),
per_doc AS (
  SELECT doc_id, count(*) AS n_frames,
         CAST(SUM(CASE WHEN voiced THEN 1 ELSE 0 END) AS BIGINT) AS n_voiced,
         CAST(SUM(st) AS BIGINT) AS n_segments
  FROM seg2 GROUP BY 1),
runs AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS longest FROM (
    SELECT doc_id, seg_id, count(*) AS c FROM seg2 WHERE voiced GROUP BY 1, 2)
  GROUP BY 1)
SELECT p.doc_id, p.n_frames, p.n_voiced, p.n_segments,
       coalesce(r.longest, 0) AS longest_voiced_run
FROM per_doc p LEFT JOIN runs r ON p.doc_id = r.doc_id
"""


# Forward as-of with tolerance: next purchase strictly after each error
# in (ts, event_id) order; recovered iff within 24h.
ORACLE["error_recovery_asof"] = """
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p
  FROM events)
SELECT event_id, user_id, ts AS err_ts,
       next_p IS NOT NULL AND next_p <= ts + INTERVAL 24 HOUR AS recovered,
       CASE WHEN next_p IS NOT NULL AND next_p <= ts + INTERVAL 24 HOUR
            THEN (epoch_us(next_p) - epoch_us(ts)) / 1000000.0 END
         AS latency_sec
FROM s WHERE event_type = 'error'
"""


# LOCF gap fill: the dense axis + IGNORE NULLS running last_value.
ORACLE["hourly_gap_fill_locf"] = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, {_dsum('value')} AS revenue
  FROM events GROUP BY 1),
span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hourly),
axis AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM span)
SELECT axis.hour,
       revenue IS NOT NULL AS observed,
       last_value(revenue IGNORE NULLS)
         OVER (ORDER BY axis.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_locf
FROM axis LEFT JOIN hourly ON axis.hour = hourly.hour
"""


# Deterministic A/B assignment + SRM chi2 contributions: md5-bucket
# arms, mirrored integer->double 3-op chain.
ORACLE["ab_assignment_srm"] = """
WITH users AS (SELECT DISTINCT user_id FROM events),
per AS (
  SELECT CAST('0x' || substr(md5('ab:v1:' || CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 4 AS variant,
         count(*) AS n_users
  FROM users GROUP BY 1),
tot AS (SELECT sum(n_users) AS n_total FROM per)
SELECT CAST(variant AS BIGINT) AS variant,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_total AS BIGINT) AS n_total,
       round(((CAST(n_users AS DOUBLE) - CAST(n_total AS DOUBLE) / 4.0)
              * (CAST(n_users AS DOUBLE) - CAST(n_total AS DOUBLE) / 4.0))
             / (CAST(n_total AS DOUBLE) / 4.0), 6) AS chi2_contrib
FROM per, tot
"""


# Top event trigram paths: ordered per-user sequence -> overlapping
# trigrams -> count -> deterministic top-10.
ORACLE["session_path_topk"] = """
WITH seqs AS (
  SELECT user_id,
         list(event_type ORDER BY ts, event_id) AS seq
  FROM events GROUP BY 1),
tri AS (
  SELECT seq[i] || '>' || seq[i+1] || '>' || seq[i+2] AS path
  FROM seqs, unnest(range(1, len(seq) - 1)) AS t(i)
  WHERE len(seq) >= 3)
SELECT path, n_paths, rank FROM (
  SELECT path, CAST(count(*) AS BIGINT) AS n_paths,
         CAST(row_number() OVER (ORDER BY count(*) DESC, path ASC) AS BIGINT)
           AS rank
  FROM tri GROUP BY path)
WHERE rank <= 10
"""


# YoY growth: month aggregate + shifted self-join, one division.
ORACLE["yoy_monthly_growth"] = f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         CAST(count(*) AS BIGINT) AS n_orders,
         {_dsum('o_totalprice')} AS revenue
  FROM orders GROUP BY 1)
SELECT m.ym, m.n_orders, m.revenue,
       p.revenue AS prior_revenue,
       round(m.revenue / p.revenue, 6) AS yoy_ratio
FROM monthly m LEFT JOIN monthly p ON m.ym = p.ym + 100
"""


# New vs returning: first-day flag over the (user, day) distinct grid.
ORACLE["new_vs_returning_daily"] = """
WITH ud AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2),
marked AS (
  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS first_day
  FROM ud)
SELECT day,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users,
       CAST(count(*) AS BIGINT) AS dau
FROM marked GROUP BY 1
"""


# Power-user curve: active-days histogram, exact integers.
ORACLE["power_user_curve"] = """
WITH per_user AS (
  SELECT user_id, count(*) AS active_days
  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
  GROUP BY 1)
SELECT CAST(active_days AS BIGINT) AS active_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1
"""


# Wilson CI: the same +,-,*,/,sqrt chain over exact integers, z literal.
ORACLE["conversion_rate_wilson_ci"] = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1),
g AS (
  SELECT CAST('0x' || substr(md5('ab:v1:' || CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 4 AS variant,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY 1)
SELECT CAST(variant AS BIGINT) AS variant, n, n_converted,
       round(CAST(n_converted AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       round(((CAST(n_converted AS DOUBLE) / CAST(n AS DOUBLE)
               + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
              - 1.96 * sqrt((CAST(n_converted AS DOUBLE) / CAST(n AS DOUBLE))
                            * (1.0 - CAST(n_converted AS DOUBLE) / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)
                            + (1.96 * 1.96)
                              / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS ci_lo,
       round(((CAST(n_converted AS DOUBLE) / CAST(n AS DOUBLE)
               + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
              + 1.96 * sqrt((CAST(n_converted AS DOUBLE) / CAST(n AS DOUBLE))
                            * (1.0 - CAST(n_converted AS DOUBLE) / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)
                            + (1.96 * 1.96)
                              / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS ci_hi
FROM g
"""


def _gini_sql() -> str:
    """Mirrors split_gini_gain's conditional-count pull + rational gini
    chains per threshold, unpivoted via UNION ALL."""
    conds = ["CAST(count(*) AS BIGINT) AS n_total",
             "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos"]
    for t in (20, 40, 60, 80, 100, 150):
        conds.append(
            f"CAST(sum(CASE WHEN value < {t}.0 THEN 1 ELSE 0 END) AS BIGINT) AS nl_{t}"
        )
        conds.append(
            f"CAST(sum(CASE WHEN value < {t}.0 AND event_type = 'purchase'"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS npl_{t}"
        )

    def gini(np_, na):
        p = f"(CAST({np_} AS DOUBLE) / CAST({na} AS DOUBLE))"
        return f"(1.0 - ({p} * {p} + (1.0 - {p}) * (1.0 - {p})))"

    root = gini("n_pos", "n_total")
    arms = []
    for t in (20, 40, 60, 80, 100, 150):
        nl, npl = f"nl_{t}", f"npl_{t}"
        nr, npr = f"(n_total - nl_{t})", f"(n_pos - npl_{t})"
        child = (
            f"(CAST({nl} AS DOUBLE) / CAST(n_total AS DOUBLE)) * {gini(npl, nl)}"
            f" + (CAST({nr} AS DOUBLE) / CAST(n_total AS DOUBLE)) * {gini(npr, nr)}"
        )
        arms.append(
            f"SELECT CAST({t}.0 AS DOUBLE) AS threshold, {nl} AS n_left,"
            f" round({root}, 6) AS root_gini,"
            f" round({root} - ({child}), 6) AS gini_gain FROM g"
        )
    return f"WITH g AS (SELECT {', '.join(conds)} FROM events)\n" + "\nUNION ALL\n".join(arms)


ORACLE["split_gini_gain"] = _gini_sql()


# RFM: the same bounded-domain quintile-threshold walks + integer
# comparison scores; thresholds via cross-multiplied cum walks.
ORACLE["rfm_segments"] = """
WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
per AS (
  SELECT o_custkey,
         datediff('day', max(CAST(o_orderdate AS DATE)), (SELECT mx FROM anchor))
           AS recency_days,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                    / 10000.0) AS BIGINT) AS spend_band,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spend
  FROM orders GROUP BY 1),
rq AS (
  SELECT min(CASE WHEN cum * 5 >= tot * 1 THEN v END) AS q1,
         min(CASE WHEN cum * 5 >= tot * 2 THEN v END) AS q2,
         min(CASE WHEN cum * 5 >= tot * 3 THEN v END) AS q3,
         min(CASE WHEN cum * 5 >= tot * 4 THEN v END) AS q4
  FROM (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS tot
        FROM (SELECT recency_days AS v, count(*) AS cnt FROM per GROUP BY 1))),
fq AS (
  SELECT min(CASE WHEN cum * 5 >= tot * 1 THEN v END) AS q1,
         min(CASE WHEN cum * 5 >= tot * 2 THEN v END) AS q2,
         min(CASE WHEN cum * 5 >= tot * 3 THEN v END) AS q3,
         min(CASE WHEN cum * 5 >= tot * 4 THEN v END) AS q4
  FROM (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS tot
        FROM (SELECT freq AS v, count(*) AS cnt FROM per GROUP BY 1))),
mq AS (
  SELECT min(CASE WHEN cum * 5 >= tot * 1 THEN v END) AS q1,
         min(CASE WHEN cum * 5 >= tot * 2 THEN v END) AS q2,
         min(CASE WHEN cum * 5 >= tot * 3 THEN v END) AS q3,
         min(CASE WHEN cum * 5 >= tot * 4 THEN v END) AS q4
  FROM (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS tot
        FROM (SELECT spend_band AS v, count(*) AS cnt FROM per GROUP BY 1))),
scored AS (
  SELECT per.*,
    CAST(6 - (1 + CASE WHEN recency_days > rq.q1 THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rq.q2 THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rq.q3 THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rq.q4 THEN 1 ELSE 0 END)
         AS BIGINT) AS r_score,
    CAST(1 + CASE WHEN freq > fq.q1 THEN 1 ELSE 0 END
           + CASE WHEN freq > fq.q2 THEN 1 ELSE 0 END
           + CASE WHEN freq > fq.q3 THEN 1 ELSE 0 END
           + CASE WHEN freq > fq.q4 THEN 1 ELSE 0 END AS BIGINT) AS f_score,
    CAST(1 + CASE WHEN spend_band > mq.q1 THEN 1 ELSE 0 END
           + CASE WHEN spend_band > mq.q2 THEN 1 ELSE 0 END
           + CASE WHEN spend_band > mq.q3 THEN 1 ELSE 0 END
           + CASE WHEN spend_band > mq.q4 THEN 1 ELSE 0 END AS BIGINT) AS m_score
  FROM per, rq, fq, mq)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(max(recency_days) AS BIGINT) AS worst_recency_days,
       CAST(min(freq) AS BIGINT) AS min_orders,
       CAST(sum(CAST(spend AS DECIMAL(25,6))) AS DOUBLE) AS segment_spend
FROM scored GROUP BY 1, 2, 3
"""


# k-anonymity audit: exact integer group-size rollup.
ORACLE["k_anonymity_report"] = """
WITH groups AS (
  SELECT n_name, c_mktsegment, count(*) AS gsize
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT)
         AS n_reidentifiable_people,
       CAST(min(gsize) AS BIGINT) AS min_group_size,
       min(gsize) >= 5 AS k_anonymous
FROM groups GROUP BY 1
"""


# OHLC bars: first/last on the same (ts, event_id) total order the
# Spark struct extrema induce; dsum turnover.
ORACLE["daily_ohlc_bars"] = f"""
SELECT CAST(ts AS DATE) AS day,
       first(value ORDER BY ts, event_id) AS open,
       max(value) AS high,
       min(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       CAST(count(*) AS BIGINT) AS volume,
       {_dsum('value')} AS turnover
FROM events GROUP BY 1
"""


# Vacuum proof: post-vacuum reads must equal the raw aggregate; the
# lifecycle flags are hard invariants (raised on failure Spark-side).
ORACLE["txlog_vacuum_retention"] = f"""
SELECT category,
       CAST(sum(order_count) AS BIGINT) AS order_count,
       CAST(sum(CAST(total_revenue AS DECIMAL(25,6))) AS DOUBLE)
         AS total_revenue,
       TRUE AS history_beyond_horizon_gone,
       TRUE AS in_horizon_version_readable
FROM ({_A1}) GROUP BY 1
"""


# Streaming OHLC: the batch candlestick restricted to finalized days
# (same append-mode finalize predicate as the windowed rollup).
ORACLE["stream_ohlc_bars"] = f"""
SELECT day, open, high, low, close, volume, turnover
FROM ({ORACLE["daily_ohlc_bars"]}) b,
     (SELECT max(ts) AS max_ts FROM events) m
WHERE CAST(b.day AS TIMESTAMP) + INTERVAL 1 DAY <= m.max_ts - INTERVAL 2 HOUR
"""


# groupBitAnd/Or/Xor: associative integer bit folds — exact anywhere.
ORACLE["bitwise_agg_battery"] = """
SELECT event_type,
       CAST(bit_and(user_id) AS BIGINT) AS uid_bit_and,
       CAST(bit_or(user_id) AS BIGINT) AS uid_bit_or,
       CAST(bit_xor(user_id) AS BIGINT) AS uid_bit_xor,
       CAST(bit_or(user_id % 256) AS BIGINT) AS low_byte_or,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


# -Distinct combinators.  Explicit-dedup subquery on purpose: the r9
# driver gate hash-diverged on a sum(DISTINCT CAST .. DECIMAL) aggregate
# that was bit-identical under local DuckDB — so no DISTINCT-modified
# aggregate remains for an engine build to diverge on (plain sum/count
# over a SELECT DISTINCT frame + a separately-grouped total).  The avg
# is EXACT INTEGER MICROS, (2*S6 + n) // (2*n) with S6 = sum of the
# bijective integer micros rendering — r10 proved the decimal->double
# cast feeding a floor chain still splits across DuckDB builds (two
# roundings vs Spark's single correctly-rounded BigDecimal conversion);
# integer division of exact integers is bit-equal in any engine build
# (SURVEY §5 oracle-portability class 4).
ORACLE["distinct_agg_battery"] = """
WITH dv AS (
  SELECT DISTINCT event_type, CAST(value AS DECIMAL(25,6)) AS v
  FROM events),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_distinct_values,
         CAST(sum(CAST(v * 1000000 AS BIGINT)) AS BIGINT) AS s6
  FROM dv GROUP BY 1),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1)
SELECT agg.event_type, n_distinct_values,
       s6 AS sum_distinct_micros,
       CAST((2 * s6 + n_distinct_values)
            // (2 * n_distinct_values) AS BIGINT) AS avg_micros,
       n_events
FROM agg JOIN tot ON agg.event_type = tot.event_type
"""


# Cross-source near-dup matrix: composes the verified LSH pairs; the
# mean sums DECIMAL(28,20)-quantized Jaccards (order-free) then divides.
ORACLE["near_dup_source_matrix"] = f"""
WITH pairs AS ({ORACLE["minhash_near_dup"]}),
tagged AS (
  SELECT least(da.source, db.source) AS src_lo,
         greatest(da.source, db.source) AS src_hi,
         CAST(jaccard AS DECIMAL(28,20)) AS jq
  FROM pairs
  JOIN documents da ON doc_a = da.doc_id
  JOIN documents db ON doc_b = db.doc_id)
SELECT src_lo, src_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(jq) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS mean_jaccard,
       src_lo = src_hi AS is_intra_source
FROM tagged GROUP BY 1, 2
"""


# ALTER TABLE UPDATE audit: the mutation's effect as a CASE expression
# over raw orders — per-month totals must match exactly.
ORACLE["order_update_mutation"] = f"""
WITH victim AS (SELECT min(o_custkey) AS v FROM orders),
adj AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS order_month,
         CASE WHEN o_custkey = (SELECT v FROM victim)
              THEN o_totalprice + 10.0 ELSE o_totalprice END AS amt
  FROM orders)
SELECT order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(amt AS DECIMAL(25,6))) AS DOUBLE) AS total_amount_sum
FROM adj GROUP BY 1
"""


# minMap/maxMap: the summap shape with selection aggregates — decimal
# renderings are exact, ordered list() mirrors the sorted-struct collect.
ORACLE["minmax_map_event_values"] = """
WITH per AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         min(CAST(value AS DECIMAL(25,6))) AS mn,
         max(CAST(value AS DECIMAL(25,6))) AS mx
  FROM events GROUP BY 1, 2)
SELECT day,
       array_to_string(list(event_type ORDER BY event_type), ',') AS keys_csv,
       array_to_string(list(CAST(mn AS VARCHAR) ORDER BY event_type), ',')
         AS mins_csv,
       array_to_string(list(CAST(mx AS VARCHAR) ORDER BY event_type), ',')
         AS maxs_csv
FROM per GROUP BY day
"""


# uniqUpTo: exact distinct capped at N+1 — pure integer selection.
ORACLE["uniq_upto_battery"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(least(count(DISTINCT user_id), 11) AS BIGINT) AS uniq_upto_10,
       CAST(least(count(DISTINCT user_id), 1001) AS BIGINT) AS uniq_upto_1000,
       count(DISTINCT user_id) > 10 AS small_cap_hit
FROM events GROUP BY 1
"""


def _qconv_sql() -> str:
    """Exclusive/inclusive quantile conventions: the same clamped-rank +
    conditional-min order-statistic pull as the Spark aggregate, with the
    h formulas mirrored textually (p literals cast to DOUBLE — DuckDB
    types bare decimals as DECIMAL)."""
    aggs, outs = [], []
    for conv in ("excl", "incl"):
        for pp in (25, 50, 75):
            p = f"(CAST({pp} AS DOUBLE) / 100.0)"
            raw = (
                f"(CAST(n AS DOUBLE) + 1.0) * {p}"
                if conv == "excl"
                else f"1.0 + (CAST(n AS DOUBLE) - 1.0) * {p}"
            )
            h = f"greatest(1.0, least({raw}, CAST(n AS DOUBLE)))"
            tag = f"{conv}_{pp}"
            aggs.append(f"max({h}) AS h_{tag}")
            aggs.append(
                f"min(CASE WHEN cum >= floor({h}) THEN value END) AS xlo_{tag}"
            )
            aggs.append(
                f"min(CASE WHEN cum >= ceil({h}) THEN value END) AS xhi_{tag}"
            )
            outs.append(
                f"xlo_{tag} + (h_{tag} - floor(h_{tag})) * (xhi_{tag} - xlo_{tag})"
                f" AS p{pp}_{conv}"
            )
    return f"""
WITH vf AS (SELECT event_type, value, count(*) AS cnt FROM events GROUP BY 1, 2),
c AS (
  SELECT event_type, value, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM vf),
g AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
      {", ".join(aggs)}
      FROM c GROUP BY 1)
SELECT event_type, n_events, {", ".join(outs)} FROM g
"""


ORACLE["quantile_conventions_battery"] = _qconv_sql()


# Per-source embedding drift: DECIMAL(38,15) per-dim sums, one mirrored
# division per centroid component, DECIMAL(38,25)-quantized products
# before the cross-dim reductions (power-sum discipline), one mirrored
# sqrt/divide chain.
ORACLE["embedding_source_drift"] = """
WITH flat AS (
  SELECT d.source, s.i AS dim, e.embedding[s.i] AS x
  FROM embeddings e
  JOIN documents d ON e.vec_id = d.doc_id,
  generate_series(1, 64) AS s(i)),
per AS (
  SELECT source, dim, sum(CAST(x AS DECIMAL(38,15))) AS s, count(*) AS n
  FROM flat GROUP BY 1, 2),
src_c AS (
  SELECT source, dim, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS sc, n
  FROM per),
gcent AS (
  SELECT dim, CAST(sum(CAST(x AS DECIMAL(38,15))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS gc
  FROM flat GROUP BY 1),
red AS (
  SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
         sum(CAST(sc * gc AS DECIMAL(38,25))) AS dot,
         sum(CAST(sc * sc AS DECIMAL(38,25))) AS ss,
         sum(CAST(gc * gc AS DECIMAL(38,25))) AS gg
  FROM src_c JOIN gcent USING (dim) GROUP BY 1)
SELECT source, n_docs,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(ss AS DOUBLE)) * sqrt(CAST(gg AS DOUBLE))), 6)
         AS cos_to_corpus
FROM red
"""


# topKWeighted: exact decimal weight sums + rank; the pruned-candidate
# leg is provably lossless (disjoint partitions, positive weights), so
# its boolean is literal TRUE like top_event_types_sketch's.
ORACLE["topk_weighted_users"] = """
WITH sums AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(25,6))) AS wsum,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY wsum DESC, user_id ASC) AS BIGINT)
           AS rank,
         user_id, CAST(wsum AS DOUBLE) AS weight_sum, n_events,
         TRUE AS pruned_exact
  FROM sums)
WHERE rank <= 10
"""


# KLL quantile-sketch MV: n is lossless in KLL (must equal the raw
# count), exact quantiles come from raw data, and the rank-error
# booleans are the DataSketches guarantee — the oracle expects them to
# hold, like aggregating_merge_sketch_mv's tolerance flag.
ORACLE["percentile_kll_mv"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       TRUE AS state_n_exact,
       quantile_cont(value, 0.5) AS exact_p50,
       quantile_cont(value, 0.9) AS exact_p90,
       TRUE AS p50_rank_within_eps, TRUE AS p90_rank_within_eps
FROM events GROUP BY 1
"""


# Mergeable quantile MV: counts are exactly additive, so the oracle
# derives the same sparse histogram straight from events — the storage
# lifecycle must reproduce it value-exactly.
ORACLE["percentile_merge_mv"] = """
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(floor(value / 20.0) AS BIGINT) AS bucket, count(*) AS n
  FROM events GROUP BY 1, 2),
c AS (
  SELECT day, bucket, n,
         SUM(n) OVER (PARTITION BY day ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(n) OVER (PARTITION BY day) AS tot
  FROM h)
SELECT day, CAST(max(tot) AS BIGINT) AS n_events,
       CAST(min(CASE WHEN cw * 2 >= tot THEN bucket * 20.0 END) AS DOUBLE) AS p50_lo,
       CAST(min(CASE WHEN cw * 10 >= tot * 9 THEN bucket * 20.0 END) AS DOUBLE) AS p90_lo,
       CAST(min(CASE WHEN cw * 100 >= tot * 99 THEN bucket * 20.0 END) AS DOUBLE) AS p99_lo
FROM c GROUP BY 1
"""


# deltaSum: deltas in the decimal domain (cast BEFORE the subtraction),
# positive-delta sum on the order-independent decimal fold; first/last
# via ordered aggregates on the unique (ts, event_id) ordering.
ORACLE["delta_sum_counters"] = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CAST(value AS DECIMAL(25,6)) AS v,
         CAST(value AS DECIMAL(25,6))
           - lag(CAST(value AS DECIMAL(25,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(coalesce(sum(CASE WHEN delta > 0 THEN delta END),
                     0) AS DOUBLE) AS delta_sum,
       CAST(coalesce(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_resets,
       CAST(last(v ORDER BY ts, event_id)
            - first(v ORDER BY ts, event_id) AS DOUBLE) AS net_change
FROM d GROUP BY user_id
"""


# intervalLengthSum: the same delta sweep as max_concurrent_intervals at
# customer grain; covered spans are concurrent>0 change-point gaps,
# islands are 0->+ transitions — all integer day arithmetic.
ORACLE["interval_union_length"] = """
WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS start_d FROM orders),
deltas AS (
  SELECT o_custkey, d, SUM(delta) AS delta FROM (
    SELECT o_custkey, start_d AS d, 1 AS delta FROM o
    UNION ALL
    SELECT o_custkey, start_d + 30 AS d, -1 AS delta FROM o)
  GROUP BY 1, 2),
cum AS (
  SELECT o_custkey, d, delta,
         SUM(delta) OVER w AS concurrent,
         lead(d) OVER (PARTITION BY o_custkey ORDER BY d) AS next_d
  FROM deltas
  WINDOW w AS (PARTITION BY o_custkey ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
marked AS (
  SELECT *,
         CASE WHEN concurrent > 0 AND coalesce(
                lag(concurrent) OVER (PARTITION BY o_custkey ORDER BY d), 0) = 0
              THEN 1 ELSE 0 END AS is_start
  FROM cum),
islands AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY o_custkey ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS island
  FROM marked),
per_island AS (
  SELECT o_custkey, island, SUM(date_diff('day', d, next_d)) AS ilen
  FROM islands WHERE concurrent > 0 GROUP BY 1, 2)
SELECT o_custkey,
       CAST(SUM(ilen) AS BIGINT) AS covered_days,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(MAX(ilen) AS BIGINT) AS longest_island_days
FROM per_island GROUP BY 1
"""


# sumMap/countMap: ordered list() over the (day, key) partial aggregate
# mirrors the sorted-struct collect — key domain is tiny, alignment is
# positional on the shared ORDER BY.
ORACLE["summap_event_values"] = f"""
WITH per AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(count(*) AS BIGINT) AS n, {_dsum('value')} AS s
  FROM events GROUP BY 1, 2)
SELECT day,
       array_to_string(list(event_type ORDER BY event_type), ',') AS keys_csv,
       array_to_string(list(CAST(n AS VARCHAR) ORDER BY event_type), ',')
         AS counts_csv,
       array_to_string(list(CAST(s AS VARCHAR) ORDER BY event_type), ',')
         AS sums_csv
FROM per GROUP BY day
"""


# argMax/argMin/anyLast: ordered first/last aggregates over the same
# total (value, ts, event_id) / (ts, event_id) orderings the Spark
# struct extrema induce.
ORACLE["argminmax_battery"] = """
SELECT event_type,
       last(user_id ORDER BY value, ts, event_id) AS top_user,
       max(value) AS top_value,
       first(user_id ORDER BY value, ts, event_id) AS bottom_user,
       first(user_id ORDER BY ts, event_id) AS first_user,
       last(value ORDER BY ts, event_id) AS last_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


# PR threshold sweep: same score/label formulas as quality_score /
# gopher_quality_rules CTE'd once; thresholds as a VALUES list (the
# toy-scale mirror of the Spark side's single 72-counter aggregate).
_QPR_THRESHOLDS = [round(0.40 + 0.02 * i, 2) for i in range(18)]
_QPR_VALUES = ", ".join(f"({t!r})" for t in _QPR_THRESHOLDS)
ORACLE["quality_pr_sweep"] = r"""
WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents),
s AS (
  SELECT
    round(0.4 * least(CAST(len(words) AS DOUBLE) / 50.0, 1.0)
        + 0.4 * (CAST(len(list_distinct(words)) AS DOUBLE)
                 / CAST(len(words) AS DOUBLE))
        + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                       / CAST(len(words) AS DOUBLE)) / 8.0, 1.0), 6) AS score,
    (len(words) BETWEEN 20 AND 100000)
      AND (CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / CAST(len(words) AS DOUBLE) BETWEEN 3.0 AND 10.0)
      AND len(list_filter(words,
              x -> x IN ('the','a','and','of','to','in','is','that'))) >= 2
      AND CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           / CAST(len(words) AS DOUBLE) >= 0.8
      AND CAST(len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
           / CAST(len(words) AS DOUBLE) <= 0.1 AS label
  FROM w),
t(threshold) AS (VALUES __QPR_VALUES__),
c AS (
  SELECT threshold,
         CAST(count(*) FILTER (score >= threshold AND label) AS BIGINT) AS tp,
         CAST(count(*) FILTER (score >= threshold AND NOT label) AS BIGINT) AS fp,
         CAST(count(*) FILTER (score < threshold AND label) AS BIGINT) AS fn,
         CAST(count(*) FILTER (score < threshold AND NOT label) AS BIGINT) AS tn
  FROM s CROSS JOIN t GROUP BY threshold)
SELECT CAST(threshold AS DOUBLE) AS threshold, tp, fp, fn, tn,
       CAST(tp AS DOUBLE) / nullif(tp + fp, 0) AS "precision",
       CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS recall
FROM c
""".replace("__QPR_VALUES__", _QPR_VALUES)


# Median/MAD robust outliers: quantile_cont == Spark's exact interpolated
# percentile (the value_percentiles contract); same IEEE compare stream.
ORACLE["robust_outlier_days"] = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, {_dsum('value')} AS daily_value
  FROM events GROUP BY 1),
m AS (SELECT quantile_cont(daily_value, 0.5) AS med FROM d),
dev AS (SELECT day, daily_value, abs(daily_value - med) AS abs_dev FROM d, m),
md AS (SELECT quantile_cont(abs_dev, 0.5) AS mad FROM dev)
SELECT day, daily_value, abs_dev, mad, abs_dev > 3 * mad AS is_outlier
FROM dev, md
"""


# groupArrayMovingSum: decimal-domain ROWS-frame sum before collection;
# ordered list() mirrors the sorted-struct collect on the same unique key.
ORACLE["group_array_moving_sum"] = """
WITH b AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(o_totalprice AS DECIMAL(25,6)) AS price,
         SUM(CAST(o_totalprice AS DECIMAL(25,6)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m3
  FROM orders)
SELECT o_custkey,
       array_to_string(
         list(CAST(price AS VARCHAR) ORDER BY o_orderdate, o_orderkey),
         ',') AS prices_csv,
       array_to_string(
         list(CAST(m3 AS VARCHAR) ORDER BY o_orderdate, o_orderkey),
         ',') AS moving3_csv,
       CAST(count(*) AS BIGINT) AS n_orders
FROM b GROUP BY 1
"""


# Funnel step latency: same chain CTEs; one micros division per latency,
# exact interpolated percentiles.
ORACLE["funnel_step_latency"] = f"""
WITH {_FUNNEL_CTES},
lat AS (
  SELECT 1 AS step_from, 2 AS step_to,
         (epoch_us(t2) - epoch_us(t1)) / 1000000.0 AS latency_sec
  FROM s1 JOIN s2 USING (user_id)
  UNION ALL
  SELECT 2, 3, (epoch_us(t3) - epoch_us(t2)) / 1000000.0
  FROM s2 JOIN s3 USING (user_id)
  UNION ALL
  SELECT 3, 4, (epoch_us(t4) - epoch_us(t3)) / 1000000.0
  FROM s3 JOIN s4 USING (user_id))
SELECT CAST(step_from AS BIGINT) AS step_from,
       CAST(step_to AS BIGINT) AS step_to,
       CAST(count(*) AS BIGINT) AS n_converted,
       quantile_cont(latency_sec, 0.5) AS p50_sec,
       quantile_cont(latency_sec, 0.9) AS p90_sec,
       max(latency_sec) AS max_sec
FROM lat GROUP BY 1, 2
"""


# welchTTest: identical IEEE op sequence over the same decimal power
# sums; rest side by exact decimal subtraction from the global totals.
ORACLE["welch_ttest_values"] = """
WITH per AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(value AS DECIMAL(25,6))) AS s1,
         sum(CAST(value * value AS DECIMAL(30,8))) AS s2
  FROM events GROUP BY 1),
tot AS (SELECT sum(n) AS tn, sum(s1) AS ts1, sum(s2) AS ts2 FROM per),
c AS (
  SELECT event_type, n, tn - n AS nr,
         CAST(n AS DOUBLE) AS n1, CAST(tn - n AS DOUBLE) AS n2,
         CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
         CAST(ts1 - s1 AS DOUBLE) AS r1d, CAST(ts2 - s2 AS DOUBLE) AS r2d
  FROM per, tot)
SELECT event_type,
       CAST(n AS BIGINT) AS n_sample,
       CAST(nr AS BIGINT) AS n_rest,
       round(s1d / n1, 6) AS mean_sample,
       round(r1d / n2, 6) AS mean_rest,
       round((s1d / n1 - r1d / n2)
             / sqrt((s2d - s1d * s1d / n1) / (n1 - 1) / n1
                    + (r2d - r1d * r1d / n2) / (n2 - 1) / n2), 6) AS t_stat,
       round(((s2d - s1d * s1d / n1) / (n1 - 1) / n1
              + (r2d - r1d * r1d / n2) / (n2 - 1) / n2)
             * ((s2d - s1d * s1d / n1) / (n1 - 1) / n1
                + (r2d - r1d * r1d / n2) / (n2 - 1) / n2)
             / ((s2d - s1d * s1d / n1) / (n1 - 1) / n1
                * ((s2d - s1d * s1d / n1) / (n1 - 1) / n1) / (n1 - 1)
                + (r2d - r1d * r1d / n2) / (n2 - 1) / n2
                  * ((r2d - r1d * r1d / n2) / (n2 - 1) / n2) / (n2 - 1)), 6)
         AS welch_df
FROM c
"""


# mannWhitneyUTest: integer midranks off the value-frequency table
# (2*midrank is an integer), tie-corrected z with the identical IEEE
# op sequence.
ORACLE["mann_whitney_u"] = """
WITH freq AS (SELECT value, count(*) AS cnt FROM events GROUP BY 1),
ranked AS (
  SELECT value, cnt,
         coalesce(SUM(cnt) OVER (ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_less
  FROM freq),
r2 AS (SELECT value, cnt,
              CAST(2 * cum_less + cnt + 1 AS BIGINT) AS rank2 FROM ranked),
per AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(rank2) AS BIGINT) AS sum_rank2
  FROM events JOIN r2 USING (value) GROUP BY 1),
gl AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot_n,
              CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_t FROM freq),
c AS (
  SELECT event_type, n, tot_n, tie_t, sum_rank2,
         CAST(sum_rank2 - n * (n + 1) AS DOUBLE) / 2.0 AS u,
         CAST(n AS DOUBLE) AS n1d,
         CAST(tot_n - n AS DOUBLE) AS n2d,
         CAST(tot_n AS DOUBLE) AS nd
  FROM per, gl)
SELECT event_type,
       CAST(n AS BIGINT) AS n_sample,
       CAST(tot_n - n AS BIGINT) AS n_rest,
       u AS u_stat,
       round((u - n1d * n2d / 2.0)
             / sqrt(n1d * n2d / 12.0
                    * ((nd + 1.0) - CAST(tie_t AS DOUBLE) / (nd * (nd - 1.0)))), 6)
         AS z_score
FROM c
"""

ORACLE["ks_test_statistic"] = """
WITH vt AS (SELECT value, event_type, count(*) AS cnt FROM events GROUP BY 1, 2),
vals AS (SELECT value, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM vt GROUP BY 1),
vc AS (
  SELECT value, cnt_all,
         CAST(SUM(cnt_all) OVER (ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_all
  FROM vals),
types AS (SELECT event_type, count(*) AS n1 FROM events GROUP BY 1),
tot AS (SELECT CAST(sum(cnt_all) AS BIGINT) AS tot_n FROM vals),
grid AS (
  SELECT vc.value, vc.cum_all, t.event_type, t.n1, coalesce(vt.cnt, 0) AS cnt
  FROM vc CROSS JOIN types t
  LEFT JOIN vt ON vt.value = vc.value AND vt.event_type = t.event_type),
g AS (
  SELECT event_type, n1, value, cum_all,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum1
  FROM grid),
g2 AS (
  SELECT event_type, n1, CAST(tot_n - n1 AS BIGINT) AS n2, value,
         CAST(abs(cum1 * (tot_n - n1) - (cum_all - cum1) * n1) AS BIGINT) AS gap
  FROM g, tot),
g3 AS (SELECT *, max(gap) OVER (PARTITION BY event_type) AS max_gap FROM g2),
o AS (
  SELECT event_type, max(n1) AS n1, max(n2) AS n2, max(max_gap) AS d_num,
         min(CASE WHEN gap = max_gap THEN value END) AS d_at_value
  FROM g3 GROUP BY 1),
c AS (SELECT event_type, n1, n2, d_num, d_at_value,
             CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
             CAST(d_num AS DOUBLE) AS dnd
      FROM o)
SELECT event_type,
       CAST(n1 AS BIGINT) AS n_sample,
       CAST(n2 AS BIGINT) AS n_rest,
       round(dnd / (n1d * n2d), 6) AS d_stat,
       round(sqrt(n1d * n2d / (n1d + n2d)) * (dnd / (n1d * n2d)), 6) AS ks_stat,
       d_at_value
FROM c
"""

ORACLE["simple_linreg_trend"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(25,6))) AS rev
  FROM events GROUP BY 1, 2),
d2 AS (
  SELECT event_type,
         CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x, rev
  FROM daily),
per AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         sum(rev) AS sy,
         sum(CAST(x AS DECIMAL(12,0)) * CAST(rev AS DECIMAL(25,6))) AS sxy,
         sum(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(19,2))) AS syy
  FROM d2 GROUP BY 1),
c AS (
  SELECT event_type, n_days,
         CAST(n_days AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
  FROM per),
c2 AS (
  SELECT *, nd * sxyd - sxd * syd AS num,
         nd * sxxd - sxd * sxd AS denx,
         nd * syyd - syd * syd AS deny
  FROM c)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       round(num / denx, 6) AS slope_per_day,
       round((syd - (num / denx) * sxd) / nd, 6) AS intercept,
       round(num * num / (denx * deny), 6) AS r2
FROM c2
"""

ORACLE["skew_kurt_battery"] = """
WITH per AS (
  SELECT event_type, count(*) AS n,
         SUM(CAST(value AS DECIMAL(25,6))) AS s1,
         SUM(CAST(value * value AS DECIMAL(30,8))) AS s2,
         SUM(CAST((value * value) * value AS DECIMAL(35,8))) AS s3,
         SUM(CAST((value * value) * (value * value) AS DECIMAL(38,8))) AS s4
  FROM events GROUP BY 1),
c AS (
  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
         CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d
  FROM per),
m AS (SELECT event_type, n, nd, s2d, s3d, s4d, s1d / nd AS m1 FROM c),
mm AS (
  SELECT *,
         s2d / nd - m1 * m1 AS m2,
         s3d / nd - 3.0 * m1 * (s2d / nd) + 2.0 * (m1 * m1) * m1 AS m3,
         s4d / nd - 4.0 * m1 * (s3d / nd) + 6.0 * (m1 * m1) * (s2d / nd)
           - 3.0 * ((m1 * m1) * (m1 * m1)) AS m4
  FROM m)
SELECT event_type, CAST(n AS BIGINT) AS n_sample,
       round(m1, 6) AS mean_value,
       round(m2, 6) AS variance_pop,
       round(m3 / (m2 * sqrt(m2)), 6) AS skew_pop,
       round(m4 / (m2 * m2), 6) AS kurt_pop
FROM mm
"""

ORACLE["cramers_v_assoc"] = """
WITH cells AS (
  SELECT event_type, 'region_' || CAST(user_id % 7 AS VARCHAR) AS region,
         count(*) AS o
  FROM events GROUP BY 1, 2),
c2 AS (
  SELECT event_type, region, o,
         CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY region) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cells),
t AS (
  SELECT event_type, region, n, r_, c_,
         (numd * numd) / dend AS term
  FROM (SELECT event_type, region, n, r AS r_, c AS c_,
               CAST(o * n - r * c AS DOUBLE) AS numd,
               CAST(r * c * n AS DOUBLE) AS dend
        FROM c2)),
a AS (
  SELECT list_reduce(list(term ORDER BY event_type, region),
                     (x, y) -> x + y) AS chi2,
         count(DISTINCT event_type) AS r_levels,
         count(DISTINCT region) AS c_levels,
         max(n) AS n_total
  FROM t),
f AS (
  SELECT chi2, r_levels, c_levels, n_total,
         CAST(n_total AS DOUBLE) AS ndd,
         CAST(r_levels AS DOUBLE) AS rd,
         CAST(c_levels AS DOUBLE) AS cd
  FROM a)
SELECT CAST(n_total AS BIGINT) AS n_total,
       CAST(r_levels AS BIGINT) AS r_levels,
       CAST(c_levels AS BIGINT) AS c_levels,
       round(chi2, 6) AS chi2,
       round(sqrt((chi2 / ndd) / least(rd - 1.0, cd - 1.0)), 6) AS cramers_v,
       round(sqrt(greatest(0.0,
                           chi2 / ndd - ((rd - 1.0) * (cd - 1.0)) / (ndd - 1.0))
             / least((rd - ((rd - 1.0) * (rd - 1.0)) / (ndd - 1.0)) - 1.0,
                     (cd - ((cd - 1.0) * (cd - 1.0)) / (ndd - 1.0)) - 1.0)), 6)
         AS cramers_v_bc
FROM f
"""

ORACLE["retention_conditions"] = """
WITH per AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'purchase'
         AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 0 AND 6
         THEN 1 ELSE 0 END) AS c1,
    max(CASE WHEN event_type = 'purchase'
         AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 7 AND 13
         THEN 1 ELSE 0 END) AS c2,
    max(CASE WHEN event_type = 'purchase' AND value > 60
         AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 14 AND 20
         THEN 1 ELSE 0 END) AS c3,
    max(CASE WHEN event_type = 'purchase' AND value > 150
         AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 21 AND 27
         THEN 1 ELSE 0 END) AS c4
  FROM events GROUP BY 1),
o AS (
  SELECT count(*) AS n_users,
         CAST(sum(c1) AS BIGINT) AS r1,
         CAST(sum(c1 * c2) AS BIGINT) AS r2,
         CAST(sum(c1 * c3) AS BIGINT) AS r3,
         CAST(sum(c1 * c4) AS BIGINT) AS r4
  FROM per)
SELECT CAST(n_users AS BIGINT) AS n_users, r1, r2, r3, r4,
       round(CAST(r2 AS DOUBLE) / CAST(r1 AS DOUBLE), 6) AS ret2,
       round(CAST(r3 AS DOUBLE) / CAST(r1 AS DOUBLE), 6) AS ret3,
       round(CAST(r4 AS DOUBLE) / CAST(r1 AS DOUBLE), 6) AS ret4
FROM o
"""

ORACLE["sequence_next_node"] = """
WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
s AS (
  SELECT user_id, tus AS s_t, event_id AS s_id FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rn
    FROM e WHERE event_type = 'signup') WHERE rn = 1),
p AS (
  SELECT user_id, tus AS p_t, event_id AS p_id FROM (
    SELECT e.user_id, e.tus, e.event_id,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.tus, e.event_id) AS rn
    FROM e JOIN s USING (user_id)
    WHERE e.event_type = 'purchase'
      AND (e.tus > s.s_t OR (e.tus = s.s_t AND e.event_id > s.s_id))) WHERE rn = 1),
lab AS (
  SELECT coalesce(event_type, '(end)') AS next_event_type FROM (
    SELECT e.event_type,
           row_number() OVER (PARTITION BY p.user_id
                              ORDER BY e.tus ASC NULLS LAST,
                                       e.event_id ASC NULLS LAST) AS rn
    FROM p LEFT JOIN e ON e.user_id = p.user_id
      AND (e.tus > p.p_t OR (e.tus = p.p_t AND e.event_id > p.p_id))
      AND e.tus <= p.p_t + 3600000000) WHERE rn = 1),
counts AS (
  SELECT next_event_type, count(*) AS n_users FROM lab GROUP BY 1)
SELECT next_event_type, CAST(n_users AS BIGINT) AS n_users,
       round(CAST(n_users AS DOUBLE)
             / CAST(SUM(n_users) OVER () AS DOUBLE), 6) AS share
FROM counts
"""

ORACLE["student_ttest_values"] = """
WITH per AS (
  SELECT event_type, count(*) AS n,
         SUM(CAST(value AS DECIMAL(25,6))) AS s1,
         SUM(CAST(value * value AS DECIMAL(30,8))) AS s2
  FROM events GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n, sum(s1) AS tot_s1,
               sum(s2) AS tot_s2 FROM per),
c AS (
  SELECT event_type, n, tot_n,
         CAST(n AS DOUBLE) AS n1,
         CAST(tot_n - n AS DOUBLE) AS n2,
         CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
         CAST(tot_s1 - s1 AS DOUBLE) AS r1d, CAST(tot_s2 - s2 AS DOUBLE) AS r2d
  FROM per, tot),
c2 AS (
  SELECT event_type, n, tot_n, n1, n2,
         s1d / n1 AS m1, r1d / n2 AS m2,
         s2d - s1d * s1d / n1 AS ss1,
         r2d - r1d * r1d / n2 AS ss2
  FROM c)
SELECT event_type,
       CAST(n AS BIGINT) AS n_sample,
       CAST(tot_n - n AS BIGINT) AS n_rest,
       CAST(tot_n - 2 AS BIGINT) AS df,
       round((m1 - m2) / sqrt(((ss1 + ss2) / (n1 + n2 - 2.0)) * (1.0 / n1 + 1.0 / n2)), 6)
         AS t_stat
FROM c2
"""

# largestTriangleThreeBuckets walk: 10 middle buckets / last index 9 mirror
# operators.timeseries.LTTB_N_OUT = 12.  The init-less list_reduce folds
# equal Spark's seeded folds (0.0 + x == x; area >= 0 > the -1.0 seed).
ORACLE["lttb_downsample_daily"] = """
WITH RECURSIVE
daily AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1),
ser AS (SELECT list({'x': x, 'y': y} ORDER BY x) AS s, count(*) AS m FROM daily),
walk AS (
  SELECT -1 AS b, s[1].x AS px, s[1].y AS py,
         [{'x': s[1].x, 'y': s[1].y}] AS pts
  FROM ser
  UNION ALL
  SELECT b2.cur, b2.best.x, b2.best.y,
         list_append(b2.pts, {'x': b2.best.x, 'y': b2.best.y})
  FROM (
    SELECT t.cur, t.pts,
           list_reduce(
             list_transform(t.cands, c -> {
               'area': abs((t.px - t.anx) * (c.y - t.py)
                           - (t.px - c.x) * (t.any_ - t.py)),
               'x': c.x, 'y': c.y}),
             (a, c2) -> CASE WHEN c2.area > a.area THEN c2 ELSE a END) AS best
    FROM (
      SELECT w.b + 1 AS cur, w.px, w.py, w.pts,
             list_slice(ser.s, 2 + ((w.b + 1) * (ser.m - 2)) // 10,
                        1 + ((w.b + 2) * (ser.m - 2)) // 10) AS cands,
             CASE WHEN w.b + 1 = 9 THEN ser.s[ser.m].x
                  ELSE list_reduce(list_transform(
                         list_slice(ser.s, 2 + ((w.b + 2) * (ser.m - 2)) // 10,
                                    1 + ((w.b + 3) * (ser.m - 2)) // 10),
                         p -> p.x), (a, b3) -> a + b3)
                       / CAST(len(list_slice(ser.s, 2 + ((w.b + 2) * (ser.m - 2)) // 10,
                                             1 + ((w.b + 3) * (ser.m - 2)) // 10)) AS DOUBLE)
             END AS anx,
             CASE WHEN w.b + 1 = 9 THEN ser.s[ser.m].y
                  ELSE list_reduce(list_transform(
                         list_slice(ser.s, 2 + ((w.b + 2) * (ser.m - 2)) // 10,
                                    1 + ((w.b + 3) * (ser.m - 2)) // 10),
                         p -> p.y), (a, b3) -> a + b3)
                       / CAST(len(list_slice(ser.s, 2 + ((w.b + 2) * (ser.m - 2)) // 10,
                                             1 + ((w.b + 3) * (ser.m - 2)) // 10)) AS DOUBLE)
             END AS any_
      FROM walk w, ser WHERE w.b + 1 < 10) t) b2),
fin AS (
  SELECT list_append(w.pts, {'x': ser.s[ser.m].x, 'y': ser.s[ser.m].y}) AS pts
  FROM walk w, ser WHERE w.b = 9),
idxed AS (SELECT unnest(generate_series(1, len(pts))) AS i, pts FROM fin)
SELECT CAST(i - 1 AS BIGINT) AS idx,
       CAST(pts[i].x AS BIGINT) AS x_day,
       round(pts[i].y, 6) AS y_revenue
FROM idxed
"""

_MH_MATCHES = " + ".join(
    f"CAST(a.mh_{i} = b.mh_{i} AS INT)" for i in range(MINHASH_K)
)

ORACLE["minhash_scurve_report"] = f"""
WITH {{shingles}},
hashes AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS base FROM sh),
minh AS (
  SELECT doc_id,
         {{mh_cols}}
  FROM hashes GROUP BY 1),
sigs AS (
  {{sigs_union}}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
pm AS (
  SELECT ({_MH_MATCHES}) AS match_count
  FROM cand JOIN minh a ON cand.doc_a = a.doc_id
            JOIN minh b ON cand.doc_b = b.doc_id),
g AS (SELECT match_count, count(*) AS n_pairs FROM pm GROUP BY 1),
c AS (SELECT match_count, n_pairs,
             CAST(match_count AS DOUBLE) / {MINHASH_K}.0 AS s FROM g),
c2 AS (SELECT *, (s * s) * s AS s3 FROM c),
c3 AS (SELECT *, 1.0 - s3 AS q FROM c2)
SELECT CAST(match_count AS BIGINT) AS match_count,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       round(s, 6) AS est_jaccard,
       round(1.0 - ((q * q) * (q * q)), 6) AS collision_prob
FROM c3
""".format(shingles=_SHINGLES, mh_cols=_MH_COLS, sigs_union=_SIGS_UNION)


# LSH band auto-tuner: the s-curve error integrals ride the SAME
# expression text as the Spark side (_case_pow multiply chains — identical
# parse trees, identical IEEE results), each grid term quantized to an
# exact picopart INTEGER via the floor chain (a double->DECIMAL(_,20)
# cast is NOT engine-portable beyond ~15 digits); measured yields are
# exact integers from the per-family banded self-join.
from .operators.dedup import (  # noqa: E402
    LSH_FAMILIES,
    LSH_GRID_N,
    LSH_TARGET_JACCARD,
    _case_pow,
)

_LSH_FAM_VALUES = ", ".join(f"({b}, {r})" for b, r in LSH_FAMILIES)
_LSH_MH_LIST = ", ".join(f"CAST(mh_{i} AS VARCHAR)" for i in range(MINHASH_K))

ORACLE["lsh_band_autotune"] = f"""
WITH {{shingles}},
hashes AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS base FROM sh),
minh AS (
  SELECT doc_id,
         {{mh_cols}}
  FROM hashes GROUP BY 1),
fam AS (SELECT * FROM (VALUES {_LSH_FAM_VALUES}) AS f(b, r)),
mhl AS (SELECT doc_id, list_value({_LSH_MH_LIST}) AS mh FROM minh),
ks AS (SELECT unnest(generate_series(0, {MINHASH_K - 1})) AS k),
sigrows AS (
  SELECT doc_id, b, r, k,
         array_to_string(mh[(k * r + 1):(k * r + r)], ':') AS sig
  FROM mhl CROSS JOIN fam CROSS JOIN ks WHERE k < b),
cand AS (
  SELECT DISTINCT sa.b, sa.r, sa.doc_id AS doc_a, sb.doc_id AS doc_b
  FROM sigrows sa JOIN sigrows sb
    ON sa.b = sb.b AND sa.r = sb.r AND sa.k = sb.k AND sa.sig = sb.sig
   AND sa.doc_id < sb.doc_id),
measured AS (
  SELECT b, r, CAST(count(*) AS BIGINT) AS n_candidates FROM cand GROUP BY 1, 2),
grid AS (
  SELECT CAST(i AS DOUBLE) / {float(LSH_GRID_N)} AS s
  FROM (SELECT unnest(generate_series(1, {LSH_GRID_N})) AS i)),
th0 AS (SELECT b, r, s, {_case_pow('s', 'r')} AS sr FROM fam CROSS JOIN grid),
th1 AS (SELECT *, 1.0 - sr AS q FROM th0),
th2 AS (SELECT *, {_case_pow('q', 'b')} AS qb FROM th1),
th3 AS (SELECT *, 1.0 - qb AS p FROM th2),
th4 AS (
  SELECT b, r,
         CASE WHEN s <= {LSH_TARGET_JACCARD}
              THEN CAST(floor(p * (CAST(1.0 AS DOUBLE) / {float(LSH_GRID_N)})
                              * 1000000000000.0 + 0.5) AS BIGINT)
              ELSE 0 END AS fp_e12,
         CASE WHEN s > {LSH_TARGET_JACCARD}
              THEN CAST(floor((1.0 - p) * (CAST(1.0 AS DOUBLE) / {float(LSH_GRID_N)})
                              * 1000000000000.0 + 0.5) AS BIGINT)
              ELSE 0 END AS fn_e12
  FROM th3),
theory AS (
  SELECT b, r, CAST(sum(fp_e12) AS BIGINT) AS fp_e12,
         CAST(sum(fn_e12) AS BIGINT) AS fn_e12
  FROM th4 GROUP BY 1, 2)
SELECT CAST(t.b AS BIGINT) AS b, CAST(t.r AS BIGINT) AS r,
       CAST({LSH_TARGET_JACCARD} AS DOUBLE) AS target_jaccard,
       CAST(fp_e12 AS DOUBLE) / 1000000000000.0 AS fp_area,
       CAST(fn_e12 AS DOUBLE) / 1000000000000.0 AS fn_area,
       CAST(fp_e12 + fn_e12 AS DOUBLE) / 1000000000000.0 AS total_error,
       COALESCE(m.n_candidates, 0) AS n_candidates,
       row_number() OVER (ORDER BY fp_e12 + fn_e12, t.b) = 1 AS chosen
FROM theory t LEFT JOIN measured m ON t.b = m.b AND t.r = m.r
""".format(shingles=_SHINGLES, mh_cols=_MH_COLS)

# Dedup-threshold sensitivity sweep: exact-Jaccard co-shingle pairs vs
# a literal threshold grid; counts exact integers, fraction through the
# portable floor chain.
ORACLE["near_dup_threshold_sweep"] = """
WITH {shingles},
v AS (
  SELECT doc_a, doc_b, inter / (sa.n + sb.n - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id),
ths AS (SELECT CAST(unnest([0.01, 0.02, 0.05, 0.1, 0.2, 0.5, 0.9]) AS DOUBLE) AS threshold),
hit AS (
  SELECT threshold, doc_a, doc_b FROM v CROSS JOIN ths
  WHERE jaccard >= threshold),
pc AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs FROM hit GROUP BY 1),
dc AS (
  SELECT threshold, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM (SELECT threshold, unnest([doc_a, doc_b]) AS doc_id FROM hit)
  GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
SELECT ths.threshold,
       COALESCE(n_pairs, 0) AS n_pairs,
       COALESCE(n_docs, 0) AS n_docs,
       floor(CAST(COALESCE(n_docs, 0) AS DOUBLE) / CAST(n_total AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS doc_frac
FROM ths LEFT JOIN pc USING (threshold) LEFT JOIN dc USING (threshold)
CROSS JOIN tot
""".format(shingles=_SHINGLES)


# Epoch mixture schedule: temperature-0.5 weights on exact token
# volumes, ordered-window sequential sums, floor-chain outputs, exact
# integer ceiling division.
ORACLE["epoch_mixture_schedule"] = """
WITH c AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
s AS (
  SELECT source, n_tokens,
         CAST(sum(n_tokens) OVER wf AS BIGINT) AS total_tokens,
         sqrt(CAST(n_tokens AS DOUBLE)) AS w_raw,
         sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER wf AS w_total
  FROM c
  WINDOW wf AS (ORDER BY source
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
s2 AS (
  SELECT source, n_tokens,
         floor(w_raw / w_total * 1000000.0 + 0.5) AS w6,
         CAST(floor(w_raw / w_total * CAST(total_tokens * 2 AS DOUBLE) + 0.5)
              AS BIGINT) AS allocated_tokens
  FROM s)
SELECT source, n_tokens,
       w6 / 1000000.0 AS mix_weight,
       allocated_tokens,
       floor(CAST(allocated_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS repeat_factor,
       CAST((allocated_tokens + n_tokens - 1) // n_tokens AS BIGINT) AS epochs_ceil
FROM s2
"""


# Media shard packing: byte-budget prefix-sum sharding over the
# multimodal layout; per-shard card in exact integers + floor-chain fill.
ORACLE["media_shard_packing"] = """
WITH m AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         (['png','jpeg','wav'])[CAST(doc_id % 3 AS INT) + 1] <> 'wav' AS is_image
  FROM documents),
c AS (
  SELECT doc_id, n_bytes, is_image,
         sum(n_bytes) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_bytes
  FROM m),
p AS (SELECT *, (cum_bytes - n_bytes) // 16384 AS shard_id FROM c)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(CASE WHEN is_image THEN 1 ELSE 0 END) AS BIGINT) AS n_image,
       CAST(sum(CASE WHEN is_image THEN 0 ELSE 1 END) AS BIGINT) AS n_audio,
       floor(CAST(sum(n_bytes) AS DOUBLE) / 16384.0 * 1000000.0 + 0.5)
         / 1000000.0 AS fill_frac
FROM p GROUP BY 1
"""


# Deliberately the INDEPENDENT construction (brute 7-day range join +
# COUNT DISTINCT) vs the Spark side's island sweep-line: two algorithms,
# one exact-integer truth.
ORACLE["dau_wau_stickiness"] = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'purchase'),
spine AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
wau AS (
  SELECT s.day, count(DISTINCT u.user_id) AS wau
  FROM spine s JOIN ud u
    ON u.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
  GROUP BY 1)
SELECT s.day AS day,
       CAST(s.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       round(CAST(s.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM spine s JOIN wau w USING (day)
"""

ORACLE["corr_matrix_daily"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS DECIMAL(12,0)) AS m_orders,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(19,2)) AS m_revenue,
         CAST(count(DISTINCT user_id) AS DECIMAL(12,0)) AS m_purchasers
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
sums AS (
  SELECT count(*) AS n,
         sum(m_orders) AS s_orders,
         sum(m_revenue) AS s_revenue,
         sum(m_purchasers) AS s_purchasers,
         sum(m_orders * m_orders) AS p_orders_orders,
         sum(m_orders * m_revenue) AS p_orders_revenue,
         sum(m_orders * m_purchasers) AS p_orders_purchasers,
         sum(m_revenue * m_revenue) AS p_revenue_revenue,
         sum(m_revenue * m_purchasers) AS p_revenue_purchasers,
         sum(m_purchasers * m_purchasers) AS p_purchasers_purchasers
  FROM daily),
c AS (
  SELECT CAST(n AS BIGINT) AS n_days, CAST(n AS DOUBLE) AS nd,
         CAST(s_orders AS DOUBLE) AS s_a, CAST(s_revenue AS DOUBLE) AS s_b,
         CAST(s_purchasers AS DOUBLE) AS s_c,
         CAST(p_orders_orders AS DOUBLE) AS p_aa,
         CAST(p_orders_revenue AS DOUBLE) AS p_ab,
         CAST(p_orders_purchasers AS DOUBLE) AS p_ac,
         CAST(p_revenue_revenue AS DOUBLE) AS p_bb,
         CAST(p_revenue_purchasers AS DOUBLE) AS p_bc,
         CAST(p_purchasers_purchasers AS DOUBLE) AS p_cc
  FROM sums)
SELECT metric_i, metric_j, corr, n_days FROM (
  SELECT 'orders' AS metric_i, 'orders' AS metric_j,
         round((nd * p_aa - s_a * s_a)
               / (sqrt(nd * p_aa - s_a * s_a) * sqrt(nd * p_aa - s_a * s_a)), 6)
           AS corr, n_days FROM c
  UNION ALL
  SELECT 'orders', 'revenue',
         round((nd * p_ab - s_a * s_b)
               / (sqrt(nd * p_aa - s_a * s_a) * sqrt(nd * p_bb - s_b * s_b)), 6),
         n_days FROM c
  UNION ALL
  SELECT 'orders', 'purchasers',
         round((nd * p_ac - s_a * s_c)
               / (sqrt(nd * p_aa - s_a * s_a) * sqrt(nd * p_cc - s_c * s_c)), 6),
         n_days FROM c
  UNION ALL
  SELECT 'revenue', 'revenue',
         round((nd * p_bb - s_b * s_b)
               / (sqrt(nd * p_bb - s_b * s_b) * sqrt(nd * p_bb - s_b * s_b)), 6),
         n_days FROM c
  UNION ALL
  SELECT 'revenue', 'purchasers',
         round((nd * p_bc - s_b * s_c)
               / (sqrt(nd * p_bb - s_b * s_b) * sqrt(nd * p_cc - s_c * s_c)), 6),
         n_days FROM c
  UNION ALL
  SELECT 'purchasers', 'purchasers',
         round((nd * p_cc - s_c * s_c)
               / (sqrt(nd * p_cc - s_c * s_c) * sqrt(nd * p_cc - s_c * s_c)), 6),
         n_days FROM c)
"""


def _mrl_trunc_block(d: int) -> str:
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),\n"
        f"           list_transform(range(1, {d + 1}), i -> "
        "CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),\n"
        "           (acc, x) -> acc + x)"
    )
    nrm = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),\n"
        f"           list_transform(range(1, {d + 1}), i -> "
        "CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),\n"
        "           (acc, x) -> acc + x))"
    )
    return f"""
v{d} AS (
  SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings),
p{d} AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         round({dot} / (a.nrm * b.nrm), 6) AS cos_sim
  FROM v{d} a, v{d} b WHERE a.vec_id <> b.vec_id),
t{d} AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM p{d}) WHERE rank <= 5)"""


_MRL_UNION = "\nUNION ALL\n".join(
    f"""SELECT CAST({d} AS BIGINT) AS dim_kept,
       CAST(nq.n AS BIGINT) AS n_queries,
       CAST((SELECT count(*) FROM t64 JOIN t{d} USING (vec_id, neighbor_id))
            AS BIGINT) AS total_hits,
       round(CAST((SELECT count(*) FROM t64 JOIN t{d} USING (vec_id, neighbor_id))
                  AS DOUBLE) / (5.0 * CAST(nq.n AS DOUBLE)), 6) AS recall_at_k
FROM nq"""
    for d in (32, 16, 8)
)

ORACLE["mrl_truncation_recall"] = (
    "WITH "
    + ",".join(_mrl_trunc_block(d) for d in (64, 32, 16, 8))
    + ",\nnq AS (SELECT count(DISTINCT vec_id) AS n FROM t64)\n"
    + _MRL_UNION
)


def _mrl_p_block(d: int) -> str:
    # v{d}/p{d} only (no top-k cut) — reuse of the _mrl_trunc_block text
    full = _mrl_trunc_block(d)
    return full[: full.index(f",\nt{d} AS (")]


_RERANK_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),\n"
    "           list_transform(range(1, 65), i -> "
    "CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),\n"
    "           (acc, x) -> acc + x)"
)

ORACLE["ann_mrl_adaptive_rerank"] = f"""
WITH {_mrl_p_block(8)},
short AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM p8) WHERE rank <= 50),
{_mrl_trunc_block(64).lstrip()},
rr AS (
  SELECT s.vec_id AS vec_id, s.neighbor_id AS neighbor_id,
         round({_RERANK_DOT} / (a.nrm * b.nrm), 6) AS cos_sim
  FROM short s
  JOIN v64 a ON s.vec_id = a.vec_id
  JOIN v64 b ON s.neighbor_id = b.vec_id),
ranked AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM rr) WHERE rank <= 5),
nq AS (SELECT count(DISTINCT vec_id) AS n FROM t64),
h AS (SELECT count(*) AS total_hits
      FROM t64 JOIN ranked USING (vec_id, neighbor_id))
SELECT CAST(8 AS BIGINT) AS coarse_dim,
       CAST(50 AS BIGINT) AS shortlist_k,
       CAST(nq.n AS BIGINT) AS n_queries,
       CAST(h.total_hits AS BIGINT) AS total_hits,
       round(CAST(h.total_hits AS DOUBLE) / (5.0 * CAST(nq.n AS DOUBLE)), 6)
         AS recall_at_k
FROM nq, h
"""

# Holt recurrence mirrored as a recursive-CTE walk (the LTTB class);
# alpha = 0.5, beta = 0.3 literal, init l0 = y0 / b0 = y1 - y0.
ORACLE["holt_linear_forecast"] = """
WITH RECURSIVE
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1),
ser AS (SELECT list({'day': day, 'y': y} ORDER BY day) AS s,
               count(*) AS m, max(day) AS last_day
        FROM daily),
walk AS (
  SELECT 1 AS i, s[1].y AS l, s[2].y - s[1].y AS b,
         CAST(0.0 AS DOUBLE) AS sse
  FROM ser
  UNION ALL
  SELECT t.i, 0.5 * t.y + 0.5 * t.pred,
         0.3 * ((0.5 * t.y + 0.5 * t.pred) - t.l) + 0.7 * t.b,
         t.sse + (t.y - t.pred) * (t.y - t.pred)
  FROM (
    SELECT w.i + 1 AS i, w.l, w.b, w.sse,
           ser.s[w.i + 1].y AS y, w.l + w.b AS pred
    FROM walk w, ser WHERE w.i + 1 <= ser.m) t),
fit AS (
  SELECT w.l, w.b, w.sse, ser.last_day, ser.m
  FROM walk w, ser WHERE w.i = ser.m),
h AS (SELECT unnest(range(1, 8)) AS h)
SELECT CAST(h.h AS BIGINT) AS h,
       fit.last_day + CAST(h.h AS INT) AS forecast_day,
       round(fit.l + CAST(h.h AS DOUBLE) * fit.b, 6) AS forecast_revenue,
       round(fit.l, 6) AS level_final,
       round(fit.b, 6) AS trend_final,
       round(fit.sse, 6) AS sse_one_step,
       CAST(fit.m AS BIGINT) AS n_days
FROM fit, h
"""

ORACLE["spearman_rank_corr"] = """
WITH e AS (
  SELECT event_type, value,
         (epoch_us(ts) // 1000000) % 86400 AS sod
  FROM events),
fx AS (SELECT event_type, value, count(*) AS cnt FROM e GROUP BY 1, 2),
rx AS (
  SELECT event_type, value,
         CAST(2 * coalesce(SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS BIGINT) AS r2_value
  FROM fx),
fy AS (SELECT event_type, sod, count(*) AS cnt FROM e GROUP BY 1, 2),
ry AS (
  SELECT event_type, sod,
         CAST(2 * coalesce(SUM(cnt) OVER (PARTITION BY event_type ORDER BY sod
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS BIGINT) AS r2_sod
  FROM fy),
j AS (
  SELECT e.event_type, rx.r2_value, ry.r2_sod
  FROM e JOIN rx ON e.event_type = rx.event_type AND e.value = rx.value
         JOIN ry ON e.event_type = ry.event_type AND e.sod = ry.sod),
per AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(r2_value) AS BIGINT) AS sx,
         CAST(sum(r2_sod) AS BIGINT) AS sy,
         CAST(sum(r2_value * r2_value) AS BIGINT) AS sxx,
         CAST(sum(r2_sod * r2_sod) AS BIGINT) AS syy,
         CAST(sum(r2_value * r2_sod) AS BIGINT) AS sxy
  FROM j GROUP BY 1),
c AS (
  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM per)
SELECT event_type, CAST(n AS BIGINT) AS n_sample,
       round((nd * sxyd - sxd * syd)
             / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)), 6)
         AS spearman_rho
FROM c
"""

ORACLE["kendall_tau_b"] = """
WITH e AS (
  SELECT event_type, value, CAST(hour(ts) AS BIGINT) AS hr FROM events),
cells AS (SELECT event_type, value, hr, count(*) AS f FROM e GROUP BY 1, 2, 3),
vals AS (SELECT DISTINCT event_type, value FROM cells),
grid AS (
  SELECT v.event_type, v.value, h.hr, coalesce(c.f, 0) AS f
  FROM vals v CROSS JOIN (SELECT unnest(range(0, 24)) AS hr) h
  LEFT JOIN cells c ON c.event_type = v.event_type
    AND c.value = v.value AND c.hr = h.hr),
g1 AS (
  SELECT *, coalesce(SUM(f) OVER (PARTITION BY event_type, hr ORDER BY value
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_v
  FROM grid),
g2 AS (
  SELECT event_type, value, hr,
         CAST(coalesce(SUM(cum_v) OVER (PARTITION BY event_type, value ORDER BY hr
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS less_both,
         CAST(coalesce(SUM(cum_v) OVER (PARTITION BY event_type, value ORDER BY hr
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS BIGINT)
           AS less_x_more_y
  FROM g1),
cd AS (
  SELECT g2.event_type,
         CAST(sum(c.f * g2.less_both) AS BIGINT) AS c_pairs,
         CAST(sum(c.f * g2.less_x_more_y) AS BIGINT) AS d_pairs
  FROM g2 JOIN cells c ON c.event_type = g2.event_type
    AND c.value = g2.value AND c.hr = g2.hr
  GROUP BY 1),
n_t AS (SELECT event_type, CAST(sum(f) AS BIGINT) AS n FROM cells GROUP BY 1),
tx AS (
  SELECT event_type, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS t_x
  FROM (SELECT event_type, value, sum(f) AS t FROM cells GROUP BY 1, 2) GROUP BY 1),
ty AS (
  SELECT event_type, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS t_y
  FROM (SELECT event_type, hr, sum(f) AS t FROM cells GROUP BY 1, 2) GROUP BY 1),
j AS (
  SELECT cd.event_type, n, c_pairs, d_pairs, t_x, t_y,
         CAST(n * (n - 1) / 2 AS BIGINT) AS n0
  FROM cd JOIN n_t USING (event_type)
          JOIN tx USING (event_type) JOIN ty USING (event_type))
SELECT event_type,
       CAST(n AS BIGINT) AS n_sample,
       c_pairs AS concordant,
       d_pairs AS discordant,
       round(CAST(c_pairs - d_pairs AS DOUBLE)
             / sqrt(CAST(n0 - t_x AS DOUBLE) * CAST(n0 - t_y AS DOUBLE)), 6)
         AS kendall_tau_b
FROM j
"""

ORACLE["revenue_concentration"] = """
WITH cr AS (
  SELECT 'region_' || CAST(user_id % 7 AS VARCHAR) AS region, user_id,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
ranked AS (
  SELECT region, user_id, rev,
         CAST(row_number() OVER (PARTITION BY region
              ORDER BY rev ASC, user_id ASC) AS BIGINT) AS i,
         coalesce(SUM(rev) OVER (PARTITION BY region
              ORDER BY rev DESC, user_id DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              CAST(0 AS DECIMAL(25,6))) AS cum_excl,
         SUM(rev) OVER (PARTITION BY region) AS s_tot
  FROM cr),
per AS (
  SELECT region, count(*) AS n, sum(rev) AS s,
         sum(CAST(i AS DECIMAL(12,0)) * rev) AS irev,
         sum(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(19,2))) AS sq,
         CAST(sum(CASE WHEN CAST(10 AS DECIMAL(25,6)) * cum_excl
                        < CAST(8 AS DECIMAL(25,6)) * s_tot
                  THEN 1 ELSE 0 END) AS BIGINT) AS pareto80_users
  FROM ranked GROUP BY 1),
c AS (
  SELECT region, n, pareto80_users,
         CAST(n AS DOUBLE) AS nd, CAST(s AS DOUBLE) AS sd,
         CAST(irev AS DOUBLE) AS irevd, CAST(sq AS DOUBLE) AS sqd
  FROM per)
SELECT region, CAST(n AS BIGINT) AS n_customers,
       round(2.0 * irevd / (nd * sd) - (nd + 1.0) / nd, 6) AS gini,
       round(sqd / (sd * sd), 6) AS hhi,
       pareto80_users,
       round(CAST(pareto80_users AS DOUBLE) / nd, 6) AS pareto80_share
FROM c
"""

ORACLE["cohort_ltv_curve"] = """
WITH uw AS (
  SELECT user_id,
         CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7)
              AS BIGINT) AS week,
         value
  FROM events WHERE event_type = 'purchase'),
cohorts AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
sizes AS (SELECT cohort_week, count(*) AS cohort_users FROM cohorts GROUP BY 1),
rev AS (
  SELECT c.cohort_week, u.week - c.cohort_week AS age_weeks,
         SUM(CAST(u.value AS DECIMAL(25,6))) AS rev
  FROM uw u JOIN cohorts c USING (user_id) GROUP BY 1, 2),
cum AS (
  SELECT cohort_week, age_weeks,
         SUM(rev) OVER (PARTITION BY cohort_week ORDER BY age_weeks
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
  FROM rev)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(c.age_weeks AS BIGINT) AS age_weeks,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
       round(CAST(c.cum_rev AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6)
         AS ltv_per_user
FROM cum c JOIN sizes s USING (cohort_week)
"""

ORACLE["cusum_changepoint"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS y
  FROM events GROUP BY 1, 2),
g AS (
  SELECT event_type, day, y,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         SUM(y) OVER (PARTITION BY event_type) AS s,
         SUM(y) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS k
  FROM daily),
d AS (
  SELECT *, abs(CAST(n AS DECIMAL(12,0)) * cum
                - CAST(k AS DECIMAL(12,0)) * s) AS dev
  FROM g),
m AS (SELECT *, max(dev) OVER (PARTITION BY event_type) AS max_dev FROM d),
o AS (
  SELECT event_type, max(n) AS n_days,
         min(CASE WHEN dev = max_dev THEN day END) AS changepoint_day,
         max(max_dev) AS max_dev, max(s) AS s
  FROM m GROUP BY 1)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days, changepoint_day,
       round(CAST(max_dev AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS cusum_peak,
       round(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         AS mean_daily_revenue
FROM o
"""

ORACLE["seasonal_dow_index"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS rev
  FROM events GROUP BY 1),
g AS (
  SELECT day, rev,
         SUM(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS s7,
         count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS c7
  FROM daily),
r AS (
  SELECT day, CAST(isodow(day) AS BIGINT) AS dow,
         CAST(rev AS DOUBLE) / (CAST(s7 AS DOUBLE) / 7.0) AS ratio
  FROM g WHERE c7 = 7),
per AS (
  SELECT dow, count(*) AS n_days,
         list_reduce(list(ratio ORDER BY day), (a, b) -> a + b) AS ratio_sum
  FROM r GROUP BY 1)
SELECT dow, CAST(n_days AS BIGINT) AS n_days,
       round(ratio_sum / CAST(n_days AS DOUBLE), 6) AS seasonal_index
FROM per
"""

ORACLE["weekday_anova_f"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS rev
  FROM events GROUP BY 1),
per AS (
  SELECT CAST(isodow(day) AS BIGINT) AS dow, count(*) AS n, sum(rev) AS s,
         sum(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(19,2))) AS sq
  FROM daily GROUP BY 1),
f AS (
  SELECT list_reduce(
           list_prepend({'tot_n': CAST(0.0 AS DOUBLE), 'tot_s': CAST(0.0 AS DOUBLE),
                         'tot_sq': CAST(0.0 AS DOUBLE), 'grp': CAST(0.0 AS DOUBLE)},
             list({'tot_n': CAST(n AS DOUBLE), 'tot_s': CAST(s AS DOUBLE),
                   'tot_sq': CAST(sq AS DOUBLE),
                   'grp': (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE)}
                  ORDER BY dow)),
           (a, c) -> {'tot_n': a.tot_n + c.tot_n, 'tot_s': a.tot_s + c.tot_s,
                      'tot_sq': a.tot_sq + c.tot_sq, 'grp': a.grp + c.grp}) AS f,
         count(*) AS k
  FROM per)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(f.tot_n AS BIGINT) AS n_days,
       round(f.grp - (f.tot_s * f.tot_s) / f.tot_n, 6) AS ss_between,
       round(f.tot_sq - f.grp, 6) AS ss_within,
       round(((f.grp - (f.tot_s * f.tot_s) / f.tot_n) / (CAST(k AS DOUBLE) - 1.0))
             / ((f.tot_sq - f.grp) / (f.tot_n - CAST(k AS DOUBLE))), 6) AS f_stat
FROM f
"""

ORACLE["daily_revenue_acf"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS y
  FROM events GROUP BY 1),
g AS (
  SELECT day, y,
         CAST(count(*) OVER () AS BIGINT) AS n,
         SUM(y) OVER () AS s
  FROM daily),
c AS (
  SELECT day, n,
         CAST(CAST(n AS DECIMAL(12,0)) * y - s AS DECIMAL(19,2)) AS c
  FROM g),
den AS (SELECT sum(c * c) AS den, max(n) AS n FROM c),
lk1 AS (
  SELECT day, c, lead(c, 1) OVER (ORDER BY day) AS c_lead FROM c),
num1 AS (
  SELECT sum(c * c_lead) AS num, count(*) AS n_pairs
  FROM lk1 WHERE c_lead IS NOT NULL),
lk2 AS (
  SELECT day, c, lead(c, 2) OVER (ORDER BY day) AS c_lead FROM c),
num2 AS (
  SELECT sum(c * c_lead) AS num, count(*) AS n_pairs
  FROM lk2 WHERE c_lead IS NOT NULL),
lk7 AS (
  SELECT day, c, lead(c, 7) OVER (ORDER BY day) AS c_lead FROM c),
num7 AS (
  SELECT sum(c * c_lead) AS num, count(*) AS n_pairs
  FROM lk7 WHERE c_lead IS NOT NULL),
dummy AS (SELECT 1)
SELECT CAST(1 AS BIGINT) AS lag,
       CAST(num1.n_pairs AS BIGINT) AS n_pairs,
       CAST(den.n AS BIGINT) AS n_days,
       round(CAST(num1.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
FROM num1, den
UNION ALL
SELECT CAST(2 AS BIGINT) AS lag,
       CAST(num2.n_pairs AS BIGINT) AS n_pairs,
       CAST(den.n AS BIGINT) AS n_days,
       round(CAST(num2.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
FROM num2, den
UNION ALL
SELECT CAST(7 AS BIGINT) AS lag,
       CAST(num7.n_pairs AS BIGINT) AS n_pairs,
       CAST(den.n AS BIGINT) AS n_days,
       round(CAST(num7.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
FROM num7, den
"""


# PASTE JOIN: positional join of two explicitly ordered top-k selections
# (ClickHouse pastes block-order; the reproducible equivalent is the
# explicit total order mirrored here).
ORACLE["paste_join_battery"] = """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)
           AS order_total_micros,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
  FROM orders),
l AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)
           AS line_price_micros,
         row_number() OVER (
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS pos
  FROM lineitem)
SELECT CAST(o.pos AS BIGINT) AS pos, order_total_micros, line_price_micros,
       order_total_micros - line_price_micros AS total_minus_line_micros
FROM o JOIN l ON o.pos = l.pos
WHERE o.pos <= 100
"""


# LEFT ANY JOIN: at most one right row per key, first = explicit
# (shipdate, linenumber) min-tiebreak; unmatched left rows survive.
ORACLE["any_join_battery"] = """
WITH first_ret AS (
  SELECT l_orderkey AS o_orderkey,
         l_shipdate AS first_ret_shipdate,
         CAST(l_linenumber AS BIGINT) AS first_ret_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)
           AS first_ret_price_micros,
         row_number() OVER (
           PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) AS rn
  FROM lineitem WHERE l_returnflag = 'R')
SELECT o.o_orderkey, o.o_orderstatus,
       f.first_ret_shipdate, f.first_ret_linenumber, f.first_ret_price_micros,
       f.first_ret_linenumber IS NOT NULL AS has_return
FROM orders o
LEFT JOIN (SELECT * FROM first_ret WHERE rn = 1) f USING (o_orderkey)
WHERE o.o_orderdate >= TIMESTAMP '1997-03-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
"""


# -Resample combinator: fixed bands [0, 400000) step 100000, out-of-range
# keys discarded, empty bands zero-padded, arrays canonicalized as CSV.
ORACLE["resample_combinator_battery"] = """
WITH banded AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS band,
         CAST(o_totalprice AS DECIMAL(25,6)) AS v
  FROM orders),
per AS (
  SELECT o_orderpriority, band, count(*) AS cnt, sum(v) AS s
  FROM banded WHERE band >= 0 AND band < 4 GROUP BY 1, 2),
grid AS (
  SELECT p.o_orderpriority, gs.band
  FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
       (SELECT unnest(generate_series(0, 3)) AS band) gs),
filled AS (
  SELECT g.o_orderpriority, g.band,
         coalesce(p.cnt, 0) AS cnt,
         coalesce(p.s, CAST(0 AS DECIMAL(25,6))) AS s
  FROM grid g LEFT JOIN per p
    ON g.o_orderpriority = p.o_orderpriority AND g.band = p.band)
SELECT o_orderpriority,
       string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY band) AS count_resample_csv,
       string_agg(CAST(s AS VARCHAR), ',' ORDER BY band) AS sum_resample_csv,
       CAST(sum(cnt) AS BIGINT) AS n_in_range
FROM filled GROUP BY 1
"""


# proportionsZTest: pooled z + unpooled 95% CI, mirrored double chain
# after exact integer aggregates (p-value omitted: erf is engine libm).
ORACLE["proportions_ztest_cohorts"] = """
WITH per AS (
  SELECT CAST(user_id % 5 AS BIGINT) AS cohort,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1),
c AS (
  SELECT p.cohort, CAST(p.n AS BIGINT) AS n, CAST(p.x AS BIGINT) AS x,
         CAST(p.n AS DOUBLE) AS n1, CAST(p.x AS DOUBLE) AS x1,
         CAST(ctl.n AS DOUBLE) AS n0, CAST(ctl.x AS DOUBLE) AS x0
  FROM per p, (SELECT n, x FROM per WHERE cohort = 0) ctl
  WHERE p.cohort <> 0)
SELECT cohort, n AS n_sample, x AS conversions,
       round(x1 / n1, 6) AS p_sample,
       round(x0 / n0, 6) AS p_control,
       round((x1 / n1 - x0 / n0)
             / sqrt((x1 + x0) / (n1 + n0) * (1 - (x1 + x0) / (n1 + n0))
                    * (1 / n1 + 1 / n0)), 6) AS z_stat,
       round((x1 / n1 - x0 / n0)
             - 1.9599639845400545
               * sqrt(x1 / n1 * (1 - x1 / n1) / n1
                      + x0 / n0 * (1 - x0 / n0) / n0), 6) AS ci_low,
       round((x1 / n1 - x0 / n0)
             + 1.9599639845400545
               * sqrt(x1 / n1 * (1 - x1 / n1) / n1
                      + x0 / n0 * (1 - x0 / n0) / n0), 6) AS ci_high
FROM c
"""


# minSampleSizeConversion: the documented two-proportion normal-approx
# formula with literal quantiles; square = explicit self-multiply.
ORACLE["min_sample_size_conversion"] = """
WITH per AS (
  SELECT CAST(user_id % 5 AS BIGINT) AS cohort,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1),
g AS (SELECT unnest([0.01, 0.02, 0.05]) AS mde),
c AS (
  SELECT cohort, CAST(mde AS DOUBLE) AS mde,
         CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p1
  FROM per, g)
SELECT cohort, mde,
       round(p1, 6) AS p_baseline,
       round((1.9599639845400545
                * sqrt(2 * ((p1 + (p1 + mde)) / 2) * (1 - (p1 + (p1 + mde)) / 2))
              + 0.8416212335729143
                * sqrt(p1 * (1 - p1) + (p1 + mde) * (1 - (p1 + mde))))
             * (1.9599639845400545
                * sqrt(2 * ((p1 + (p1 + mde)) / 2) * (1 - (p1 + (p1 + mde)) / 2))
              + 0.8416212335729143
                * sqrt(p1 * (1 - p1) + (p1 + mde) * (1 - (p1 + mde))))
             / (mde * mde), 6) AS min_n_per_variant
FROM c
"""


# contingency / Tschuprow T: the same ordered-fold chi2 as cramers_v,
# new coefficient chains mirrored textually.
ORACLE["contingency_coefficients"] = """
WITH cells AS (
  SELECT event_type, 'region_' || CAST(user_id % 7 AS VARCHAR) AS region,
         count(*) AS o
  FROM events GROUP BY 1, 2),
c2 AS (
  SELECT event_type, region, o,
         CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY region) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cells),
t AS (
  SELECT event_type, region, n,
         (numd * numd) / dend AS term
  FROM (SELECT event_type, region, n,
               CAST(o * n - r * c AS DOUBLE) AS numd,
               CAST(r * c * n AS DOUBLE) AS dend
        FROM c2)),
a AS (
  SELECT list_reduce(list(term ORDER BY event_type, region),
                     (x, y) -> x + y) AS chi2,
         count(DISTINCT event_type) AS r_levels,
         count(DISTINCT region) AS c_levels,
         max(n) AS n_total
  FROM t),
f AS (
  SELECT chi2, n_total,
         CAST(n_total AS DOUBLE) AS ndd,
         CAST(r_levels AS DOUBLE) AS rd,
         CAST(c_levels AS DOUBLE) AS cd
  FROM a)
SELECT CAST(n_total AS BIGINT) AS n_total,
       round(chi2, 6) AS chi2,
       round(sqrt(chi2 / (chi2 + ndd)), 6) AS contingency_c,
       round(sqrt((chi2 / ndd) / sqrt((rd - 1.0) * (cd - 1.0))), 6)
         AS tschuprow_t
FROM f
"""


# runningDifference / nonNegativeDerivative at daily grain: exact decimal
# deltas quantized to integer micros; the rate is the floor-chain
# round-half-up division over bigint->double-exact operands.
ORACLE["derivative_battery"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(value AS DECIMAL(25,6))) AS rev
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, day, rev,
         lag(rev) OVER (PARTITION BY event_type ORDER BY day) AS prev_rev,
         lag(day) OVER (PARTITION BY event_type ORDER BY day) AS prev_day
  FROM daily),
d AS (
  SELECT event_type, day,
         CAST((rev - prev_rev) * 1000000 AS BIGINT) AS delta_micros,
         CAST(date_diff('day', prev_day, day) AS BIGINT) AS gap_days
  FROM lagged WHERE prev_rev IS NOT NULL)
SELECT event_type, day, delta_micros, gap_days,
       CAST(floor(CAST(2 * delta_micros + gap_days AS DOUBLE)
                  / CAST(2 * gap_days AS DOUBLE)) AS BIGINT)
         AS rate_micros_per_day,
       greatest(CAST(floor(CAST(2 * delta_micros + gap_days AS DOUBLE)
                           / CAST(2 * gap_days AS DOUBLE)) AS BIGINT),
                CAST(0 AS BIGINT)) AS nonneg_rate_micros
FROM d
"""


# merge_asof tolerance: the nearest-prior candidate filtered by the 1-day
# bound (complete semantics: any other prior is older still).
ORACLE["asof_tolerance_enrich"] = """
WITH lp AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_p
  FROM events),
g AS (
  SELECT event_id, user_id, ts, event_type, last_p,
         epoch_us(ts) - epoch_us(last_p) AS gap
  FROM lp)
SELECT event_id, user_id, ts, event_type,
       CASE WHEN last_p IS NOT NULL AND gap <= 86400000000
            THEN last_p END AS asof_purchase_ts,
       CASE WHEN last_p IS NOT NULL AND gap <= 86400000000
            THEN gap END AS asof_gap_us,
       CASE WHEN last_p IS NULL THEN 'no_prior'
            WHEN gap <= 86400000000 THEN 'matched'
            ELSE 'too_old' END AS asof_state
FROM g
"""


from .operators.text import (  # noqa: E402
    RETRIEVAL_GEN_DF_CAP as _RETR_GEN_CAP,
    RETRIEVAL_SCORE_DF_CAP as _RETR_SCORE_CAP,
)


# Retrieval eval card: tf-cosine ranking decided by the exact integer
# quotient (num^2 * 1e10) // (|q|^2 * |c|^2) — no float sum-order
# dependence; ground truth is the memoized verified LSH pair set
# (minhash_near_dup CTE).  MATERIALIZED everywhere: inlined CTE chains
# re-evaluate exponentially in DuckDB (the curation-oracle lesson).
ORACLE["retrieval_eval_card"] = f"""
WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({{mnd}})),
rel AS MATERIALIZED (
  SELECT doc_a AS q, doc_b AS r FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
post AS MATERIALIZED (
  SELECT doc_id, w AS word, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2),
idx AS MATERIALIZED (
  -- two-tier impact-ordered index (mirrors RETRIEVAL_SCORE_DF_CAP /
  -- RETRIEVAL_GEN_DF_CAP): postings ranked per term by (tf desc,
  -- doc_id), cut to the scoring tier; the generation tier nominates
  SELECT doc_id, word, tf, prn FROM (
    SELECT doc_id, word, tf,
           row_number() OVER (PARTITION BY word
                              ORDER BY tf DESC, doc_id) AS prn
    FROM post)
  WHERE prn <= {_RETR_SCORE_CAP}),
norm AS MATERIALIZED (
  -- index-consistent norms: the scoring tier IS the indexed vector
  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM idx GROUP BY 1),
scored AS MATERIALIZED (
  SELECT a.doc_id AS q, b.doc_id AS cand,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS num
  FROM (SELECT * FROM idx
        WHERE doc_id IN (SELECT DISTINCT q FROM rel)) a
  JOIN idx b ON a.word = b.word AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
  HAVING max(CASE WHEN b.prn <= {_RETR_GEN_CAP} THEN 1 ELSE 0 END) = 1),
topk AS MATERIALIZED (
  SELECT q, cand, rk FROM (
    SELECT s.q, s.cand,
           CAST(row_number() OVER (PARTITION BY s.q
             ORDER BY (s.num * s.num * 10000000000) // (nq.n2 * nc.n2) DESC,
                      s.cand) AS BIGINT) AS rk
    FROM scored s
    JOIN norm nq ON s.q = nq.doc_id
    JOIN norm nc ON s.cand = nc.doc_id)
  WHERE rk <= 10),
hits AS MATERIALIZED (
  SELECT t.q AS hq,
         CAST(count(*) AS BIGINT) AS hits_at_10,
         CAST(count(*) FILTER (t.rk <= 1) AS BIGINT) AS hits_at_1,
         CAST(count(*) FILTER (t.rk <= 3) AS BIGINT) AS hits_at_3,
         min(t.rk) AS first_rank
  FROM topk t JOIN rel ON t.q = rel.q AND t.cand = rel.r
  GROUP BY 1),
relcnt AS MATERIALIZED (
  SELECT q, CAST(count(*) AS BIGINT) AS n_relevant FROM rel GROUP BY 1)
SELECT rc.q AS doc_id, rc.n_relevant,
       CAST(coalesce(h.hits_at_1, 0) AS BIGINT) AS hits_at_1,
       CAST(coalesce(h.hits_at_3, 0) AS BIGINT) AS hits_at_3,
       CAST(coalesce(h.hits_at_10, 0) AS BIGINT) AS hits_at_10,
       h.first_rank,
       CAST(1000000 // h.first_rank AS BIGINT) AS rr_micros,
       CAST((1000000 * coalesce(h.hits_at_10, 0)) // rc.n_relevant AS BIGINT)
         AS recall_at_10_micros
FROM relcnt rc LEFT JOIN hits h ON rc.q = h.hq
"""
ORACLE["retrieval_eval_card"] = ORACLE["retrieval_eval_card"].replace(
    "{mnd}", ORACLE["minhash_near_dup"]
)


# Nearest-direction as-of: INDEPENDENT construction (conditional extrema
# over a per-user join, vs the engine's ordered-window frames) — exact
# integer micros make the cross-algorithm equality a strong check.
# Tie rule mirrored: equal gaps take the PRIOR purchase (<=).
ORACLE["asof_nearest_battery"] = """
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu
  FROM events WHERE event_type = 'signup'),
p AS (
  SELECT user_id, event_id AS matched_event_id, epoch_us(ts) AS tu
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT s.user_id, s.event_id, s.tu,
         max(CASE WHEN p.tu <= s.tu THEN p.tu END) AS prev_tu,
         min(CASE WHEN p.tu > s.tu THEN p.tu END) AS next_tu
  FROM s LEFT JOIN p ON s.user_id = p.user_id
  GROUP BY 1, 2, 3),
pick AS (
  SELECT user_id, event_id, tu,
         CASE WHEN prev_tu IS NOT NULL
                   AND (next_tu IS NULL OR tu - prev_tu <= next_tu - tu)
              THEN 'prior' ELSE 'next' END AS direction,
         CASE WHEN prev_tu IS NOT NULL
                   AND (next_tu IS NULL OR tu - prev_tu <= next_tu - tu)
              THEN prev_tu ELSE next_tu END AS matched_tu
  FROM g WHERE prev_tu IS NOT NULL OR next_tu IS NOT NULL)
SELECT k.user_id, k.event_id, k.direction,
       CAST(abs(k.tu - k.matched_tu) AS BIGINT) AS gap_micros,
       CAST(p.matched_event_id AS BIGINT) AS matched_event_id
FROM pick k JOIN p ON k.user_id = p.user_id AND k.matched_tu = p.tu
"""


# FETCH FIRST 1 ROWS WITH TIES, materialized as the per-flag peer-group
# card: boundary max broadcast back, peers counted + summed exactly.
ORACLE["limit_with_ties_card"] = """
WITH mx AS (
  SELECT l_returnflag, max(l_quantity) AS top_q FROM lineitem GROUP BY 1)
SELECT l.l_returnflag,
       CAST(m.top_q AS BIGINT) AS top_quantity,
       CAST(count(*) AS BIGINT) AS n_tied,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
         AS tied_revenue
FROM lineitem l JOIN mx m
  ON l.l_returnflag = m.l_returnflag AND l.l_quantity = m.top_q
GROUP BY 1, 2
"""


# groupBitmapAnd/Or/Xor: per-user membership flags, pair algebra as
# integer sums (and = a*b, or = max, xor = a + b - 2ab).
ORACLE["bitmap_set_algebra"] = """
WITH flags AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c
  FROM events GROUP BY 1),
a AS (
  SELECT CAST(sum(p) AS BIGINT) AS card_p, CAST(sum(v) AS BIGINT) AS card_v,
         CAST(sum(c) AS BIGINT) AS card_c,
         CAST(sum(p * v) AS BIGINT) AS and_pv,
         CAST(sum(greatest(p, v)) AS BIGINT) AS or_pv,
         CAST(sum(p + v - 2 * p * v) AS BIGINT) AS xor_pv,
         CAST(sum(p * c) AS BIGINT) AS and_pc,
         CAST(sum(greatest(p, c)) AS BIGINT) AS or_pc,
         CAST(sum(p + c - 2 * p * c) AS BIGINT) AS xor_pc,
         CAST(sum(v * c) AS BIGINT) AS and_vc,
         CAST(sum(greatest(v, c)) AS BIGINT) AS or_vc,
         CAST(sum(v + c - 2 * v * c) AS BIGINT) AS xor_vc
  FROM flags)
SELECT 'purchase|view' AS pair, card_p AS card_a, card_v AS card_b,
       and_pv AS and_card, or_pv AS or_card, xor_pv AS xor_card FROM a
UNION ALL
SELECT 'purchase|click', card_p, card_c, and_pc, or_pc, xor_pc FROM a
UNION ALL
SELECT 'view|click', card_v, card_c, and_vc, or_vc, xor_vc FROM a
"""


# array set functions: INDEPENDENT relational construction — membership
# flags per (user, type), string_agg of the qualifying types.
ORACLE["array_set_ops_battery"] = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events),
f AS (
  SELECT user_id, event_type,
         max(CASE WHEN rn * 2 <= cnt THEN 1 ELSE 0 END) AS in_first,
         max(CASE WHEN rn * 2 > cnt THEN 1 ELSE 0 END) AS in_second
  FROM r GROUP BY 1, 2)
SELECT user_id,
       coalesce(string_agg(CASE WHEN in_first = 1 AND in_second = 1
                                THEN event_type END, ',' ORDER BY event_type),
                '') AS intersect_csv,
       coalesce(string_agg(CASE WHEN in_first = 1 OR in_second = 1
                                THEN event_type END, ',' ORDER BY event_type),
                '') AS union_csv,
       coalesce(string_agg(CASE WHEN in_first = 1 AND in_second = 0
                                THEN event_type END, ',' ORDER BY event_type),
                '') AS except_csv,
       CAST(count(*) AS BIGINT) AS n_types
FROM f GROUP BY 1
"""


# EXPLAIN ESTIMATE: the oracle reproduces the metadata-only estimate
# independently — deterministic quarter chunking, per-chunk zone maps,
# the same integer predicate bounds.
ORACLE["explain_estimate_scan"] = f"""
WITH a AS (
  SELECT date_trunc('hour', ts) AS hour, {_CAT} AS category,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS he
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2, 3),
b AS (
  SELECT min(he) AS mn, max(he) AS mx,
         max(he) - min(he) + 1 AS span
  FROM a),
ch AS (
  SELECT he,
         CASE WHEN he < mn + span * 1 // 4 THEN 0
              WHEN he < mn + span * 2 // 4 THEN 1
              WHEN he < mn + span * 3 // 4 THEN 2
              ELSE 3 END AS chunk
  FROM a, b),
zs AS (
  SELECT chunk, min(he) AS zmin, max(he) AS zmax, count(*) AS nrows
  FROM ch GROUP BY 1),
preds AS (
  SELECT 'q2' AS predicate, mn + span * 1 // 4 AS lo,
         mn + span * 2 // 4 - 1 AS hi FROM b
  UNION ALL
  SELECT 'mid_straddle',
         (mn + span * 1 // 4 + mn + span * 2 // 4) // 2,
         mn + span * 2 // 4
           + (mn + span * 2 // 4 - (mn + span * 1 // 4)) // 2 FROM b
  UNION ALL
  SELECT 'all', mn, mx FROM b),
est AS (
  SELECT predicate, CAST(count(*) AS BIGINT) AS est_dirs,
         CAST(sum(nrows) AS BIGINT) AS est_rows
  FROM preds JOIN zs ON zmax >= lo AND zmin <= hi GROUP BY 1),
ex AS (
  SELECT predicate, CAST(count(*) AS BIGINT) AS exact_rows
  FROM preds JOIN ch ON he >= lo AND he <= hi GROUP BY 1)
SELECT est.predicate, est_dirs, est_rows, exact_rows,
       est_rows >= exact_rows AS est_is_superset
FROM est JOIN ex ON est.predicate = ex.predicate
"""


# String-function battery: replace-length substring counting, two-needle
# contains, 1-based position (0 absent), split token count, and
# formatReadableQuantity in exact integer centiparts.
ORACLE["string_functions_battery"] = """
WITH d AS (
  SELECT doc_id, text, n_chars * 8 AS bits,
         CAST((n_chars * 8 * 200 + 1000) AS BIGINT) AS num
  FROM documents),
c AS (
  SELECT doc_id, text, bits,
         CAST(floor(CAST(num AS DOUBLE) / 2000.0) AS BIGINT) AS centi
  FROM d)
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'table', ''))) / 5 AS BIGINT)
         AS n_table_substr,
       (text LIKE '%spark%' OR text LIKE '%vector%') AS multi_hit,
       CAST(strpos(text, 'dup') AS BIGINT) AS dup_pos,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CASE WHEN bits < 1000 THEN CAST(bits AS VARCHAR)
            ELSE CAST(centi // 100 AS VARCHAR) || '.'
                 || lpad(CAST(centi % 100 AS VARCHAR), 2, '0') || ' thousand'
       END AS readable_bits
FROM c
"""


# groupArrayIntersect: independent relational construction — a type is
# common iff its distinct-day presence equals the user's active days.
ORACLE["group_array_intersect"] = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk, event_type
  FROM events),
ad AS (SELECT user_id, count(DISTINCT wk) AS n_w FROM ud GROUP BY 1),
tp AS (
  SELECT user_id, event_type, count(DISTINCT wk) AS wpres
  FROM ud GROUP BY 1, 2)
SELECT a.user_id,
       CAST(a.n_w AS BIGINT) AS n_active_weeks,
       coalesce(string_agg(CASE WHEN t.wpres = a.n_w THEN t.event_type END,
                           ',' ORDER BY t.event_type), '') AS common_csv,
       CAST(count(CASE WHEN t.wpres = a.n_w THEN 1 END) AS BIGINT)
         AS n_common
FROM ad a JOIN tp t ON a.user_id = t.user_id
GROUP BY 1, 2
"""


# system.columns analog: DuckDB information_schema over the registered
# views, mapped to the same engine-neutral type classes.
ORACLE["schema_introspection_card"] = """
SELECT table_name, column_name,
       CASE WHEN data_type IN ('BIGINT', 'INTEGER', 'SMALLINT', 'TINYINT')
              THEN 'integer'
            WHEN data_type IN ('DOUBLE', 'FLOAT', 'REAL') THEN 'float'
            WHEN data_type = 'VARCHAR' THEN 'string'
            WHEN data_type LIKE 'TIMESTAMP%' THEN 'timestamp'
            WHEN data_type = 'DATE' THEN 'date'
            WHEN data_type LIKE '%[]' THEN 'array'
            ELSE lower(data_type) END AS type_class
FROM information_schema.columns
WHERE table_name IN ('region', 'nation', 'customer', 'supplier', 'part',
                     'orders', 'lineitem', 'events', 'documents', 'embeddings')
"""


# INTERSECT ALL / EXCEPT ALL: independent multiset identity — per key,
# least / truncated difference of the two bags' multiplicities.
ORACLE["bag_set_ops_battery"] = """
WITH vk AS (
  SELECT coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k,
         count(*) AS cv
  FROM events WHERE event_type = 'view' GROUP BY 1),
ck AS (
  SELECT coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k,
         count(*) AS cc
  FROM events WHERE event_type = 'click' GROUP BY 1),
j AS (
  SELECT vk.k, vk.cv, coalesce(ck.cc, 0) AS cc
  FROM vk LEFT JOIN ck ON vk.k = ck.k)
SELECT k,
       CAST(least(cv, cc) AS BIGINT) AS n_intersect_all,
       CAST(greatest(cv - cc, 0) AS BIGINT) AS n_except_all
FROM j
"""


# Dedup audit queue: per jaccard band (integer-exact edges), the K
# lowest-pick-hash pairs — same engine-portable md5 hash, same tiebreak.
ORACLE["dedup_audit_sample"] = f"""
WITH {_SHINGLES},
j AS (
  SELECT doc_a, doc_b, inter,
         CAST(sa.n + sb.n - inter AS BIGINT) AS un
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id),
banded AS (
  SELECT doc_a, doc_b, inter, un,
         CASE WHEN 10 * inter < un THEN 'lt_0.1'
              WHEN 2 * inter < un THEN 'lt_0.5'
              ELSE 'ge_0.5' END AS band,
         CAST('0x' || substr(md5(CAST(doc_a AS VARCHAR) || '|'
                                 || CAST(doc_b AS VARCHAR)), 1, 15) AS BIGINT)
           AS pick_hash
  FROM j),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY band ORDER BY pick_hash, doc_a, doc_b) AS rank
  FROM banded)
SELECT band, CAST(rank AS BIGINT) AS rank, doc_a, doc_b,
       CAST(inter AS BIGINT) AS n_shared, un AS n_union,
       CAST(floor(CAST(2000000 * inter + un AS DOUBLE)
                  / CAST(2 * un AS DOUBLE)) AS BIGINT) AS jaccard_micros
FROM ranked WHERE rank <= 5
"""


# avgMap: per-key decimal sum quantized to micros, one mirrored
# round-half-up integer division per element, CSV canon.
ORACLE["avg_map_event_values"] = """
WITH per AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(sum(CAST(value AS DECIMAL(25,6))) * 1000000 AS BIGINT) AS s6,
         count(*) AS n
  FROM events GROUP BY 1, 2),
m AS (
  SELECT day, event_type,
         CAST(floor(CAST(2 * s6 + n AS DOUBLE)
                    / CAST(2 * n AS DOUBLE)) AS BIGINT) AS am
  FROM per)
SELECT day,
       string_agg(event_type, ',' ORDER BY event_type) AS keys_csv,
       string_agg(CAST(am AS VARCHAR), ',' ORDER BY event_type)
         AS avgs_micros_csv
FROM m GROUP BY 1
"""


# Unicode battery: character vs byte length over the Thai-suffixed
# names (DuckDB length = characters, strlen = bytes).
ORACLE["unicode_functions_battery"] = """
WITH d AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 1
              THEN c_name || ' ' || 'สินค้า'
              ELSE c_name END AS display_name,
         c_name
  FROM customer)
SELECT c_custkey, display_name,
       CAST(length(display_name) AS BIGINT) AS n_chars,
       CAST(strlen(display_name) AS BIGINT) AS n_bytes,
       strlen(display_name) > length(display_name) AS is_multibyte,
       upper(c_name) AS ascii_upper
FROM d
"""


# Streaming curation ingest (r12: exact + fuzzy dedup-on-arrival): the
# whole lifecycle recomputed in plain SQL — integer-exact gate, the
# full-corpus banded-LSH verified pair set, the 4-epoch acceptance
# recursion unrolled as chained CTEs (a doc is near-dup-quarantined iff
# it edges to a doc ACCEPTED by a strictly earlier arrival epoch; only
# accepted docs enter the index), min-doc_id representative among the
# clean accepts, per-source ledger.  Arrival order is the engine's
# deliberate out-of-order permutation (epochs 2,0,3,1 -> positions
# 0,1,2,3 on doc_id % 4).
ORACLE["stream_curation_ingest"] = f"""
WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({ORACLE["minhash_near_dup"]})),
meta AS MATERIALIZED (
  SELECT doc_id, source, text,
         (len(string_split(text, ' ')) >= 5
          AND 10 * len(list_distinct(string_split(text, ' ')))
              >= 4 * len(string_split(text, ' '))) AS passed,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 2 THEN 0 WHEN 0 THEN 1 WHEN 3 THEN 2 ELSE 3 END AS pos
  FROM documents),
ed AS MATERIALIZED (
  SELECT s.doc_id AS s, t.doc_id AS t, s.pos AS spos
  FROM (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs) e
  JOIN meta s ON e.a = s.doc_id
  JOIN meta t ON e.b = t.doc_id
  WHERE s.passed AND t.passed AND s.text <> t.text),
acc0 AS MATERIALIZED (SELECT doc_id FROM meta WHERE passed AND pos = 0),
nd1 AS MATERIALIZED (SELECT DISTINCT s AS doc_id FROM ed
        JOIN acc0 ON ed.t = acc0.doc_id WHERE ed.spos = 1),
acc1 AS MATERIALIZED (SELECT doc_id FROM acc0
         UNION ALL
         SELECT doc_id FROM meta WHERE passed AND pos = 1
           AND doc_id NOT IN (SELECT doc_id FROM nd1)),
nd2 AS MATERIALIZED (SELECT DISTINCT s AS doc_id FROM ed
        JOIN acc1 ON ed.t = acc1.doc_id WHERE ed.spos = 2),
acc2 AS MATERIALIZED (SELECT doc_id FROM acc1
         UNION ALL
         SELECT doc_id FROM meta WHERE passed AND pos = 2
           AND doc_id NOT IN (SELECT doc_id FROM nd2)),
nd3 AS MATERIALIZED (SELECT DISTINCT s AS doc_id FROM ed
        JOIN acc2 ON ed.t = acc2.doc_id WHERE ed.spos = 3),
acc3 AS MATERIALIZED (SELECT doc_id FROM acc2
         UNION ALL
         SELECT doc_id FROM meta WHERE passed AND pos = 3
           AND doc_id NOT IN (SELECT doc_id FROM nd3)),
ndall AS MATERIALIZED (SELECT doc_id FROM nd1
          UNION ALL SELECT doc_id FROM nd2
          UNION ALL SELECT doc_id FROM nd3),
reps AS (
  SELECT m.text, min(m.doc_id) AS keep_id
  FROM meta m JOIN acc3 a ON m.doc_id = a.doc_id GROUP BY m.text),
kept AS (
  SELECT m.source, count(*) AS n_kept
  FROM reps r JOIN meta m ON m.doc_id = r.keep_id GROUP BY 1),
quar AS (SELECT source, count(*) AS n_q FROM meta WHERE NOT passed GROUP BY 1),
ndq AS (
  SELECT m.source, count(*) AS n_nd
  FROM ndall n JOIN meta m ON m.doc_id = n.doc_id GROUP BY 1),
cln AS (
  SELECT m.source, count(*) AS n_c
  FROM acc3 a JOIN meta m ON m.doc_id = a.doc_id GROUP BY 1),
srcs AS (SELECT DISTINCT source FROM documents)
SELECT s.source,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(q.n_q, 0) AS BIGINT) AS n_quarantined,
       CAST(coalesce(n.n_nd, 0) AS BIGINT) AS n_near_dup_quarantined,
       CAST(coalesce(c.n_c, 0) - coalesce(k.n_kept, 0) AS BIGINT)
         AS n_dup_collapsed
FROM srcs s
LEFT JOIN kept k ON s.source = k.source
LEFT JOIN quar q ON s.source = q.source
LEFT JOIN ndq n ON s.source = n.source
LEFT JOIN cln c ON s.source = c.source
"""


# NULL-semantics battery: SQL-standard null-skipping aggregates over a
# deterministically nulled column, mirrored leg for leg.
ORACLE["null_semantics_battery"] = """
WITH e AS (
  SELECT event_type,
         CASE WHEN coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT),
                            0) % 7 <> 0
              THEN CAST(value AS DECIMAL(25,6)) END AS v
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(v) AS BIGINT) AS n_nonnull,
       CAST(count(*) - count(v) AS BIGINT) AS n_null,
       CAST(sum(v) AS DOUBLE) AS sum_nonnull,
       CAST(min(v) AS VARCHAR) AS min_nonnull,
       CAST(max(v) AS VARCHAR) AS max_nonnull,
       CAST(floor(CAST(CAST(sum(v) * 1000000 AS BIGINT) * 2 + count(v)
                       AS DOUBLE)
                  / CAST(2 * count(v) AS DOUBLE)) AS BIGINT)
         AS avg_micros_nonnull,
       CAST(count(DISTINCT v)
            + max(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_value_groups,
       CAST(sum(coalesce(v, CAST(-1 AS DECIMAL(25,6)))) AS DOUBLE)
         AS sum_sentinel
FROM e GROUP BY 1
"""


# langid confusion matrix: the language_id chain aggregated to cells +
# label totals, share as the floor-chain micros.
ORACLE["langid_confusion_matrix"] = f"""
WITH per_doc AS ({ORACLE["language_id"]}),
cells AS (
  SELECT lang, predicted_lang, count(*) AS n_docs
  FROM per_doc GROUP BY 1, 2),
totals AS (SELECT lang, count(*) AS label_total FROM per_doc GROUP BY 1)
SELECT c.lang, c.predicted_lang,
       CAST(c.n_docs AS BIGINT) AS n_docs,
       CAST(t.label_total AS BIGINT) AS label_total,
       CAST(floor(CAST(2000000 * c.n_docs + t.label_total AS DOUBLE)
                  / CAST(2 * t.label_total AS DOUBLE)) AS BIGINT)
         AS share_micros,
       c.lang = c.predicted_lang AS is_diagonal
FROM cells c JOIN totals t ON c.lang = t.lang
"""


# LIMIT n OFFSET m BY: per-priority page 2 (skip 2, take 3) with the
# deterministic (price desc, orderkey) tiebreak.
ORACLE["limit_by_battery"] = """
SELECT o_orderpriority, CAST(pos_in_group AS BIGINT) AS pos_in_group,
       o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)
         AS order_total_micros
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS pos_in_group
  FROM orders)
WHERE pos_in_group >= 3 AND pos_in_group <= 5
"""


# Time-bucket family: one integer epoch division chain for the 15-min
# bucket; the 30-min slot and time-of-day derive from it.
ORACLE["time_bucket_battery"] = """
WITH per AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT)
           - (CAST(floor(epoch(ts)) AS BIGINT) % 900) AS q15_epoch,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(25,6))) * 1000000 AS BIGINT)
           AS revenue_micros
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1)
SELECT CAST(to_timestamp(q15_epoch) AS TIMESTAMP) AS bucket_15m,
       CAST(to_timestamp(q15_epoch - (q15_epoch % 1800)) AS TIMESTAMP)
         AS time_slot_30m,
       CAST(q15_epoch % 86400 AS BIGINT) AS secs_since_midnight,
       CAST(n_events AS BIGINT) AS n_events,
       revenue_micros
FROM per
"""


from .operators.timeseries import (  # noqa: E402
    TCLOSE_TAU_DEN as _TCLOSE_TAU_DEN,
    TCLOSE_TAU_NUM as _TCLOSE_TAU_NUM,
)


# t-closeness (r13): dense nation x segment grid so absent cells count 0;
# TV = sum|c*ng - g*nc| / (2*nc*ng) in exact integers, one mirrored
# division to micros, flag by cross-multiplied compare.
ORACLE["t_closeness_report"] = f"""
WITH cell AS (
  SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS c
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
coh AS (
  SELECT n_name, CAST(sum(c) AS BIGINT) AS nc,
         CAST(count(*) AS BIGINT) AS n_segments_present
  FROM cell GROUP BY 1),
gd AS (SELECT c_mktsegment, CAST(sum(c) AS BIGINT) AS g FROM cell GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS ng FROM cell),
grid AS (
  SELECT coh.n_name, coh.nc, coh.n_segments_present, tot.ng,
         abs(coalesce(cell.c, 0) * tot.ng - gd.g * coh.nc) AS gap
  FROM coh CROSS JOIN gd CROSS JOIN tot
  LEFT JOIN cell ON cell.n_name = coh.n_name
                AND cell.c_mktsegment = gd.c_mktsegment)
SELECT n_name AS nation, nc AS group_size, n_segments_present,
       CAST((1000000 * sum(gap)) // (2 * nc * ng) AS BIGINT) AS tv_micros,
       {_TCLOSE_TAU_DEN} * sum(gap)
         <= 2 * {_TCLOSE_TAU_NUM} * nc * ng AS t_close
FROM grid GROUP BY n_name, nc, n_segments_present, ng
"""


# Encoding scalar family (r13): RFC 4648 base64 (24-byte sample = no
# padding drift), uppercase hex both engines, bin without leading
# zeros (probed), ASCII-only fixture text.
ORACLE["encoding_functions_battery"] = """
SELECT doc_id,
       to_base64(encode(substr(text, 1, 24))) AS b64_head,
       hex(encode(substr(text, 1, 8))) AS hex_head,
       decode(from_base64(to_base64(encode(substr(text, 1, 24)))))
         = substr(text, 1, 24) AS b64_roundtrip_ok,
       bin(doc_id) AS doc_id_bin,
       CAST(ascii(text) AS BIGINT) AS first_code_point
FROM documents
"""


# Quality-score reliability diagram (r13): band = floor(round6_score*10)
# clamp 9 (mirrored IEEE score -> identical floor); means via the
# half-up (2S+n)//(2n) convention; composes the two audited oracles.
ORACLE["quality_score_calibration"] = f"""
WITH q AS MATERIALIZED ({ORACLE['quality_score']}),
g AS MATERIALIZED ({ORACLE['gopher_quality_rules']}),
per AS (
  SELECT least(CAST(floor(q.quality_score * 10) AS BIGINT), 9) AS band,
         CAST(CAST(q.quality_score AS DECIMAL(25,6)) * 1000000 AS BIGINT)
           AS sm,
         CASE WHEN g.passes_gopher THEN 1 ELSE 0 END AS p
  FROM q JOIN g ON q.doc_id = g.doc_id)
SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
       CAST((2 * sum(sm) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mean_score_micros,
       CAST((2000000 * sum(p) + count(*)) // (2 * count(*)) AS BIGINT)
         AS gopher_pass_rate_micros
FROM per GROUP BY 1
"""


def _semantic_ingest_sql() -> str:
    """Semantic dedup-on-arrival (r13): the shared unrolled-Lloyd
    quantizer CTEs, assignment of the arrival union (corpus + exact-copy
    canaries, +1000001 ≡ +1 mod 4) against the FINAL centroids, then the
    4-epoch acceptance recursion with within-cell round-6 cosine
    candidacy.  The matched pick is the packed key
    min((1e6 - cos_micros)*1e10 + vec_id) — equal to the engine's
    lexicographic argmin over (-cos_micros, vec_id) BECAUSE fixture
    vec ids (incl. canary offsets ~1e6) are < 1e10 at every SF; the
    engine itself no longer packs (r14).  A batch vector is hit iff its
    BEST candidate clears the threshold — equivalent to 'exists a
    candidate >= t' since best = max cosine.  Every dot is the per-row
    list_reduce left fold (never a grouped fold — the r9 DuckDB rule)."""
    parts, final_c = _kmeans_parts()
    chain_u = " + ".join(
        f"(CAST(u.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        f" * (CAST(u.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        for i in range(1, 65)
    )
    cos = (
        f"round({_dot_sql('a.embedding', 'x.embedding')} / (a.nrm * x.nrm), 6)"
    )
    cm = f"CAST(CAST({cos} AS DECIMAL(25,6)) * 1000000 AS BIGINT)"

    def hit(n: int, e: int, idx: str) -> str:
        return f"""hit{n} AS MATERIALIZED (
  SELECT a.vec_id,
         min((1000000 - {cm}) * 10000000000 + x.vec_id) AS mkey
  FROM vv a JOIN {idx} x ON a.cluster = x.cluster
  WHERE a.e = {e} AND {cos} >= 0.3
  GROUP BY 1)"""

    def acc(n: int, e: int) -> str:
        return f"""acc{n} AS MATERIALIZED (
  SELECT vec_id, cluster, embedding, nrm FROM vv
  WHERE e = {e} AND vec_id NOT IN (SELECT vec_id FROM hit{n}))"""

    parts.append("""uni AS MATERIALIZED (
  SELECT vec_id, embedding, label, vec_id % 4 AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000001, embedding, label, (vec_id + 1000001) % 4
  FROM embeddings WHERE vec_id % 100 = 0)""")
    parts.append(f"""asg AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT u.vec_id, c.cluster,
           row_number() OVER (PARTITION BY u.vec_id
                              ORDER BY round({chain_u}, 6) ASC, c.cluster ASC)
             AS rn
    FROM uni u CROSS JOIN {final_c} c)
  WHERE rn = 1)""")
    parts.append(f"""vv AS MATERIALIZED (
  SELECT u.vec_id, u.label, u.e, a.cluster, u.embedding,
         sqrt({_dot_sql('u.embedding', 'u.embedding')}) AS nrm
  FROM uni u JOIN asg a USING (vec_id))""")
    parts.append(
        "acc0 AS MATERIALIZED (SELECT vec_id, cluster, embedding, nrm"
        " FROM vv WHERE e = 2)"
    )
    parts.append(hit(1, 0, "acc0"))
    parts.append(acc(1, 0))
    parts.append(
        "idx1 AS MATERIALIZED (SELECT * FROM acc0 UNION ALL SELECT * FROM acc1)"
    )
    parts.append(hit(2, 3, "idx1"))
    parts.append(acc(2, 3))
    parts.append(
        "idx2 AS MATERIALIZED (SELECT * FROM idx1 UNION ALL SELECT * FROM acc2)"
    )
    parts.append(hit(3, 1, "idx2"))
    parts.append(acc(3, 1))
    parts.append("""kept AS MATERIALIZED (
  SELECT vec_id FROM acc0 UNION ALL SELECT vec_id FROM acc1
  UNION ALL SELECT vec_id FROM acc2 UNION ALL SELECT vec_id FROM acc3)""")
    parts.append("""allhits AS MATERIALIZED (
  SELECT vec_id, mkey FROM hit1
  UNION ALL SELECT vec_id, mkey FROM hit2
  UNION ALL SELECT vec_id, mkey FROM hit3)""")
    return (
        "WITH " + ",\n".join(parts)
        + """
SELECT CAST(p.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(count(k.vec_id) AS BIGINT) AS n_kept,
       CAST(count(CASE WHEN hq.mkey // 10000000000 = 0 THEN 1 END)
            AS BIGINT) AS n_exact_quarantined,
       CAST(count(CASE WHEN hq.mkey // 10000000000 > 0 THEN 1 END)
            AS BIGINT) AS n_semantic_quarantined
FROM vv p
LEFT JOIN kept k ON p.vec_id = k.vec_id
LEFT JOIN allhits hq ON p.vec_id = hq.vec_id
GROUP BY 1"""
    )


ORACLE["stream_semantic_ingest"] = _semantic_ingest_sql()


# ROC-AUC of score vs Gopher verdict (r13): the midrank identity —
# AUC = (R1 - n1(n1+1)/2)/(n1*n0) with 2*midrank integers, zero floats.
ORACLE["quality_score_auc"] = f"""
WITH q AS MATERIALIZED ({ORACLE['quality_score']}),
g AS MATERIALIZED ({ORACLE['gopher_quality_rules']}),
per AS (
  SELECT q.quality_score AS score,
         CASE WHEN g.passes_gopher THEN 1 ELSE 0 END AS y
  FROM q JOIN g ON q.doc_id = g.doc_id),
freq AS (
  SELECT score, count(*) AS cnt, sum(y) AS pos FROM per GROUP BY 1),
ranked AS (
  SELECT cnt, pos,
         coalesce(sum(cnt) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_less
  FROM freq),
agg AS (
  SELECT CAST(sum(pos * (2 * cum_less + cnt + 1)) AS BIGINT) AS s2,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(cnt - pos) AS BIGINT) AS n_neg
  FROM ranked)
SELECT n_pos, n_neg,
       CAST((1000000 * (s2 - n_pos * (n_pos + 1)))
            // nullif(2 * n_pos * n_neg, 0)
            AS BIGINT) AS auc_micros,
       CAST(2 * ((1000000 * (s2 - n_pos * (n_pos + 1)))
                 // nullif(2 * n_pos * n_neg, 0)) - 1000000
            AS BIGINT) AS gini_micros
FROM agg
"""


def _quantizer_refresh_sql(dim: int = 64, probe: int = 2, top_k: int = 5) -> str:
    """Drift-response serve (r14): recomputes the WHOLE lifecycle's end
    state from raw parquet — the union corpus (base + plain re-ingest +
    shifted cohort), the REFIT quantizer (unrolled Lloyd trained on that
    union — mirrors ``_kmeans_fit_frame`` over the refreshed index's
    contents), and the pruned-probe serve under it: queries are the
    cell-0 vectors plus every drifted arrival, candidates the vectors
    sharing a probed cell, exact round-6 cosine, (cos desc, id asc)
    top-5.  The drift DECISION is implicit but binding: had the engine
    not refreshed, the served cells would still be the old quantizer's
    and the ranks would not match."""
    from .operators.similarity import (
        DRIFT_INGEST_MOD,
        DRIFT_PLAIN_OFFSET,
        DRIFT_PLAIN_RESIDUE,
        DRIFT_SHIFT_DIMS,
        DRIFT_SHIFT_OFFSET,
        DRIFT_SHIFT_RESIDUE,
    )

    uni = f"""uni AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + {DRIFT_PLAIN_OFFSET},
         list_transform(embedding, x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % {DRIFT_INGEST_MOD} = {DRIFT_PLAIN_RESIDUE}
  UNION ALL
  SELECT vec_id + {DRIFT_SHIFT_OFFSET},
         list_concat(
           list_transform(embedding[1:{DRIFT_SHIFT_DIMS}],
                          x -> CAST(x AS DOUBLE) + 1.0),
           list_transform(embedding[{DRIFT_SHIFT_DIMS + 1}:{dim}],
                          x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id % {DRIFT_INGEST_MOD} = {DRIFT_SHIFT_RESIDUE})"""
    parts, final_c = _kmeans_parts(dim=dim, src="uni")
    parts.insert(0, uni)
    chain = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.centroid[{i}])"
        for i in range(1, dim + 1)
    )
    parts.append(
        f"""s AS (
  SELECT vec_id, cluster, rn FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM (SELECT e.vec_id, c.cluster, round({chain}, 6) AS dist
          FROM uni e CROSS JOIN {final_c} c))
  WHERE rn <= {probe})"""
    )
    parts.append(
        f"""v AS (
  SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
  FROM uni)"""
    )
    parts.append(
        f"""qset AS (
  SELECT vec_id FROM s WHERE rn = 1 AND cluster = 0
  UNION
  SELECT vec_id FROM uni WHERE vec_id >= {DRIFT_SHIFT_OFFSET})"""
    )
    parts.append(
        f"""p AS (
  SELECT q.vec_id AS vec_id, i.vec_id AS neighbor_id,
         round({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos_sim
  FROM (SELECT vec_id, cluster FROM s
        WHERE rn <= {probe} AND vec_id IN (SELECT vec_id FROM qset)) q
  JOIN (SELECT vec_id, cluster FROM s WHERE rn = 1) i
    ON q.cluster = i.cluster AND q.vec_id <> i.vec_id
  JOIN v a ON a.vec_id = q.vec_id
  JOIN v b ON b.vec_id = i.vec_id)"""
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT vec_id, neighbor_id, cos_sim, rank,
       neighbor_id >= {DRIFT_SHIFT_OFFSET} AS neighbor_is_drifted
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM p)
WHERE rank <= {top_k}"""
    )


ORACLE["ann_ivf_quantizer_refresh"] = _quantizer_refresh_sql()


# ClickHouse dictionary battery (r14): the dictionaries ARE the nation/
# region tables — the oracle recomputes every dictGet* lookup with plain
# joins + CASE (partial name dict = regions 0-2 only; hierarchy node ids
# = nationkey and 100 + regionkey).
ORACLE["dict_get_battery"] = """
WITH cust AS (
  SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY 1)
SELECT CAST(c.nationkey AS BIGINT) AS nationkey,
       CASE WHEN n.n_regionkey <= 2 THEN n.n_name ELSE 'UNKNOWN' END AS dict_name,
       n.n_regionkey <= 2 AS dict_has,
       r.r_name AS region_name,
       CAST(c.nationkey AS VARCHAR) || ',' ||
         CAST(100 + n.n_regionkey AS VARCHAR) AS hierarchy_path,
       n.n_regionkey = 1 AS in_region_1,
       c.n_customers
FROM cust c
JOIN nation n ON n.n_nationkey = c.nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
"""


# ClickHouse PROJECTION + auto-routing (r14): values must equal the
# plain aggregates over raw orders regardless of which physical path
# served them; the routing decision itself is deterministic on (keys ⊆
# projection dims), mirrored here as literals — the physical claim (the
# projection path never touches the base table) is pytest-pinned.
ORACLE["projection_auto_route"] = """
SELECT 'by_priority' AS query, o_orderpriority AS key,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT))
            AS BIGINT) AS revenue_micros,
       'projection' AS served_from
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'by_status', o_orderstatus,
       CAST(count(*) AS BIGINT),
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT))
            AS BIGINT),
       'base'
FROM orders GROUP BY o_orderstatus
"""


# ClickHouse rounding family (r14): the ladders as CASE chains, exp2 via
# the bin()-length bit trick (both engines render bin without leading
# zeros, probed), gaps per the floor(epoch) rule with first-event NULLs
# excluded.
ORACLE["rounding_functions_battery"] = """
WITH base AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         event_id % 100 AS age,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events),
k1 AS (
  SELECT 'exp2_cents' AS kind,
         CAST(CASE WHEN cents >= 1
                   THEN 1::BIGINT << (length(bin(cents)) - 1)
                   ELSE 0 END AS BIGINT) AS bucket
  FROM base),
k2 AS (
  SELECT 'down_cents' AS kind,
         CAST(CASE WHEN cents >= 40000 THEN 40000
                   WHEN cents >= 20000 THEN 20000
                   WHEN cents >= 10000 THEN 10000
                   WHEN cents >= 5000 THEN 5000
                   ELSE 1000 END AS BIGINT) AS bucket
  FROM base),
k3 AS (
  SELECT 'age' AS kind,
         CAST(CASE WHEN age < 1 THEN 0
                   WHEN age < 18 THEN 17
                   WHEN age < 25 THEN 18
                   WHEN age < 35 THEN 25
                   WHEN age < 45 THEN 35
                   WHEN age < 55 THEN 45
                   ELSE 55 END AS BIGINT) AS bucket
  FROM base),
k4 AS (
  SELECT 'duration' AS kind,
         CAST(CASE WHEN gap >= 36000 THEN 36000
                   WHEN gap >= 18000 THEN 18000
                   WHEN gap >= 7200 THEN 7200
                   WHEN gap >= 3600 THEN 3600
                   WHEN gap >= 1800 THEN 1800
                   WHEN gap >= 1200 THEN 1200
                   WHEN gap >= 600 THEN 600
                   WHEN gap >= 300 THEN 300
                   WHEN gap >= 240 THEN 240
                   WHEN gap >= 180 THEN 180
                   WHEN gap >= 120 THEN 120
                   WHEN gap >= 60 THEN 60
                   WHEN gap >= 30 THEN 30
                   WHEN gap >= 10 THEN 10
                   WHEN gap >= 1 THEN 1
                   ELSE 0 END AS BIGINT) AS bucket
  FROM base WHERE gap IS NOT NULL),
uni AS (
  SELECT * FROM k1 UNION ALL SELECT * FROM k2
  UNION ALL SELECT * FROM k3 UNION ALL SELECT * FROM k4)
SELECT kind, bucket, CAST(count(*) AS BIGINT) AS n
FROM uni GROUP BY kind, bucket
"""


# Atomic multi-table publish (r14): the group-pinned serve must exclude
# the staged-but-unpublished batch (o_orderkey % 5 = 4) entirely; both
# legs re-derive from raw orders restricted to the published batches.
ORACLE["atomic_publish_consistent_serve"] = """
WITH pub AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS m
  FROM orders WHERE o_orderkey % 5 <= 3)
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(m) AS BIGINT) AS revenue_micros,
       CAST(count(*) AS BIGINT) AS n_orders_fact,
       CAST(sum(m) AS BIGINT) AS revenue_micros_fact,
       TRUE AS consistent
FROM pub GROUP BY o_orderpriority
"""


# position / multiSearch family (r14): strpos mirrors locate (1-based,
# 0 = absent); first-index via the identical sentinel-maxed CASE with
# the lower-index tiebreak; countSubstrings by the length identity.
ORACLE["multisearch_functions_battery"] = """
WITH p AS (
  SELECT doc_id,
         CAST(strpos(text, 'dup') AS BIGINT) AS p1,
         CAST(strpos(text, 'data') AS BIGINT) AS p2,
         CAST(strpos(text, 'zzz') AS BIGINT) AS p3,
         CAST((length(text) - length(replace(text, 'data', ''))) / 4
              AS BIGINT) AS n_data
  FROM documents),
q AS (
  SELECT *,
         CASE WHEN p1 > 0 THEN p1 ELSE 1000000000 END AS q1,
         CASE WHEN p2 > 0 THEN p2 ELSE 1000000000 END AS q2,
         CASE WHEN p3 > 0 THEN p3 ELSE 1000000000 END AS q3
  FROM p)
SELECT doc_id, p1 AS pos_dup, p2 AS pos_data, p3 AS pos_zzz,
       CAST(CASE WHEN p1 = 0 AND p2 = 0 AND p3 = 0 THEN 0
                 WHEN q1 <= q2 AND q1 <= q3 THEN 1
                 WHEN q2 <= q3 THEN 2
                 ELSE 3 END AS BIGINT) AS first_index,
       n_data,
       p1 > 0 OR p2 > 0 OR p3 > 0 AS any_found
FROM q
"""


# Exact-span scrub (r14): spans via the lead-window construction (an
# INDEPENDENT build vs the engine's zip_with n-gram fold — byte-equal
# spans), ownership = min doc_id over distinct (doc, span), cover =
# bounded 4x expansion of dup spans, reconstruction = ordered string_agg.
ORACLE["exact_span_scrub"] = """
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents),
sp AS MATERIALIZED (
  SELECT doc_id, pos AS p0,
         word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
              || ' ' || lead(word, 3) OVER w AS span,
         lead(word, 3) OVER w IS NOT NULL AS is_full
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
spans AS MATERIALIZED (SELECT doc_id, p0, span FROM sp WHERE is_full),
owners AS MATERIALIZED (
  SELECT span, min(doc_id) AS owner
  FROM (SELECT DISTINCT doc_id, span FROM spans) GROUP BY 1),
dup AS MATERIALIZED (
  SELECT DISTINCT s.doc_id, s.p0
  FROM spans s JOIN owners o USING (span) WHERE o.owner < s.doc_id),
covered AS MATERIALIZED (
  SELECT DISTINCT doc_id, p0 + k AS pos
  FROM dup CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)),
kept AS MATERIALIZED (
  SELECT t.doc_id, t.pos, t.word
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.pos IS NULL),
clean AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(word, ' ' ORDER BY pos) AS cleaned_text
  FROM kept GROUP BY 1)
SELECT d.doc_id,
       CAST(length(string_split(d.text, ' ')) AS BIGINT) AS n_words,
       coalesce(c.n_kept, 0) AS n_kept,
       CAST(length(string_split(d.text, ' ')) - coalesce(c.n_kept, 0)
            AS BIGINT) AS n_removed,
       coalesce(c.cleaned_text, '') AS cleaned_text
FROM documents d LEFT JOIN clean c USING (doc_id)
"""


# SAMPLE + _sample_factor (r14): the portable md5 hash mirror picks the
# identical ~20% user cohort; estimates are integer x5 scale-ups next to
# the exact values, error as integer ppm.
ORACLE["sample_factor_estimate"] = """
WITH per AS (
  SELECT event_type,
         CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                             AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled,
         CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                             AS BIGINT) % 5 = 0
                       THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev_sampled_micros,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_exact_micros
  FROM events GROUP BY 1)
SELECT event_type, n_sampled,
       CAST(n_sampled * 5 AS BIGINT) AS est_n_events,
       n_exact,
       CAST(rev_sampled_micros * 5 AS BIGINT) AS est_revenue_micros,
       rev_exact_micros,
       CAST(abs(n_sampled * 5 - n_exact) * 1000000 // n_exact AS BIGINT)
         AS count_err_ppm
FROM per
"""


# Exact dedup-on-arrival (r14): the one lifecycle whose 4-epoch
# acceptance recursion has a CLOSED FORM — kept iff my arrival position
# is minimal for my content key (same-batch copies all kept) — so the
# oracle is one window over the arrival union instead of unrolled CTEs,
# pinning the harness semantics from an independent angle.  Arrival
# position of epoch e (= id % 4) under ARRIVAL_ORDER (2,0,3,1).
from .streaming.pipeline import (  # noqa: E402
    EXACT_INGEST_CANARY_MOD as _XI_MOD,
    EXACT_INGEST_CANARY_OFFSET as _XI_OFF,
    EXACT_INGEST_CANARY_RESIDUE as _XI_RES,
)

ORACLE["stream_exact_ingest"] = f"""
WITH uni AS MATERIALIZED (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS content_key
  FROM documents
  UNION ALL
  SELECT doc_id + {_XI_OFF}, source,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
  FROM documents WHERE doc_id % {_XI_MOD} = {_XI_RES}),
pos AS MATERIALIZED (
  SELECT doc_id, source, content_key,
         CASE doc_id % 4 WHEN 2 THEN 0 WHEN 0 THEN 1 WHEN 3 THEN 2
                         ELSE 3 END AS apos
  FROM uni),
dec AS MATERIALIZED (
  SELECT doc_id, source,
         apos = min(apos) OVER (PARTITION BY content_key) AS kept
  FROM pos)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
       CAST(count(CASE WHEN NOT kept THEN 1 END) AS BIGINT)
         AS n_exact_quarantined
FROM dec GROUP BY source
"""


# CDC chunk dedup (r14): boundaries re-derived byte-by-byte — the
# window-8 dot via 8 lag terms with RAW 31^k coefficients (congruent mod
# 2^32 to the engine's pre-reduced powers; both sums exact in int64),
# chunk numbers via an inclusive boundary cumsum (the rule is
# deliberately closed-form — no sequential recurrence), and the chunk
# identity polynomial via a powers-table recursive CTE (31^k mod 2^31-1,
# contributions keyed by offset-from-chunk-end).
ORACLE["cdc_chunk_dedup"] = """
WITH RECURSIVE pows(k, v) AS (
  SELECT 0, CAST(1 AS BIGINT)
  UNION ALL SELECT k + 1, (v * 31) % 2147483647 FROM pows WHERE k < 1023),
b AS MATERIALIZED (
  SELECT doc_id,
         ['png', 'jpeg', 'wav'][CAST(doc_id % 3 AS INT) + 1] AS format,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2) AS BIGINT)) AS bytes
  FROM documents),
tok AS MATERIALIZED (
  SELECT doc_id, format,
         CAST(generate_subscripts(bytes, 1) - 1 AS BIGINT) AS pos,
         unnest(bytes) AS byte
  FROM b),
wh AS MATERIALIZED (
  SELECT doc_id, format, pos, byte,
         pos >= 8 AND
         ((lag(byte, 1) OVER w * 1
           + lag(byte, 2) OVER w * 31
           + lag(byte, 3) OVER w * 961
           + lag(byte, 4) OVER w * 29791
           + lag(byte, 5) OVER w * 923521
           + lag(byte, 6) OVER w * 28629151
           + lag(byte, 7) OVER w * 887503681
           + lag(byte, 8) OVER w * 27512614111) % 4294967296) % 32 = 0
           AS is_cand
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
cn AS MATERIALIZED (
  SELECT doc_id, format, pos, byte,
         sum(CASE WHEN is_cand THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_no
  FROM wh),
ch AS MATERIALIZED (
  SELECT doc_id, format, chunk_no,
         CAST(count(*) AS BIGINT) AS chunk_len,
         CAST(sum((byte * p.v) % 2147483647) % 2147483647 AS BIGINT)
           AS chunk_hash
  FROM (SELECT *, max(pos) OVER (PARTITION BY doc_id, chunk_no) - pos AS kk
        FROM cn) c
  JOIN pows p ON p.k = c.kk
  GROUP BY 1, 2, 3),
per AS (
  SELECT format, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(chunk_len) AS BIGINT) AS bytes_total
  FROM ch GROUP BY 1),
dis AS (
  SELECT format, CAST(count(*) AS BIGINT) AS n_distinct_chunks,
         CAST(sum(chunk_len) AS BIGINT) AS bytes_after_dedup
  FROM (SELECT DISTINCT format, chunk_hash, chunk_len FROM ch) GROUP BY 1)
SELECT per.format, n_chunks, n_distinct_chunks, bytes_total, bytes_after_dedup,
       CAST((bytes_total - bytes_after_dedup) * 1000000 // bytes_total
            AS BIGINT) AS saved_ppm
FROM per JOIN dis ON per.format = dis.format
"""
