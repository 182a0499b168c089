"""Deterministic synthetic sales-order generator (FIXTURES.md §1).

Mirrors the reference producer's record shape and distributions
(/root/reference/producers/sales_producer.py:96-138) as a **distributed,
seed-stable Spark program**: every field derives from a 64-bit hash of
(seed, row id, field salt), so any executor produces the same row for the
same id — no driver-side RNG, no collect, generation scales linearly.

Used by unit tests and the streaming demo.  Driver-visible queries use the
driver's parquet testdata instead (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Product catalog: same shape as the reference's (5 categories x ~6 SKUs,
# Thai + English names for Unicode coverage) with original values.
CATALOG = [
    # (product_id, product_name, category, unit_price)
    ("PROD-E101", "Laptop 14in", "Electronics", 24900.0),
    ("PROD-E102", "หูฟังไร้สาย", "Electronics", 1890.0),
    ("PROD-E103", "Smartwatch S", "Electronics", 5990.0),
    ("PROD-E104", "เพาเวอร์แบงค์", "Electronics", 790.0),
    ("PROD-E105", "Tablet 10in", "Electronics", 10900.0),
    ("PROD-C201", "เสื้อยืดคอตตอน", "Clothing", 290.0),
    ("PROD-C202", "Denim Jacket", "Clothing", 1590.0),
    ("PROD-C203", "กางเกงยีนส์", "Clothing", 990.0),
    ("PROD-C204", "Sneakers R1", "Clothing", 2490.0),
    ("PROD-C205", "หมวกแก๊ป", "Clothing", 350.0),
    ("PROD-H301", "โคมไฟตั้งโต๊ะ", "Home & Garden", 890.0),
    ("PROD-H302", "Garden Hose 20m", "Home & Garden", 450.0),
    ("PROD-H303", "หมอนหนุนสุขภาพ", "Home & Garden", 690.0),
    ("PROD-H304", "Cutlery Set", "Home & Garden", 1290.0),
    ("PROD-H305", "กระถางเซรามิก", "Home & Garden", 250.0),
    ("PROD-F401", "กาแฟคั่วเข้ม 250g", "Food & Beverage", 320.0),
    ("PROD-F402", "Green Tea Box", "Food & Beverage", 180.0),
    ("PROD-F403", "น้ำผึ้งดอกลำไย", "Food & Beverage", 420.0),
    ("PROD-F404", "Dark Chocolate 85%", "Food & Beverage", 150.0),
    ("PROD-F405", "ข้าวหอมมะลิ 5kg", "Food & Beverage", 260.0),
    ("PROD-B501", "เซรั่มบำรุงผิว", "Beauty", 1290.0),
    ("PROD-B502", "Sunscreen SPF50", "Beauty", 590.0),
    ("PROD-B503", "ลิปสติกแมต", "Beauty", 450.0),
    ("PROD-B504", "Shampoo Herbal", "Beauty", 280.0),
    ("PROD-B505", "น้ำหอมโอเดอปาร์ฟูม", "Beauty", 2900.0),
]

REGIONS = ["Bangkok", "Central", "North", "Northeast", "South", "East", "West"]
PAYMENT_METHODS = ["credit_card", "debit_card", "cash", "bank_transfer", "promptpay"]
SALES_REPS = ["สมชาย ว.", "วิภา ก.", "Anan P.", "Siriporn T.", "Krit S."]
# P(completed) = 0.6 like the reference's weighted pick
# (/root/reference/producers/sales_producer.py:71,133).
STATUSES = ["completed", "completed", "completed", "pending", "processing"]


def _u(seed: int, salt: str, n: Column | int) -> Column:
    """Uniform integer in [0, n) from (seed, id, salt) — id col must exist."""
    h = F.xxhash64(F.lit(seed), F.col("id"), F.lit(salt))
    return F.pmod(h, F.lit(n) if isinstance(n, int) else n)


def _weighted(seed: int, salt: str, cum_pct: list[int], values: list) -> Column:
    """Weighted categorical via cumulative thresholds on a 0..99 draw.

    ``cum_pct`` has one entry per value except the last (the catch-all).
    """
    draw = _u(seed, salt, 100)
    out = F.when(draw < cum_pct[0], F.lit(values[0]))
    for i in range(1, len(cum_pct)):
        out = out.when(draw < cum_pct[i], F.lit(values[i]))
    return out.otherwise(F.lit(values[-1]))


def generate_orders(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """n synthetic orders with reference-like distributions, multi-day span."""
    return orders_projection(spark.range(n), seed)


def rate_orders_stream(spark: SparkSession, rows_per_second: int = 50, seed: int = 42) -> DataFrame:
    """S3 live mode: rate source -> order projection — the streaming analog
    of the reference producer's paced loop
    (/root/reference/producers/sales_producer.py:196,205-221), defaulting to
    its documented 50 orders/sec (README.md:71-72)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return orders_projection(rate.select(F.col("value").alias("id")), seed)


def orders_projection(base: DataFrame, seed: int = 42) -> DataFrame:
    """Project an `id` column into full order rows (works on range or rate)."""
    cat = F.array(*[F.struct(F.lit(p).alias("pid"), F.lit(nm).alias("pname"),
                             F.lit(c).alias("cat"), F.lit(pr).alias("price"))
                    for p, nm, c, pr in CATALOG])
    prod = F.element_at(cat, (_u(seed, "prod", len(CATALOG)) + 1).cast("int"))
    cust_n = _u(seed, "cust", 500) + 1
    qty = _weighted(seed, "qty", [50, 80, 92, 97], [1, 2, 3, 4, 5]).cast("int")
    disc = _weighted(seed, "disc", [60, 80, 95], [0.0, 5.0, 10.0, 15.0])
    # Event time: spans ~60 days from 2026-01-01, seconds granularity, with
    # out-of-order arrivals (hash jitter), exercising hourly/daily/monthly
    # rollups and partition pruning.
    ts = F.timestamp_seconds(
        F.lit(1767225600)  # 2026-01-01T00:00:00Z
        + (F.col("id") * 40009) % (60 * 86400)
        + _u(seed, "jit", 3600)
    )
    total = F.round(
        qty.cast("double") * prod["price"] * (F.lit(1.0) - disc / F.lit(100.0)), 2
    )
    return base.select(
        F.format_string("ORD-2026-%05d", (_u(seed, "oid", 90000) + 10000).cast("int")).alias("order_id"),
        F.format_string("CUST-%04d", cust_n.cast("int")).alias("customer_id"),
        F.format_string("Customer %04d", cust_n.cast("int")).alias("customer_name"),
        F.format_string("cust%04d@example.com", cust_n.cast("int")).alias("customer_email"),
        prod["pid"].alias("product_id"),
        prod["pname"].alias("product_name"),
        prod["cat"].alias("category"),
        qty.alias("quantity"),
        prod["price"].alias("unit_price"),
        disc.alias("discount_percent"),
        total.alias("total_amount"),
        F.element_at(F.array(*[F.lit(x) for x in PAYMENT_METHODS]),
                     (_u(seed, "pay", len(PAYMENT_METHODS)) + 1).cast("int")).alias("payment_method"),
        F.element_at(F.array(*[F.lit(x) for x in REGIONS]),
                     (F.pmod(F.xxhash64(F.lit(seed), cust_n), F.lit(len(REGIONS))) + 1).cast("int")).alias("region"),
        F.element_at(F.array(*[F.lit(x) for x in SALES_REPS]),
                     (_u(seed, "rep", len(SALES_REPS)) + 1).cast("int")).alias("sales_rep"),
        F.element_at(F.array(*[F.lit(x) for x in STATUSES]),
                     (_u(seed, "st", len(STATUSES)) + 1).cast("int")).alias("order_status"),
        ts.alias("order_timestamp"),
    )


def to_wire(df: DataFrame, malform_every: int | None = None) -> DataFrame:
    """Serialize orders to the Kafka wire format: one JSON string per row,
    ISO-8601 'Z'-suffixed timestamp (/root/reference/producers/
    sales_producer.py:134-137,162).  ``malform_every`` corrupts every k-th
    timestamp to exercise the consumer's fallback parse path."""
    ts_str = F.concat(
        F.date_format("order_timestamp", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")
    )
    if malform_every:
        ts_str = F.when(
            F.xxhash64(F.col("order_id"), F.col("order_timestamp")) % malform_every == 0,
            F.lit("not-a-timestamp"),
        ).otherwise(ts_str)
    wire = df.withColumn("order_timestamp", ts_str)
    return wire.select(F.to_json(F.struct(*wire.columns)).alias("value"))
