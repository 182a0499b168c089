"""Edge coverage for the late round-5 additions: rollup cascade, CDC apply,
rank battery, random projection."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.operators import (
    relational,
    rollups,
    similarity,
    windows,
)

from tests.conftest import SF_DIR


def test_rollup_cascade_conserves_grand_totals(spark):
    """Every cascade level must conserve the base measures: monthly sums
    equal the raw one-shot totals, and n_hours equals the distinct
    (hour, category) bucket count of the base rollup."""
    cascade = rollups.rollup_cascade(spark, SF_DIR)
    base = rollups.hourly_category_rollup(spark, SF_DIR)
    got = cascade.agg(
        F.sum("order_count"), F.sum("total_quantity"), F.sum("n_hours")
    ).collect()[0]
    want = base.agg(
        F.sum("order_count"), F.sum("total_quantity"), F.countDistinct("hour")
    ).collect()[0]
    assert tuple(got) == tuple(want)


def test_cdc_apply_buckets(spark):
    """Deleted bucket vanishes, updated bucket doubles, the rest pass
    through at seq 0."""
    from realtime_analytics_with_kafka_clickhouse_spark.functions.hashing import (
        stable_hash64,
    )

    out = relational.cdc_apply(spark, SF_DIR)
    orders = relational.load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("price"),
        F.pmod(stable_hash64(F.col("o_orderkey").cast("string")), F.lit(10)).alias("b"),
    )
    n = {r["b"]: r["n"] for r in orders.groupBy("b").agg(F.count("*").alias("n")).collect()}
    total = sum(n.values())
    assert out.count() == total - n.get(1, 0)
    assert out.filter(F.col("final_op") == "U").count() == n.get(0, 0)
    # updated rows carry exactly 2x the base price
    joined = out.filter(F.col("final_op") == "U").join(orders, "order_id")
    assert joined.filter(F.col("final_price") != F.col("price") * 2).count() == 0


def test_value_rank_battery_bounds(spark):
    """percent_rank/cume_dist live in [0,1]; the per-partition max of
    cume_dist is exactly 1; second_cheapest_seen is NULL only on each
    partition's first row."""
    out = windows.value_rank_battery(spark, SF_DIR).cache()
    try:
        bad = out.filter(
            (F.col("pct_rank") < 0) | (F.col("pct_rank") > 1)
            | (F.col("cume_dist") <= 0) | (F.col("cume_dist") > 1)
        )
        assert bad.count() == 0
        tops = out.groupBy("priority").agg(F.max("cume_dist").alias("m"))
        assert tops.filter(F.col("m") != 1.0).count() == 0
        assert (
            out.filter(F.col("second_cheapest_seen").isNull()).count()
            == out.select("priority").distinct().count()
        )
    finally:
        out.unpersist(blocking=False)


def test_random_projection_preserves_distances(spark):
    """JL property (statistical): squared distances in the projected space
    track the original within loose distortion on average — the projection
    is useful, not just deterministic."""
    emb = similarity.load_table(spark, SF_DIR, "embeddings").limit(40)
    proj = similarity.embedding_random_projection(spark, SF_DIR)
    rows = {r["vec_id"]: r for r in proj.join(
        emb.select("vec_id"), "vec_id"
    ).collect()}
    origs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    ids = sorted(origs)[:20]
    ratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d_orig = sum((x - y) ** 2 for x, y in zip(origs[a], origs[b]))
        pa, pb = rows[a], rows[b]
        d_proj = sum(
            (pa[f"proj_{p}"] - pb[f"proj_{p}"]) ** 2 for p in range(similarity.RP_DIM)
        )
        if d_orig > 0:
            ratios.append(d_proj / d_orig)
    mean = sum(ratios) / len(ratios)
    # E[ratio] = 1; at k=8 individual pairs swing, the mean over 10 should not
    assert 0.4 < mean < 1.8, ratios
    assert all(not math.isnan(r) for r in ratios)


def test_ann_rp_topk_recall_against_exact(spark):
    """The RP candidate cut must keep real neighbors: recall@5 vs the
    exact top-5 at a deterministic floor (isotropic fixtures are ANN's
    worst case; 32 projected dims + the 100-candidate rerank hold ~0.8)."""
    rp = similarity.ann_rp_topk(spark, SF_DIR).select("vec_id", "neighbor_id")
    exact = similarity.ann_cosine_topk(spark, SF_DIR).select(
        "vec_id", "neighbor_id"
    )
    n_exact = exact.count()
    n_hit = exact.intersect(rp).count()
    assert n_exact > 0
    assert n_hit / n_exact >= 0.6, f"recall {n_hit}/{n_exact}"


def test_versioned_collapsing_pending_cancel_annihilates_exactly(spark, tmp_path):
    """The per-version matching mechanics, observed mid-replay: a cancel
    merging BEFORE its state sits in the table as a net -1 row for that
    version; the state's arrival annihilates exactly that version while
    an unrelated v2 state survives."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_versioned_collapsing,
    )

    table = str(tmp_path / "vc")
    row = lambda k, v, s, p: (k, v, s, p)
    schema = "o_orderkey long, version long, sign long, total_price double"
    cancel_first = spark.createDataFrame([row(1, 1, -1, 10.0)], schema)
    assert merge_versioned_collapsing(spark, table, cancel_first, keys=["o_orderkey"])
    pending = spark.read.parquet(table).collect()
    assert len(pending) == 1 and pending[0]["sign"] == -1  # pending cancel
    late_state = spark.createDataFrame(
        [row(1, 1, 1, 10.0), row(1, 2, 1, 20.0)], schema
    )
    assert merge_versioned_collapsing(spark, table, late_state, keys=["o_orderkey"])
    final = spark.read.parquet(table).collect()
    assert len(final) == 1
    assert final[0]["version"] == 2 and final[0]["sign"] == 1
    assert final[0]["total_price"] == 20.0


def test_file_sources_quarantine_corrupt_lines(spark, tmp_path):
    """A malformed JSON line and a bad-typed CSV row land in quarantine
    with their raw payload; the clean side is unaffected."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources.files import (
        EVENTS_JSON_SCHEMA,
        ORDERS_CSV_SCHEMA,
        read_csv_with_dlq,
        read_json_with_dlq,
    )

    jdir = str(tmp_path / "j")
    import os
    os.makedirs(jdir)
    with open(f"{jdir}/part-0.json", "w") as f:
        f.write('{"event_id": 1, "ts": "2025-01-01T00:00:00.000000", "user_id": 7,'
                ' "event_type": "purchase", "value": 1.5, "props": "{}"}\n')
        f.write("{this is not json\n")
    ok, bad = read_json_with_dlq(spark, jdir, EVENTS_JSON_SCHEMA)
    assert ok.count() == 1 and bad.count() == 1
    assert "not json" in bad.collect()[0]["raw"]

    cdir = str(tmp_path / "c")
    os.makedirs(cdir)
    with open(f"{cdir}/part-0.csv", "w") as f:
        f.write("o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority\n")
        f.write("1,2,O,99.5,2025-01-01T00:00:00.000000,1-URGENT\n")
        f.write("oops,not,a,valid,row,at-all\n")
    ok_c, bad_c = read_csv_with_dlq(spark, cdir, ORDERS_CSV_SCHEMA)
    assert ok_c.count() == 1 and bad_c.count() == 1
    assert ok_c.collect()[0]["o_totalprice"] == 99.5


def test_weighted_sample_overrepresents_heavy_tiers(spark):
    """A-ES must bias toward weight: the heavy tiers' share of the sample
    exceeds their share of the population (deterministic on the fixture)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators import curation

    sample = curation.weighted_sample_aes(spark, SF_DIR)
    docs = curation.load_table(spark, SF_DIR, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    w = F.when(n_words >= 40, 4).when(n_words >= 15, 2).otherwise(1)
    pop = {r["w"]: r["n"] for r in docs.select(w.alias("w")).groupBy("w").agg(F.count("*").alias("n")).collect()}
    samp = {r["w"]: r["n"] for r in sample.groupBy("w").agg(F.count("*").alias("n")).collect()}
    n_pop, n_samp = sum(pop.values()), sum(samp.values())
    heavy_pop = (pop.get(2, 0) + pop.get(4, 0)) / n_pop
    heavy_samp = (samp.get(2, 0) + samp.get(4, 0)) / n_samp
    assert 0 < heavy_pop < 1  # both tiers actually exist in the fixture
    assert heavy_samp > heavy_pop, (heavy_samp, heavy_pop)
