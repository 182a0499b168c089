"""Similarity search over ``embeddings`` (SURVEY.md §2.9 [EXT]).

Two paths, as a real engine would ship:

- ``ann_cosine_topk``: exact brute-force top-k — the correctness baseline.
  O(n^2) pairs; at driver scale this is a single shuffle-free cross join of
  one small broadcast side.  NOT the 100 TB path.
- ``ann_lsh_bucketed``: random-hyperplane LSH — vectors hash to a signature
  bucket; only same-bucket pairs are compared.  This is the scale path:
  candidate count ~ n^2 / 2^planes per bucket family, and the bucket join
  is a plain shuffle join on the signature.

Determinism: dot products are sequential left folds over the dimension
index (identical fold order in the DuckDB oracle), cosines are rounded to 6
decimals BEFORE ranking, and every ordering carries the neighbor id as a
tiebreak — so results are bit-stable across engines and parallelism.

Hyperplanes are md5-derived ±1 components (functions.hashing), so the
oracle re-derives the same planes; a production deployment would precompute
the plane matrix once and broadcast it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64
from ..sources.tables import load_table

DIM = 64
TOP_K = 5
LSH_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over dims 1..64 (double math)."""
    prods = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _normed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors per vector (brute-force baseline)."""
    v = _normed_vectors(spark, sf_dir)
    a = v.select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def _signature_col(e: Column) -> Column:
    """Random-hyperplane signature: sum over p of (dot_p(v) > 0) * 2^p.

    plane_p[j] = +1 if md5-hash("p:j") is odd else -1 — rederivable anywhere
    (incl. the oracle); a production deployment precomputes the plane matrix
    once and broadcasts it instead of hashing per row.
    """
    def plane_comp(p, j):
        h = stable_hash64(F.concat_ws(":", p.cast("string"), j.cast("string")))
        return F.when(h % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    def plane_dot(p):
        prods = F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: plane_comp(p, j) * F.element_at(e, j).cast("double"),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    bit_vals = F.transform(
        F.sequence(F.lit(0), F.lit(LSH_PLANES - 1)),
        lambda p: F.when(plane_dot(p) > 0, F.pow(F.lit(2.0), p.cast("double"))).otherwise(F.lit(0.0)),
    )
    return F.aggregate(bit_vals, F.lit(0.0), lambda acc, x: acc + x).cast("long")


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed candidate pairs with exact cosine (>= no threshold;
    bucket membership is the filter).  Output: (vec_a, vec_b, cos_sim)."""
    v = _normed_vectors(spark, sf_dir).withColumn(
        "sig", _signature_col(F.col("embedding"))
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"), "sig",
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"), "sig",
    )
    cos = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, "sig")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
    )
