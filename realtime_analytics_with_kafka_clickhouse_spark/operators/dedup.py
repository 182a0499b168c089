"""Deduplication operators over ``documents`` (SURVEY.md §2.9 [EXT]).

Implementations are pure DataFrame/higher-order-function programs — no
Python UDFs — so they run JVM-side with whole-stage codegen and scale by
partitioning:

- exact dedup: hash group-by on the full text (at 100 TB: group on a
  64-bit content hash first, rehash-confirm within groups).
- n-gram Jaccard: shingle -> explode -> equi-join on shingle.  The join is
  the scalable near-dup pattern (no O(n^2) cross join); a document-frequency
  cap drops ubiquitous shingles, which is both a quality filter and the skew
  guard that keeps the shingle join balanced at scale.
- MinHash LSH: seeded-hash minima per (doc, seed) -> banded signatures ->
  bucket join for candidates -> exact Jaccard verify.  State per doc is
  k minhashes; candidate generation touches only same-bucket pairs.
- SimHash: 32-bit fingerprints from word-hash sign sums.

Hashes are md5-derived (functions.hashing) so the DuckDB oracle reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import word_hash_expr
from ..sources.tables import load_table

# Shingle width for near-dup detection.
NGRAM = 3
# Skew/quality guard: ignore shingles present in more than this many docs.
MAX_SHINGLE_DOC_FREQ = 100
# MinHash family: 12 hash functions in 4 bands of 3 rows.
MINHASH_K = 12
MINHASH_BAND_ROWS = 3
# Verified-near-dup threshold.
JACCARD_THRESHOLD = 0.5


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative (min doc_id) per distinct text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("dup_count"),
    ).select("keep_doc_id", "dup_count")


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct — word 3-grams via higher-order functions."""
    words = F.split(F.col("text"), " ")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(words) - (NGRAM - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
        ),
    )
    return (
        docs.filter(F.size(words) >= NGRAM)
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def _frequent_shingles_removed(sh: DataFrame) -> DataFrame:
    doc_freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    keep = doc_freq.filter(F.col("df") <= MAX_SHINGLE_DOC_FREQ).select("shingle")
    # cache(): the shingle set feeds 3+ downstream branches (sizes,
    # intersection join both sides, minhash) — without it Spark re-derives
    # the explode per branch.
    return sh.join(F.broadcast(keep), "shingle").cache()


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard >= 0.5 (shingle equi-join, no cross
    join)."""
    sh = _frequent_shingles_removed(_doc_shingles(load_table(spark, sf_dir, "documents")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, band, sig): banded minhash signatures.

    Minima are computed per (doc, seed) after exploding a seed sequence —
    one shuffle keyed on (doc, seed); signature assembly is a sorted
    collect_list within (doc, band), deterministic because entries are
    prefixed with the zero-padded seed index.
    """
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(MINHASH_K - 1))).alias("seed"),
        "shingle",
    )
    minh = seeded.groupBy("doc_id", "seed").agg(
        F.min(word_hash_expr("shingle", F.col("seed"))).alias("mh")
    )
    return (
        minh.withColumn("band", (F.col("seed") / MINHASH_BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.format_string("%02d:%d", F.col("seed"), F.col("mh")))
                ),
            ).alias("sig")
        )
    )


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pipeline: banded signatures -> bucket join ->
    exact-Jaccard verification (>= 0.5).  Output: (doc_a, doc_b, jaccard)."""
    sh = _frequent_shingles_removed(_doc_shingles(load_table(spark, sf_dir, "documents")))
    sig = _minhash_signatures(sh)
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    candidates = (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Candidate-only verification — the whole point of LSH.  Shingle sets are
    # materialized ONLY for docs that appear in some candidate pair (semi-join
    # against the candidate doc ids), then exact Jaccard is computed per
    # candidate pair via array_intersect.  Verify cost is O(|candidates| *
    # avg_shingles), never the full co-shingle self-join the brute-force
    # ngram_jaccard_pairs path does.
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    doc_sets = (
        sh.join(cand_docs, "doc_id")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shingles"), F.count("*").alias("n"))
    )
    sa = doc_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sha"), F.col("n").alias("na")
    )
    sb = doc_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("shb"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb"))).cast("long")
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / (F.col("na") + F.col("nb") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from word-occurrence hash sign sums.

    Map-only: the whole fingerprint folds per row with higher-order
    functions — token hashes accumulate into a 32-slot bit-sum array
    (one pass over the tokens), then the signs pack into the final
    integer.  Zero shuffles, zero explodes; at 100 TB this is a pure
    scan+project stage (pinned by tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    simhash = F.expr(
        """
        aggregate(
          zip_with(
            aggregate(
              transform(split(text, ' '),
                        w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)),
              array_repeat(CAST(0 AS BIGINT), 32),
              (acc, h) -> zip_with(acc, sequence(0, 31),
                                   (a, b) -> a + CASE WHEN (shiftright(h, b) & 1) = 1
                                                 THEN 1 ELSE -1 END)
            ),
            sequence(0, 31),
            (s, b) -> CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b)
                      ELSE CAST(0 AS BIGINT) END
          ),
          CAST(0 AS BIGINT),
          (acc, x) -> acc + x
        )
        """
    )
    return docs.select("doc_id", simhash.alias("simhash"))
