"""Corpus-curation operators (SURVEY.md §2.9 [EXT]): the steps between
"filtered documents" and "training shards" in an LLM data pipeline.

- ``pack_training_shards``: sequential token-budget packing via a
  distributed prefix sum — NOT a single global window (which would funnel
  100 TB through one task).
- ``dedup_keep_best``: canonical-document selection per near-duplicate
  cluster (argmax quality, doc_id tiebreak), untouched docs pass through.
- ``lang_balance_resample``: deterministic hash-threshold downsampling to
  the minority-language count — the domain/language rebalancing pass.

All three verify value-exactly against DuckDB oracles: sampling thresholds
are pure integer arithmetic, packing is integer prefix sums, and keep-best
reuses the engine-portable quality expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import word_hash_expr
from ..functions.hints import runtime_broadcast
from ..sources.tables import load_table
from .dedup import minhash_near_dup, near_dup_clusters
from .text import quality_score

SHARD_TOKEN_BUDGET = 4096  # tokens per training shard
MIX_SAMPLE_MOD = 1_000_000  # hash-threshold resolution for resampling
_PACK_DOCS_PER_PART = 250_000  # target docs per prefix-sum bucket
_PACK_MAX_PARTS = 2048


def pack_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (in doc_id order) into ~SHARD_TOKEN_BUDGET-token
    training shards: shard_id = floor(preceding-token-count / budget).

    This is a GLOBAL running sum, and the naive formulation — one
    unpartitioned window — serializes the corpus through a single task.
    The scalable shape is the classic distributed prefix sum:

    1. bucket by doc_id range (bucket i's ids all precede bucket i+1's)
       — EXPLICIT integer bucketing from one min/max/count aggregate, not
       ``spark_partition_id`` after a range shuffle, because this frame is
       referenced twice and two exchange instances need not agree on
       physical partition ids;
    2. per-bucket token totals -> one tiny frame (|buckets| rows);
    3. exclusive-prefix-sum that frame (bounded window, broadcast back);
    4. per-bucket running sum + bucket offset = global running sum.

    Only step 3 is single-threaded, over one row per bucket.  The result
    is invariant to where the bucket boundaries land (id skew cannot
    perturb values, only balance)."""
    docs = load_table(spark, sf_dir, "documents")
    lo, hi, n = docs.agg(
        F.min("doc_id"), F.max("doc_id"), F.count("*")
    ).collect()[0]
    n_parts = min(_PACK_MAX_PARTS, max(1, int(n) // _PACK_DOCS_PER_PART + 1))
    bucket_width = (int(hi) - int(lo)) // n_parts + 1
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.expr(f"(doc_id - {int(lo)}) DIV {bucket_width}").alias("pid"),
    )
    per_part = base.groupBy("pid").agg(F.sum("n_tokens").alias("part_tokens"))
    off_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_part.select(
        "pid", F.coalesce(F.sum("part_tokens").over(off_w), F.lit(0)).alias("offset")
    )
    cum_w = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (F.sum("n_tokens").over(cum_w) + F.col("offset")).alias("cum_tokens")
    return (
        # offsets is CONSTANT-bounded by construction (<= _PACK_MAX_PARTS
        # rows at any corpus size), so the promise hint is safe and skips
        # both the probe job and the big side's shuffle write
        base.join(F.broadcast(offsets), "pid")
        .select("doc_id", "n_tokens", cum)
        .withColumn(
            "shard_id",
            F.expr(f"(cum_tokens - n_tokens) DIV {SHARD_TOKEN_BUDGET}"),
        )
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate resolution: keep ONE document per near-dup cluster —
    the highest quality_score, doc_id as tiebreak — and pass every
    unclustered document through untouched (cluster_id = own doc_id).

    Scale shape: the cluster assignment is orders of magnitude smaller
    than the corpus (only docs in >= 1 near-dup pair), so both the member
    join and the survivor anti-join broadcast it; the argmax window runs
    over cluster members only, never the whole corpus."""
    clusters = near_dup_clusters(spark, sf_dir)  # (doc_id, cluster_id), small
    quality = quality_score(spark, sf_dir).select("doc_id", "quality_score")
    # cluster labels scale with duplication density and sit above the
    # near-dup join barrier (a limit-probe re-executes it — the r10
    # +0.67s regression): AQE's runtime conversion is the size gate
    members = quality.join(runtime_broadcast(clusters), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    best = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id", "quality_score")
    )
    loners = quality.join(
        runtime_broadcast(clusters.select("doc_id")), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("cluster_id"), "quality_score")
    return best.unionByName(loners)


def lang_balance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward uniform language representation:
    downsample every language to ~the minority language's count with a
    deterministic hash threshold (no RNG state, same subset on any engine
    or run):  keep doc iff  h('mix', doc_id) mod 1e6  <  1e6 * min_count /
    count(lang).

    The threshold is exact bigint arithmetic (multiply-then-DIV), so the
    DuckDB oracle reproduces the selection bit-for-bit.  Per-language
    counts and the global min are two tiny broadcast frames; the filter
    itself is map-side — no shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("lang_docs"))
    min_docs = counts.agg(F.min("lang_docs").alias("min_docs"))
    thr = F.least(
        F.lit(MIX_SAMPLE_MOD).cast("long"),
        F.expr(f"min_docs * {MIX_SAMPLE_MOD} DIV lang_docs"),
    )
    bucket = F.pmod(
        word_hash_expr(F.col("doc_id").cast("string"), F.lit("mix")),
        F.lit(MIX_SAMPLE_MOD),
    )
    return (
        docs.join(F.broadcast(counts), "lang")
        .join(F.broadcast(min_docs))
        .filter(bucket < thr)
        .select("doc_id", "lang", "source")
    )


SPLIT_MOD = 100
SPLIT_TRAIN_LT = 90  # [0, 90) -> train
SPLIT_VAL_LT = 95    # [90, 95) -> val; [95, 100) -> test


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5): bucket =
    h('split', doc_id) mod 100, thresholds on the bucket — no RNG state,
    so every engine, run, and executor count produces the SAME split, and
    a document's assignment never changes as the corpus grows (the
    property that keeps eval sets stable across dataset versions).

    Map-only: the hash and the CASE run inside the scan's codegen stage —
    zero shuffles at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        word_hash_expr(F.col("doc_id").cast("string"), F.lit("split")),
        F.lit(SPLIT_MOD),
    ).cast("long")
    return docs.select("doc_id", bucket.alias("bucket")).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < SPLIT_TRAIN_LT, F.lit("train"))
        .when(F.col("bucket") < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-mix "data card": per (lang, source) corpus statistics a
    dataset release ships — document and token volume, and how much of the
    slice sits inside a near-duplicate cluster (both doc- and
    token-weighted).  This is what a mixture-weights decision (and every
    dedup-before/after comparison) reads.

    Determinism: every statistic is an exact integer (counts, token sums);
    the two fractions are single float divisions of those integers rounded
    to 6 — identical on any engine at any parallelism.  Shape: the cluster
    membership frame is near-dup-bounded (tiny vs. the corpus), so the dup
    flag is a broadcast left-semi lookup; the report itself is one
    group-by over (lang, source) — map-side combine, |langs x sources|
    output rows."""
    docs = load_table(spark, sf_dir, "documents")
    members = near_dup_clusters(spark, sf_dir).select("doc_id")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    flagged = docs.select("doc_id", "lang", "source", n_tokens.alias("n_tokens")).join(
        runtime_broadcast(members).withColumn("is_dup", F.lit(1)), "doc_id", "left"
    ).fillna({"is_dup": 0})
    return flagged.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("is_dup").cast("long").alias("n_dup_docs"),
        F.sum(F.col("is_dup") * F.col("n_tokens")).alias("dup_tokens"),
        F.round(
            F.sum("is_dup").cast("double") / F.count("*").cast("double"), 6
        ).alias("dup_doc_fraction"),
        F.round(
            F.sum(F.col("is_dup") * F.col("n_tokens")).cast("double")
            / F.sum("n_tokens").cast("double"),
            6,
        ).alias("dup_token_fraction"),
    )


MIX_TEMPERATURE_INV = 2  # 1/T with T = 0.5: weight ∝ p^(1/2) = sqrt(p)


def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture weights (the multilingual
    sampling scheme of mBERT/XLM-R: sample language l with probability
    ∝ p_l^(1/T), T<1 upweights low-resource languages).  T is fixed at
    0.5 so the exponent is a SQUARE ROOT — IEEE sqrt is correctly rounded
    on every engine, where a general pow() is not: the same
    cross-engine-exactness rationale as tfidf's rational idf.  Weights
    normalize over sqrt(n_l); expected_docs uses the explicit
    floor(x + 0.5) rounding convention (engine-portable, unlike round()'s
    half-even/half-away split).

    Shape: one count aggregate keyed by language (|langs| rows), then
    whole-frame window sums ORDERED BY lang — the sequential left-assoc
    accumulation both engines produce for an ordered frame, so the double
    sum of sqrt weights is bit-identical.  The window runs over the
    language table, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    wf = Window.orderBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sqrt_n = F.sqrt(F.col("n_docs").cast("double"))
    staged = counts.select(
        "lang",
        "n_docs",
        F.sum("n_docs").over(wf).cast("long").alias("total_docs"),
        sqrt_n.alias("w_raw"),
        F.sum(sqrt_n).over(wf).alias("w_total"),
    )
    weight = F.col("w_raw") / F.col("w_total")
    return staged.select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total_docs").cast("double"), 6).alias("p_lang"),
        F.round(weight, 6).alias("mix_weight"),
        F.floor(weight * F.col("total_docs").cast("double") + F.lit(0.5))
        .cast("long")
        .alias("expected_docs"),
    )


AES_SAMPLE_K = 100


def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES,
    2006): each doc draws key = u^(1/w) from a
    deterministic uniform u, and the global top-K keys ARE the weighted
    sample — the standard one-pass distributed algorithm (no rejection
    loop, no global state).

    Cross-engine exactness by construction: weights are QUALITY TIERS
    restricted to {1, 2, 4} (word-count thresholds), so u^(1/w) is a
    sqrt CHAIN — u, sqrt(u), sqrt(sqrt(u)) — and IEEE sqrt is correctly
    rounded on both engines where pow() is not.  u derives from the
    portable md5 hash: (h % M + 1) / (M + 1) with M = 2^52, exact in
    doubles.  Top-K plans as TakeOrderedAndProject — per-partition heads,
    no global sort exchange."""
    from ..functions.hashing import stable_hash64

    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    w = (
        F.when(n_words >= 40, 4).when(n_words >= 15, 2).otherwise(1).cast("long")
    )
    m = 1 << 52
    u = (F.pmod(stable_hash64(F.col("doc_id").cast("string")), F.lit(m)) + 1) / F.lit(
        float(m + 1)
    )
    key = (
        F.when(F.col("w") == 4, F.sqrt(F.sqrt(F.col("u"))))
        .when(F.col("w") == 2, F.sqrt(F.col("u")))
        .otherwise(F.col("u"))
    )
    scored = docs.select(
        "doc_id", w.alias("w"), u.alias("u")
    ).select("doc_id", "w", key.alias("key"))
    return (
        scored.orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(AES_SAMPLE_K)
        .select("doc_id", "w", "key")
    )


def shard_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency data card (NEW r6): per training shard, how
    full it actually is — doc count, token sum, overflow beyond the
    budget (a doc straddling the boundary lands in the shard its
    PRECEDING count dictates, so shards can run slightly over), and
    utilization in integer basis points.  This is the report a dataloader
    team reads before fixing sequence length: systematic overflow means
    truncation loss, systematic underflow means padding waste.

    All-integer arithmetic on top of the distributed prefix-sum packing
    (one extra |shards|-row aggregate — no new scan of the corpus)."""
    packed = pack_training_shards(spark, sf_dir)
    budget = F.lit(SHARD_TOKEN_BUDGET)
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
        .select(
            "shard_id",
            "n_docs",
            "shard_tokens",
            F.greatest(F.col("shard_tokens") - budget, F.lit(0)).alias(
                "overflow_tokens"
            ),
            # integer DIV, not double /-then-cast: exact floor on both
            # engines at any magnitude
            F.expr(
                f"CAST((shard_tokens * 10000) DIV {SHARD_TOKEN_BUDGET} AS BIGINT)"
            ).alias("utilization_bp"),
        )
    )


def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (per-domain) quota enforcement on CHAR VOLUME: no
    source may contribute more than the MEAN source char volume — the
    anti-dominance byte-budget pass web-corpus pipelines (CCNet /
    RefinedWeb-style) run so one crawler-friendly domain can't swamp the
    training mix.  Within an over-quota source the survivors are the
    char-prefix of docs in (n_chars DESC, doc_id ASC) priority whose
    INCLUSIVE cumulative chars fit the quota (strict budget, no
    straddling doc); the fixture's doc COUNTS per source are uniform by
    construction, so a count cap would never fire — the char budget is
    what makes every column here falsifiable (mixed capped flags at all
    three SFs).

    Output: one row per source — total docs/chars, the quota, kept
    docs/chars, capped flag.  All exact integers: the quota is bigint
    sum-then-DIV, the prefix is a window sum, so the DuckDB oracle
    reproduces the selection bit-for-bit.

    Scale shape: the quota is ONE scalar from a |sources|-row aggregate
    (broadcast); the prefix-and-keep is a window partitioned BY SOURCE,
    so each domain's docs shuffle to one partition group — bounded by
    the largest domain, the same assumption every per-domain pass makes
    (a domain too hot for one partition is exactly what the cap
    removes), and the count-only summary never materializes kept rows
    wide.  Reference analog: the mix-balancing role of
    /root/reference/clickhouse/init/01_init.sql:60-87's per-category MVs
    (keep per-group volumes comparable), recast as a curation operator."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    totals = docs.groupBy("source").agg(
        F.count("*").alias("total_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    quota = totals.agg(
        F.expr("CAST(sum(total_chars) DIV count(*) AS BIGINT)").alias(
            "quota_chars"
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        docs.withColumn("cum_chars", F.sum("n_chars").over(w))
        .join(F.broadcast(quota))
        .filter(F.col("cum_chars") <= F.col("quota_chars"))
        .groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )
    return (
        totals.join(kept, "source", "left")
        .join(F.broadcast(quota))
        .select(
            "source",
            "total_docs",
            "total_chars",
            "quota_chars",
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias(
                "kept_docs"
            ),
            F.coalesce(F.col("kept_chars"), F.lit(0)).cast("long").alias(
                "kept_chars"
            ),
            (F.col("total_chars") > F.col("quota_chars")).cast("int").alias(
                "capped"
            ),
        )
    )


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split: assignment is hashed on the
    near-dup CLUSTER id, not the doc id, so near-duplicates can never
    straddle a split boundary — the train/test-contamination guard a
    training pipeline needs BETWEEN dedup and eval-set freezing (a
    near-dup of a test doc sitting in train inflates eval exactly like
    benchmark contamination).  Unclustered docs hash on their own id
    with the SAME salt, so their assignment is identical to the naive
    per-doc split — only clustered docs move.

    Output: per-split doc and cluster counts, plus two repeated global
    proof columns: cross-split near-dup pairs under the NAIVE per-doc
    split (nonzero — 2/4/51 pairs at sf0.001/0.01/0.1, what this
    operator exists to prevent) and under the safe split (0 by
    construction, and the oracle recomputes BOTH from scratch).

    Scale shape: the cluster map is near-dup-pair-sized (broadcast); the
    split itself stays map-only on the corpus; the leak audit joins the
    pair list (small) to two split columns — nothing quadratic, nothing
    driver-side."""
    clusters = near_dup_clusters(spark, sf_dir)  # (doc_id, cluster_id), small
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    withc = docs.join(runtime_broadcast(clusters), "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )

    def bucket(col):
        return F.pmod(
            word_hash_expr(col.cast("string"), F.lit("split")),
            F.lit(SPLIT_MOD),
        ).cast("long")

    def split_of(b):
        return (
            F.when(b < SPLIT_TRAIN_LT, F.lit("train"))
            .when(b < SPLIT_VAL_LT, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    assigned = withc.select(
        "doc_id",
        "cluster_id",
        split_of(bucket(F.col("cluster_id"))).alias("split"),
        split_of(bucket(F.col("doc_id"))).alias("naive_split"),
    )
    pairs = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    a = assigned.select(
        F.col("doc_id").alias("doc_a"),
        F.col("split").alias("sa"),
        F.col("naive_split").alias("na"),
    )
    b = assigned.select(
        F.col("doc_id").alias("doc_b"),
        F.col("split").alias("sb"),
        F.col("naive_split").alias("nb"),
    )
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    leaks = j.agg(
        F.sum((F.col("sa") != F.col("sb")).cast("long")).alias("safe_leaky_pairs"),
        F.sum((F.col("na") != F.col("nb")).cast("long")).alias("naive_leaky_pairs"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .join(F.broadcast(leaks))  # global agg: exactly ONE row by construction
    )


SHUFFLE_DOCS_PER_SHARD = 100  # docs per shuffled training shard
SHUFFLE_SALT = "shuffle"  # permutation key salt (new salt = new epoch order)


def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE of the corpus into training shards —
    the decorrelation step before serving data to a trainer (adjacent
    raw docs share a crawl/source; training wants them scattered).  The
    permutation key is md5(salt:doc_id), so the order is reproducible,
    seedable per epoch (change the salt), and engine-portable.

    Assigning the global position is the same scalable shape as
    ``pack_training_shards``: a naive ``row_number() OVER (ORDER BY
    key)`` funnels 100 TB through one task, so instead (1) rows bucket
    by their key's first two hex chars — 256 ranges whose lexicographic
    order equals the key order; (2) one tiny per-bucket count frame;
    (3) an exclusive prefix sum over those 256 rows (the only
    single-threaded step); (4) position = bucket offset + within-bucket
    rank (a per-bucket window).  shard_id = position DIV
    SHUFFLE_DOCS_PER_SHARD: every shard is an md5-random sample of the
    whole corpus, which the decorrelation pytest makes falsifiable."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(
        F.concat_ws(":", F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string"))
    )
    base = docs.select(
        "doc_id", key.alias("skey"), F.substring(key, 1, 2).alias("pid")
    )
    per = base.groupBy("pid").agg(F.count("*").alias("n"))
    off_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.select(
        "pid", F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("offset")
    )
    rn_w = Window.partitionBy("pid").orderBy("skey", "doc_id")
    pos = (F.row_number().over(rn_w) + F.col("offset") - 1).cast("long")
    return (
        # offsets is <= 256 rows by construction (pid = 2 hex chars)
        base.join(F.broadcast(offsets), "pid")
        .select("doc_id", pos.alias("shuffle_pos"))
        .withColumn(
            "shard_id",
            F.expr(f"shuffle_pos DIV {SHUFFLE_DOCS_PER_SHARD}").cast("long"),
        )
    )


# Linear quality probe: full-batch GD hyperparameters.  ETA is a power of
# two (exact binary scaling) and EPOCHS is fixed — the oracle unrolls the
# same number of iteration CTEs.
LP_ETA = 0.5
LP_EPOCHS = 3
_LP_FEATS = ("x1", "x2", "x3", "x4")


def _probe_features(docs: DataFrame) -> DataFrame:
    """Per-doc probe features + label, every expression engine-portable
    (ints and IEEE divisions in the same association order as the DuckDB
    oracle): token count (/128), mean word length (/8), distinct-token
    ratio, stopword ratio; label = is-English."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    return docs.select(
        "doc_id",
        (n / F.lit(128.0)).alias("x1"),
        (
            ((F.length("text") - (n - F.lit(1))) * F.lit(1.0) / n) / F.lit(8.0)
        ).alias("x2"),
        (F.size(F.array_distinct(words)) * F.lit(1.0) / n).alias("x3"),
        (
            F.size(F.filter(words, lambda t: t.isin("a", "the"))) * F.lit(1.0) / n
        ).alias("x4"),
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )


def quality_linear_probe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed trainer for a linear quality probe (the fastText-style
    "does this look like curated text" classifier of LLM data pipelines,
    squared loss): LP_EPOCHS rounds of full-batch gradient descent where
    each epoch is ONE map-side-combined aggregate over the corpus and the
    model (5 doubles) lives on the driver — the classic
    broadcast-weights / reduce-gradients data-parallel shape.  At 100 TB
    each epoch shuffles only per-partition partial gradient sums (5
    decimals x partitions), never rows.

    Squared loss instead of logistic is deliberate: +,-,*,/ are
    IEEE-deterministic in both engines while JVM Math.exp and libm exp
    may differ by 1 ulp, so a sigmoid would poison the cross-engine
    value-exactness the oracle proves.  Per-doc gradient contributions
    are round-6 then folded through DECIMAL(25,6) (order-independent);
    weight updates replay identically in the oracle's unrolled epoch
    CTEs.  Output: final weights plus before/after training MSE."""
    f = _probe_features(load_table(spark, sf_dir, "documents"))
    # cache(): LP_EPOCHS + 1 aggregate passes over a 6-column projection.
    f = f.cache()

    def pred_col(wv: list[float]):
        p = F.lit(wv[0])
        for wj, xc in zip(wv[1:], _LP_FEATS):
            p = p + F.lit(wj) * F.col(xc)
        return p

    def gterm(expr):
        return (
            F.sum(F.round(expr, 6).cast("decimal(25,6)")).cast("double")
            / F.count("*")
        )

    w = [0.0] * (len(_LP_FEATS) + 1)
    for _ in range(LP_EPOCHS):
        p = pred_col(w)
        row = f.agg(
            gterm(p - F.col("y")).alias("gb"),
            *[
                gterm((p - F.col("y")) * F.col(xc)).alias(f"g{j}")
                for j, xc in enumerate(_LP_FEATS, start=1)
            ],
        ).collect()[0]
        grads = [row["gb"]] + [row[f"g{j}"] for j in range(1, len(_LP_FEATS) + 1)]
        w = [wj - LP_ETA * gj for wj, gj in zip(w, grads)]
    p0 = pred_col([0.0] * (len(_LP_FEATS) + 1))
    pf = pred_col(w)
    out = f.agg(
        gterm((p0 - F.col("y")) * (p0 - F.col("y"))).alias("mse_init"),
        gterm((pf - F.col("y")) * (pf - F.col("y"))).alias("mse_final"),
    )
    return out.select(
        F.lit(w[0]).alias("wb"),
        F.lit(w[1]).alias("w1"),
        F.lit(w[2]).alias("w2"),
        F.lit(w[3]).alias("w3"),
        F.lit(w[4]).alias("w4"),
        "mse_init",
        "mse_final",
    )


# Token budget for the epoch schedule: train for 2x the corpus volume
# (the "2 epochs-equivalent" planning point; any multiplier works, the
# card's value is the per-source repeat spread under temperature mixing).
EPOCH_BUDGET_MULT = 2


def epoch_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained training planning card (the datablations /
    DoReMi-era question: "how many EPOCHS of each source does my mixture
    imply?"): per source, its exact token volume, its temperature-0.5
    mixture weight over TOKENS (sqrt upweights low-resource sources —
    the ``temperature_mix_weights`` discipline, on token rather than doc
    counts), the token allocation under a budget of EPOCH_BUDGET_MULT x
    the corpus volume, and the implied repeat factor (epochs of that
    source).  Low-resource sources repeat MORE under temperature
    sampling — exactly the over-repetition the planning card exists to
    surface before a run commits.

    Exactness: token counts are exact integers; sqrt is correctly
    rounded everywhere; the weight-sum rides the ordered-window
    sequential accumulation (bit-identical across engines); allocation
    uses the portable floor(x + 0.5) convention, the repeat factor the
    floor(x*1e6+0.5)/1e6 chain, and epochs_ceil exact integer ceiling
    division.  Shape: one source-keyed corpus aggregate, then windows
    over the |sources| frame only."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens")
    )
    wf = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sqrt_n = F.sqrt(F.col("n_tokens").cast("double"))
    staged = counts.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(wf).cast("long").alias("total_tokens"),
        sqrt_n.alias("w_raw"),
        F.sum(sqrt_n).over(wf).alias("w_total"),
    )
    weight = F.col("w_raw") / F.col("w_total")
    budget = (F.col("total_tokens") * F.lit(EPOCH_BUDGET_MULT)).cast("long")
    alloc = F.floor(weight * budget.cast("double") + F.lit(0.5)).cast("long")
    staged = staged.select(
        "source",
        "n_tokens",
        F.floor(weight * F.lit(1000000.0) + F.lit(0.5)).cast("double").alias("w6"),
        alloc.alias("allocated_tokens"),
    )
    repeat = F.floor(
        F.col("allocated_tokens").cast("double") / F.col("n_tokens").cast("double")
        * F.lit(1000000.0)
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    # exact integer ceiling division (a DOUBLE divide + cast truncates
    # unpredictably at int64 magnitudes)
    epochs_ceil = F.expr(
        "CAST((allocated_tokens + n_tokens - 1) DIV n_tokens AS BIGINT)"
    )
    return staged.select(
        "source",
        "n_tokens",
        (F.col("w6") / F.lit(1000000.0)).alias("mix_weight"),
        "allocated_tokens",
        repeat.alias("repeat_factor"),
        epochs_ceil.alias("epochs_ceil"),
    )


SPAN_MEAN_LEN = 3  # T5 span-corruption mean span length
SPAN_RATIO_PCT = 15  # percent of tokens to corrupt


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLAN (Raffel et al. 2020, public paper —
    the denoising objective's data-prep step): for every document, pick
    the token spans to mask — 15% of tokens in spans of length 3 — as a
    deterministic, seeded-hash plan (no RNG state: the same spans on any
    engine, any run, any partitioning — reproducible pretraining).

    Plan rule (documented convention): n_spans = max(1, floor(n * 15 /
    100) div 3); the document splits into n_spans equal segments and span
    i starts at segment_start + h(doc_id, i) % jitter_room (the seeded
    hash keeps spans spread out but non-periodic); spans truncate at the
    document end.  Everything is integer/hash arithmetic — exact in any
    engine (SURVEY §5 class 4).

    Scale shape: one map-side token count, a sequence explode bounded by
    n_spans-per-doc (~n/20 elements), a per-doc integer rollup — no
    shuffle wider than the doc-keyed aggregate, no Python."""
    from ..functions.hashing import word_hash_expr

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    n_spans = F.greatest(
        F.lit(1), F.expr(f"(n_tokens * {SPAN_RATIO_PCT} div 100) div {SPAN_MEAN_LEN}")
    )
    base = docs.select("doc_id", n_tok.alias("n_tokens")).withColumn(
        "n_spans", n_spans.cast("long")
    )
    ex = base.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("i"),
    )
    gap = F.expr("n_tokens div n_spans")
    room = F.greatest(F.lit(1), gap - F.lit(SPAN_MEAN_LEN))
    jitter = F.pmod(
        word_hash_expr(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("i").cast("string")),
            F.lit("span"),
        ),
        room,
    )
    spans = ex.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        (F.col("i") * gap + jitter).cast("long").alias("start"),
    ).withColumn(
        "span_len",
        F.least(F.lit(SPAN_MEAN_LEN), F.col("n_tokens") - F.col("start")).cast(
            "long"
        ),
    )
    return spans.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max("n_spans").alias("n_spans"),
        F.sum("span_len").cast("long").alias("n_corrupted"),
        F.expr(
            "(2 * sum(span_len) * 1000000 + max(n_tokens))"
            " div (2 * max(n_tokens))"
        ).cast("long").alias("corruption_micros"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("start")),
                lambda s: s.cast("string"),
            ),
            ",",
        ).alias("span_starts_csv"),
    )
