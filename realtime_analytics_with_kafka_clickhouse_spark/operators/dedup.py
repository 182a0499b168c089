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

from ..functions.hints import broadcast_if_small, runtime_broadcast
from ..sources.tables import load_table

# Shingle width for near-dup detection.
NGRAM = 3
# Skew/quality guard: ignore shingles present in more than
# MAX_SHINGLE_DOC_FREQ documents.  ABSOLUTE cap only (the Lee et al.
# exact-dedup convention): a corpus-relative arm (0.01 * n_docs) grows
# with the corpus — at 1B docs a shingle in 10M docs would survive and
# contribute 10M^2 join pairs — so the cap must not scale with n.  An
# absolute cap bounds every shingle's pair contribution at cap^2 and
# bounds the FREQUENT (dropped) set at total_shingle_rows / cap members,
# which is what makes it the broadcastable side of the anti join below.
MAX_SHINGLE_DOC_FREQ = 100
# MinHash family: 12 hash functions in 4 bands of 3 rows.
MINHASH_K = 12
MINHASH_BAND_ROWS = 3
# Universal-hash modulus for the derived family (31-bit prime).
MINHASH_MOD = 2147483647


def _minhash_coeffs(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """(a_i, b_i) for the derived hash family h_i(x) = (a_i*x + b_i) mod p.

    One md5 per shingle (the 28-bit base) plus k cheap linear combinations
    replaces k md5 evaluations per shingle.  Coefficients are md5-derived
    constants so both engines embed identical literals; a_i stays odd and
    all products stay < 2^57 (no 64-bit overflow on either engine).
    """
    import hashlib

    def h7(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    return [(h7(f"a:{i}") * 2 + 1, h7(f"b:{i}")) for i in range(k)]


MINHASH_COEFFS = _minhash_coeffs()
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
    """(doc_id, shingle) distinct — word 3-grams via the shared zip_with
    n-gram kernel (text._word_ngrams; ~3x the throughput of per-element
    element_at probes — HOFs run interpreted, so the inner loop is the
    cost)."""
    from .text import _word_ngrams  # local import avoids a module cycle

    words = F.split(F.col("text"), " ")
    return (
        docs.filter(F.size(words) >= NGRAM)
        .select(
            "doc_id",
            F.explode(F.array_distinct(_word_ngrams(words, NGRAM))).alias("shingle"),
        )
    )


def _frequent_shingles_removed(sh: DataFrame) -> DataFrame:
    # left_anti against the FREQUENT set — the side that is small RELATIVE
    # to the corpus (<= total_shingle_rows / cap members, each needing
    # > cap occurrences) but still corpus-growing, so the broadcast is
    # size-GATED; and the frame sits above an aggregate barrier, so the
    # gate is AQE's runtime SMJ->broadcast conversion (runtime_broadcast
    # — a limit-probe here would re-run the whole explode+agg once per
    # call).  Above AQE's byte threshold the anti-join stays a shuffle
    # join instead of OOMing an executor.  The kept (rare) side is
    # vocabulary-sized — nearly every distinct shingle — and must never
    # be the broadcast side (boilerplate_spans uses the inverted shape).
    frequent = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > F.lit(MAX_SHINGLE_DOC_FREQ))
        .select("shingle")
    )
    # cache(): the shingle set feeds 3+ downstream branches (sizes,
    # intersection join both sides, minhash) — without it Spark re-derives
    # the explode per branch.
    return sh.join(runtime_broadcast(frequent), "shingle", "left_anti").cache()


def _capped_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frequency-capped (doc_id, shingle) kernel, memoized to a
    scratch parquet table per documents fingerprint: EIGHT registry
    queries start from this exact frame (near-dup pairs, minhash family,
    contamination, novelty, s-curve, the threshold sweep, the LSH
    tuner), and each re-derivation is a full explode + cap anti-join.
    The artifact is deterministic (distinct word 3-grams under an
    absolute df cap) and stays distributed — parquet out, parquet in,
    never collected."""
    from ._memo import memo_get, scratch_persist

    def compute():
        sh = _frequent_shingles_removed(
            _doc_shingles(load_table(spark, sf_dir, "documents"))
        )
        try:
            return {"path": scratch_persist(sh, "capped_shingles")}
        finally:
            # the cache existed to fan the kernel into its 3+ consumer
            # branches during ONE derivation; after the parquet write all
            # consumers read the scratch table, so holding the cached RDD
            # would just pin executor memory for the rest of the session
            sh.unpersist()

    state = memo_get("capped_shingles", sf_dir, ("documents",), compute)
    return spark.read.parquet(state["path"])


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard >= 0.5 (shingle equi-join, no cross
    join)."""
    sh = _capped_shingles(spark, sf_dir)
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


def _minhash_columns(sh: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): the k pre-band minhash components —
    shared by the banded signatures and the s-curve report."""
    base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 7), 16, 10).cast("bigint")
    return sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * base + F.lit(b)) % F.lit(MINHASH_MOD)).alias(f"mh_{i}")
            for i, (a, b) in enumerate(MINHASH_COEFFS)
        ]
    )


def _minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, band, sig): banded minhash signatures.

    One md5 per (doc, shingle) row yields a 28-bit base; the k family
    members are linear combinations of it (MINHASH_COEFFS), folded as k
    ``min`` aggregate columns in a SINGLE groupBy(doc_id) — one shuffle of
    k longs per doc, no seed explosion (the previous shape shuffled k x the
    shingle volume and ran k md5s per shingle).  Band signatures then
    assemble map-side from the k columns.
    """
    minh = _minhash_columns(sh)
    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.format_string("%02d:%d", F.lit(i), F.col(f"mh_{i}"))
                        for i in range(
                            band * MINHASH_BAND_ROWS, (band + 1) * MINHASH_BAND_ROWS
                        )
                    ],
                ).alias("sig"),
            )
            for band in range(n_bands)
        ]
    )
    return minh.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def _minhash_sigs_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus banded signatures ``(doc_id, band, sig)``, memoized to
    a scratch parquet table per documents fingerprint (the
    ``_capped_shingles`` discipline, r15): the signature table IS the
    LSH index every deployment persists — five callers re-derived it per
    call (a shingle scan + the k-column min groupBy each time).  A
    per-doc signature depends only on the doc's own shingles, so any
    doc-subset consumer (curation accepts, the ingest batch split) can
    filter this table instead of re-signing its slice — value-identical
    by construction."""
    from ._memo import memo_get, scratch_persist

    def compute():
        return {
            "path": scratch_persist(
                _minhash_signatures(_capped_shingles(spark, sf_dir)),
                "minhash_sigs",
            )
        }

    state = memo_get("minhash_sigs", sf_dir, ("documents",), compute)
    return spark.read.parquet(state["path"])


def _jaccard_verify_candidates(sh: DataFrame, candidates: DataFrame) -> DataFrame:
    """Candidate-only verification — the whole point of LSH.  Shingle
    sets are materialized ONLY for docs that appear in some candidate
    pair (semi-join against the candidate doc ids), then exact Jaccard
    is computed per candidate pair via array_intersect.  Verify cost is
    O(|candidates| * avg_shingles), never the full co-shingle self-join
    the brute-force ngram_jaccard_pairs path does.  ``candidates`` must
    be cached (it feeds three branches) and is small by LSH design —
    but its size scales with corpus duplication density, not with a
    domain, so the broadcasts are size-GATED — via AQE's runtime
    SMJ->broadcast conversion (``runtime_broadcast``): the candidate set
    sits above the LSH self-join barrier, so a limit-probe would
    re-execute that join once per gated call (the r10 bench measured
    2.1x on ``embedding_near_dup`` from exactly that); AQE instead reads
    the ACTUAL post-shuffle byte size and converts for free, and above
    its threshold the joins stay sort-merge instead of OOMing."""
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    doc_sets = (
        sh.join(runtime_broadcast(cand_docs), "doc_id")
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
        runtime_broadcast(candidates).join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / (F.col("na") + F.col("nb") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pipeline: banded signatures -> bucket join ->
    exact-Jaccard verification (>= 0.5).  Output: (doc_a, doc_b, jaccard).

    The verified pair set is memoized to a scratch parquet table per
    documents fingerprint (the ANN ground-truth discipline): SIX registry
    queries consume these pairs (this one, clusters, pagerank, triangles,
    the source matrix, keep-best/corpus-mix via the cluster labels), and
    each re-derivation is a full shingle+LSH job.  The artifact stays
    distributed — written and re-read as parquet, never collected — and
    it is deterministic (exact Jaccard over md5-derived signatures), so
    the replay is value-identical to the live derivation."""
    from ._memo import memo_get, scratch_persist

    def compute():
        sh = _capped_shingles(spark, sf_dir)
        sig = _minhash_sigs_src(spark, sf_dir)
        a = sig.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        b = sig.select(F.col("doc_id").alias("doc_b"), "band", "sig")
        # cache(): the candidate pair set (tiny — LSH's whole job is
        # keeping it small) feeds three downstream branches (the verify
        # join and both sides of cand_docs); without it the bucket
        # self-join re-executes per branch.
        candidates = (
            a.join(b, ["band", "sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .cache()
        )
        return {"path": scratch_persist(_jaccard_verify_candidates(sh, candidates), "minhash_pairs")}

    state = memo_get("minhash_verified_pairs", sf_dir, ("documents",), compute)
    return spark.read.parquet(state["path"])


#: Arriving-batch selector for the incremental-index proof: doc_id%5==0
#: plays the new batch; the rest are the already-indexed corpus.
INGEST_BATCH_MOD = 5


def minhash_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-arrival against a STORED MinHash-LSH index — the shape
    that makes near-dup dedup affordable at 100 TB: the corpus's banded
    signatures are a PERSISTED table built once (and appended to per
    batch), so ingesting a batch costs O(batch + matched buckets), never
    a corpus re-signature.

    Proof run: docs with doc_id % 5 == 0 play the arriving batch.
    Build stage (one-time, O(corpus)): signatures of the already-indexed
    docs land in a txlog table (atomic add-file commit).  Ingest stage:
    signatures for the BATCH ONLY are appended (replay-idempotent by
    batch id), then the batch's bands probe the stored index with one
    (band, sig) equi-join and candidates are verified with exact Jaccard
    (candidate-only, the shared LSH verify).  Output = the near-dup
    pairs DISCOVERED by this ingest: every verified pair with at least
    one side in the batch — exactly the full-corpus LSH result
    restricted to batch-touching pairs, which is what the oracle checks.

    The frequent-shingle stoplist is index METADATA (built with the
    index, maintained incrementally); this proof re-derives it in the
    build stage, never per ingest."""
    from ..storage import txlog
    from ..streaming.pipeline import _fresh_rollup_dir

    docs = load_table(spark, sf_dir, "documents")
    sh = _capped_shingles(spark, sf_dir)
    is_batch = F.col("doc_id") % INGEST_BATCH_MOD == 0
    # per-doc signatures are independent of corpus slicing, so both the
    # indexed corpus and the arriving batch filter the memoized signature
    # table instead of re-signing their slice (r15; value-identical)
    all_sigs = _minhash_sigs_src(spark, sf_dir)
    indexed_sigs = all_sigs.filter(~is_batch)
    batch_sigs = all_sigs.filter(is_batch).cache()

    index_dir = _fresh_rollup_dir("minhash_lsh_index")
    txlog.append_many_tx(
        spark, index_dir, [(indexed_sigs, 0), (batch_sigs, 1)]
    )
    index = txlog.read_table(spark, index_dir)

    candidates = (
        batch_sigs.select(F.col("doc_id").alias("probe_id"), "band", "sig")
        .join(
            index.select(F.col("doc_id").alias("hit_id"), "band", "sig"),
            ["band", "sig"],
        )
        .filter(F.col("probe_id") != F.col("hit_id"))
        .select(
            F.least("probe_id", "hit_id").alias("doc_a"),
            F.greatest("probe_id", "hit_id").alias("doc_b"),
        )
        .distinct()
        .cache()
    )
    return _jaccard_verify_candidates(sh, candidates)


#: Pseudo-benchmark selector for the fuzzy-decontamination proof: every
#: doc whose content hash % CONTAM_BENCH_MOD == 0 plays the held-out
#: benchmark; the rest are the training corpus.
CONTAM_BENCH_MOD = 7


def minhash_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark DECONTAMINATION (NEW r6): MinHash-LSH between a
    benchmark table and the training corpus — the GPT-3/Pile-style
    near-duplicate decontamination pass, where exact n-gram matching
    (``contamination_check``) misses lightly-edited benchmark leakage.

    Shape: banded signatures for BOTH sides off the shared shingle CTE;
    candidates from a bucket join of corpus sigs x benchmark sigs (the
    benchmark side is small — eval sets are thousands of docs, so its
    banded signature table broadcasts); exact-Jaccard verify on candidate
    pairs only.  Output: one row per contaminated corpus doc with its
    worst (max) benchmark overlap — the kill list a curation run feeds
    back into the keep set.  At 100 TB the corpus side stays
    shuffle-free: signatures are map-side, the bucket join probes a
    broadcast benchmark, and verification touches candidate docs only."""
    from ..functions.hashing import stable_hash64

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.pmod(stable_hash64(F.col("text")), F.lit(CONTAM_BENCH_MOD)) == 0
    sh = _capped_shingles(spark, sf_dir)
    bench_ids = docs.filter(is_bench).select("doc_id")
    sig = _minhash_sigs_src(spark, sf_dir)
    # the proof's pseudo-benchmark is a 1/7 corpus slice, i.e.
    # corpus-derived — a REAL eval set is domain-bounded, but the gate
    # keeps the proof honest at any sf
    bench_ids = broadcast_if_small(bench_ids)
    bench_sig = sig.join(bench_ids, "doc_id").select(
        F.col("doc_id").alias("bench_id"), "band", "sig"
    )
    corpus_sig = sig.join(bench_ids, "doc_id", "left_anti").select(
        F.col("doc_id").alias("corpus_id"), "band", "sig"
    )
    candidates = (
        corpus_sig.join(runtime_broadcast(bench_sig), ["band", "sig"])
        .select("corpus_id", "bench_id")
        .distinct()
        .cache()
    )
    cand_docs = (
        candidates.select(F.col("corpus_id").alias("doc_id"))
        .union(candidates.select(F.col("bench_id").alias("doc_id")))
        .distinct()
    )
    doc_sets = (
        sh.join(runtime_broadcast(cand_docs), "doc_id")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shingles"), F.count("*").alias("n"))
    )
    sa = doc_sets.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("shingles").alias("sha"),
        F.col("n").alias("na"),
    )
    sb = doc_sets.select(
        F.col("doc_id").alias("bench_id"),
        F.col("shingles").alias("shb"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb"))).cast("long")
    pairs = (
        runtime_broadcast(candidates)
        .join(sa, "corpus_id")
        .join(sb, "bench_id")
        .select(
            "corpus_id",
            "bench_id",
            (inter / (F.col("na") + F.col("nb") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    # Round-6-before-rank discipline (engine conventions): the max is over
    # a rational whose double repr both engines produce identically, so no
    # rounding is needed for the hash to match.
    return pairs.groupBy("corpus_id").agg(
        F.max("jaccard").alias("max_jaccard"),
        F.count("*").alias("n_bench_hits"),
    )


_CC_EDGES_PER_PARTITION = 2_000_000  # target edges per task in the CC loop
# Below this measured edge count the CC solves driver-side (union-find):
# ~100k edges is a few MB — far under any driver's memory — while the
# distributed loop's per-round scheduler cost would dominate.
CC_DRIVER_MAX_EDGES = 100_000


def union_find_labels(edges) -> list[tuple[int, int]]:
    """Path-compressed union-find over an iterable of (a, b) edges:
    returns (node, min-node-in-component) for every node seen.  The
    driver-side small-graph CC core shared by near_dup_clusters and
    media_phash_clusters — callers are responsible for only handing it
    driver-bounded edge sets (<= CC_DRIVER_MAX_EDGES)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-label roots for free
    return [(n, find(n)) for n in parent]


def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the verified near-dup pairs — the step a
    real dedup pipeline runs after pair generation, so each duplicate
    GROUP gets one representative (cluster_id = min doc_id in component).

    Hybrid execution, chosen on the MEASURED pair count: small graphs
    (<= CC_DRIVER_MAX_EDGES) solve driver-side with a path-compressed
    union-find; larger graphs run iterative min-label propagation on
    DataFrames: each round every node takes the min label among itself and
    its neighbors; converges in O(component diameter) rounds.  That loop is
    the small-star/large-star family (CC in MapReduce) in its simplest
    form, with two cost cuts per round:

    - **self-loops** in the (cached, symmetrized) edge set make
      "min over self and neighbors" a single equi-join + aggregate —
      no second join to fold the node's own label back in;
    - **sum-based convergence**: labels only ever decrease, so the label
      sum is strictly decreasing until the fixed point — one decimal-exact
      aggregate replaces the old/new join + inequality count.

    Everything is shuffle-partitioned by node; nothing driver-side except
    the one-row convergence aggregate.  Output: (doc_id, cluster_id) for
    every doc in at least one near-dup pair.
    """
    # Three registry queries consume this cluster assignment
    # (near_dup_clusters itself, dedup_keep_best, corpus_mix_report); when
    # the driver union-find path produced it, the label list is bounded by
    # CC_DRIVER_MAX_EDGES and memoizable — serving it from the driver memo
    # skips the whole MinHash-LSH job on the 2nd and 3rd call.  The
    # distributed path stays un-memoized (its result is corpus-sized).
    from ._memo import is_miss, memo_peek, memo_put

    memoized = memo_peek("near_dup_labels", sf_dir, ("documents",))
    if not is_miss(memoized):
        return spark.createDataFrame(memoized, "doc_id long, cluster_id long")
    # Materialize the (expensive) pair pipeline exactly once: the edge
    # frame references it three times (both directions + self-loops), and
    # un-cached union branches would re-run the whole MinHash-LSH plan per
    # branch.  count() populates the cache before the fan-out.  A pairs
    # memo hit (near_dup_pagerank shares the artifact) skips the MinHash
    # job entirely.
    memo_pairs = memo_peek("near_dup_pairs", sf_dir, ("documents",))
    if not is_miss(memo_pairs):
        pairs = spark.createDataFrame(memo_pairs, "doc_a long, doc_b long").cache()
    else:
        pairs = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b").cache()
    n_pairs = pairs.count()
    # Adaptive strategy (the AQE move, decided on the MEASURED edge count):
    # the near-dup graph is orders of magnitude smaller than the corpus,
    # and when it fits comfortably on the driver a union-find beats a
    # multi-round distributed loop by the whole scheduler overhead (each
    # distributed round is a join + agg + checkpoint + convergence job).
    # The bound is edges, not corpus size — a 100 TB corpus whose LSH pairs
    # exceed it takes the iterative path below unchanged.
    if n_pairs <= CC_DRIVER_MAX_EDGES:
        edge_rows = pairs.collect()  # bounded: <= CC_DRIVER_MAX_EDGES rows
        pairs.unpersist(blocking=False)
        memo_put(
            "near_dup_pairs",
            sf_dir,
            ("documents",),
            [(r["doc_a"], r["doc_b"]) for r in edge_rows],
        )
        labels_local = union_find_labels(
            (row["doc_a"], row["doc_b"]) for row in edge_rows
        )
        memo_put("near_dup_labels", sf_dir, ("documents",), labels_local)
        return spark.createDataFrame(labels_local, "doc_id long, cluster_id long")
    return _distributed_min_label(spark, pairs, n_pairs)


def _distributed_min_label(
    spark: SparkSession, pairs: DataFrame, n_pairs: int
) -> DataFrame:
    """The large-graph CC arm shared by ``near_dup_clusters`` and
    ``media_phash_clusters``: iterative min-label propagation over a
    cached (doc_a, doc_b) pair frame whose measured edge count exceeded
    ``CC_DRIVER_MAX_EDGES``.  Returns (doc_id, cluster_id); unpersists
    ``pairs`` once the labels are checkpointed."""
    # Size the iteration's partitioning from the measured edge count, not
    # the global shuffle default: the CC working set (near-dup pairs) is
    # orders of magnitude smaller than the corpus, and right-sizing here
    # is what keeps each round's task count proportional to the graph.
    n_parts = max(1, min(2048, (3 * n_pairs) // _CC_EDGES_PER_PARTITION + 1))
    nodes = (
        pairs.select(F.col("doc_a").alias("src"))
        .union(pairs.select("doc_b"))
        .distinct()
    )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .union(nodes.select("src", F.col("src").alias("dst")))
        .repartition(n_parts, "dst")
        .cache()
    )
    labels = nodes.select(
        F.col("src").alias("node"), F.col("src").alias("label")
    ).localCheckpoint()
    # Decimal sum: exact and overflow-free even when node ids and node
    # counts are both ~1e12 (long sums could wrap at 100 TB scale).
    _sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_sum).collect()[0][0]
    while True:
        # Cut lineage each round (localCheckpoint): without this the plan
        # doubles per iteration and the driver lives in the optimizer.
        labels = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(_sum).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # labels is checkpointed (materialized) — the pair/edge caches are dead
    # weight from here on; release them instead of letting them pin
    # executor memory until the next GC/clearCache.
    edges.unpersist(blocking=False)
    pairs.unpersist(blocking=False)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


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


# SimHash near-dup banding: 32 bits in 4 bands of 8.  Any pair within
# Hamming distance 3 differs in at most 3 bands, so by pigeonhole it agrees
# on at least one band — banded candidate generation is EXACT for the
# <= 3-bit threshold (no recall loss), and the band equi-join touches only
# same-byte pairs instead of all O(n^2).
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_HAMMING_MAX = SIMHASH_BANDS - 1


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-banded near-dup pairs (the pairing step the fingerprints
    exist for): band bucket join -> exact Hamming verify <= 3.

    Shuffle discipline: each row contributes 4 (band, byte) keys plus its
    64-bit fingerprint — constant bytes per doc ride the shuffle, never
    text.  Output: (doc_a, doc_b, hamming).

    The signature frame is localCheckpoint-ed before the self-join: the
    md5 fold (the expensive scan-stage work) runs ONCE instead of once per
    join side, and the checkpointed (doc_id, simhash) rows — 16 bytes/doc
    — are repartitioned across the cluster so the pairing stage gets full
    parallelism even when the source parquet has few splits.  The raw text
    column never rides an exchange (pinned by tests/test_plans.py)."""
    sigs = (
        simhash_fingerprints(spark, sf_dir)
        .localCheckpoint(eager=True)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    width = SIMHASH_BITS // SIMHASH_BANDS
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "val"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "val"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long")
    # Hamming verify BEFORE the dedup: hamming is a pure function of the
    # pair, so filtering first is equivalent — and the distinct's shuffle
    # then carries only true near-dups, not every band collision.
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .distinct()
    )


SUBSTR_NGRAM = 4  # exact-substring span width (words)


def _span_owner_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-substring ownership index — doc-distinct
    ``(doc_id, span, owner)`` rows where ``owner`` is the lowest doc_id
    carrying the 4-gram — memoized to a scratch parquet table per
    documents fingerprint (r15, the ``_capped_shingles`` discipline).
    This IS the suffix-array analog of Lee et al.'s exact-substring
    dedup re-expressed as a table: the flagging op aggregates it
    directly, and the scrub op recovers the pure ``(span, owner)`` map
    with a map-only ``doc_id == owner`` filter (every span's owner row
    is present by construction)."""
    from ._memo import memo_get, scratch_persist
    from .text import _word_ngrams  # local import avoids a module cycle

    def compute():
        docs = load_table(spark, sf_dir, "documents")
        words = F.split(F.col("text"), " ")
        spans = docs.select(
            "doc_id", F.explode(_word_ngrams(words, SUBSTR_NGRAM)).alias("span")
        ).distinct()
        owners = spans.groupBy("span").agg(F.min("doc_id").alias("owner"))
        return {
            "path": scratch_persist(spans.join(owners, "span"), "span_owner_index")
        }

    state = memo_get("span_owner_index", sf_dir, ("documents",), compute)
    return spark.read.parquet(state["path"])


def substring_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup at document granularity (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — public
    paper): a document is a substring-duplicate when any of its word
    4-gram spans also occurs in a LOWER-doc_id document; the lowest-id
    occurrence is the canonical copy that survives.  This is the
    keep-first exact-span policy (vs. the symmetric pair output of
    ngram_jaccard_pairs / minhash_near_dup).

    Shape: explode spans -> min(doc_id) per span (one shuffle, map-side
    combine — the suffix-array of the paper re-expressed as a hash
    aggregation, which is the shape that distributes) -> join spans back
    to owners -> per-doc aggregate.  Span state is O(distinct spans),
    sharded by the span key; no pairwise comparison anywhere, so cost is
    linear in corpus size at any scale.
    """
    return (
        _span_owner_src(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("owner") < F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans") > 0).alias("is_substring_dup"),
        )
    )


PAGERANK_ITERS = 3
PAGERANK_DAMPING = 0.85


def near_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the verified near-dup pair graph — the *weighted*
    iterative companion to ``near_dup_clusters``' min-label CC: rank mass
    concentrates on documents sitting at the center of duplicate families
    (useful as a keep-priority signal next to quality argmax).

    Fixed ``PAGERANK_ITERS`` rounds of the standard damped update; each
    round is one edge⋈rank equi-join plus one per-node aggregate — the
    degree table and rank table are node-sized (pair-graph nodes, orders
    of magnitude below corpus size), so at 100 TB the join shuffles the
    EDGE list only, partitioned by node, exactly like the CC loop.

    Cross-engine numerics: each contribution rank/deg is one IEEE
    division; contributions are cast to DECIMAL(25,12) before summing so
    the per-node fold is order-independent (dyadic doubles cannot tie at
    scale 12 — a tie needs exactly 13 binary fraction digits); the damped
    update is a fixed IEEE chain and the output is floor-truncated."""
    from ._memo import is_miss, memo_peek, memo_put

    # The verified pair list is the same driver-bounded artifact the CC
    # label memo guards (<= CC_DRIVER_MAX_EDGES rows when small): serve it
    # from the memo so this query doesn't re-run the MinHash-LSH pipeline
    # the session already paid for.  Oversized graphs skip the memo and
    # keep the fully distributed lineage.
    memoized = memo_peek("near_dup_pairs", sf_dir, ("documents",))
    if not is_miss(memoized):
        pairs = spark.createDataFrame(memoized, "doc_a long, doc_b long").cache()
    else:
        pairs = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b").cache()
        if pairs.count() <= CC_DRIVER_MAX_EDGES:
            memo_put(
                "near_dup_pairs",
                sf_dir,
                ("documents",),
                [(r["doc_a"], r["doc_b"]) for r in pairs.collect()],
            )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .cache()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = deg.select(F.col("src").alias("doc_id"), F.lit(1.0).alias("rank"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges.src == F.col("doc_id"))
            .select(
                F.col("dst"),
                (F.col("rank") / F.col("deg").cast("double")).alias("contrib"),
            )
        )
        ranks = contrib.groupBy("dst").agg(
            (
                F.lit(0.15)
                + F.lit(PAGERANK_DAMPING)
                * F.sum(F.col("contrib").cast("decimal(25,12)")).cast("double")
            ).alias("rank")
        ).select(F.col("dst").alias("doc_id"), "rank")
    pairs.unpersist(blocking=False)
    return ranks.select(
        "doc_id",
        (F.floor(F.col("rank") * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)).alias(
            "pagerank"
        ),
    )


def near_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the verified near-dup pair graph — the third
    graph-analytics primitive next to connected components and PageRank:
    per-document triangle participation, the local-clustering signal that
    separates tight duplicate CLIQUES (every pair verified) from loose
    chains (A~B~C where A~C missed the similarity bar).

    The canonical a<b<c enumeration: wedges from one self-join on the
    ordered edge list, closed by a second join probing the (a,c) edge —
    the standard distributed algorithm (node-order ensures each triangle
    counts exactly once).  At 100 TB the joins shuffle the EDGE list
    keyed by node; the dup graph's edges are corpus-sparse, and the
    heavy-hitter guard would be degree-based edge orientation (already
    ordered here).  Pairs ride the session memo the CC/PageRank queries
    share — no MinHash recomputation."""
    from ._memo import is_miss, memo_peek, memo_put

    memoized = memo_peek("near_dup_pairs", sf_dir, ("documents",))
    if not is_miss(memoized):
        pairs = spark.createDataFrame(memoized, "doc_a long, doc_b long").cache()
    else:
        pairs = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b").cache()
        if pairs.count() <= CC_DRIVER_MAX_EDGES:
            memo_put(
                "near_dup_pairs",
                sf_dir,
                ("documents",),
                [(r["doc_a"], r["doc_b"]) for r in pairs.collect()],
            )
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        e1.join(e2, e1.b == e2.b2)
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    members = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    out = members.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_triangles"))
    pairs.unpersist(blocking=False)
    return out


def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-novelty score per document: the share of a doc's distinct
    word-3-gram shingles that occur in NO other document (corpus document
    frequency == 1) — the diversity-side complement of the dedup battery
    (near-dup ops flag what is repeated; this scores what is unique,
    the signal LLM-curation mixes use to up-weight rare content).

    Score is exact integer ppm (``(unique * 1e6) div total``) — integer
    division, no float rounding to drift cross-engine.  Shape: the shared
    shingle kernel (frequency-capped, same as MinHash), one groupBy on
    the shingle key for document frequency, one join back on the same
    key (exchange reuse), one per-doc aggregate.  No pairwise anything —
    at 100 TB this costs two vocabulary-keyed shuffles."""
    sh = _capped_shingles(spark, sf_dir)
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("long").alias(
                "n_unique"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_unique",
        F.expr("(n_unique * CAST(1000000 AS BIGINT)) div n_shingles").alias(
            "novelty_ppm"
        ),
    )


def minhash_scurve_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-tuning artifact: for every CANDIDATE pair the banded join
    actually emitted, the signature-estimated similarity (matching
    components / k — an integer count) next to the theoretical
    collision probability 1 - (1 - s^r)^b of the engine's configured
    (b=4, r=3) family — the s-curve every MinHash deployment is tuned
    against, computed from the engine's own candidates rather than a
    textbook table.

    Exactness: component matches are integer equality counts; s is ONE
    division; the s-curve is a mirrored multiply chain (integer
    exponents — no pow()).  Candidates always share a full band, so
    match_count >= r by construction (pytest-pinned falsifiability).

    Scale shape: candidate-only work (the LSH discipline — never
    all-pairs); the k components ride the same one-shuffle groupBy as
    the signatures; the report is |k| rows."""
    sh = _capped_shingles(spark, sf_dir)
    minh = _minhash_columns(sh)
    sig = _minhash_sigs_src(spark, sf_dir)
    cand = (
        sig.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        .join(sig.select(F.col("doc_id").alias("doc_b"), "band", "sig"), ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = minh.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(MINHASH_K)],
    )
    b = minh.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(MINHASH_K)],
    )
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    pm = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(matches.cast("long").alias("match_count"))
    )
    g = pm.groupBy("match_count").agg(F.count("*").cast("long").alias("n_pairs"))
    s = F.col("match_count").cast("double") / F.lit(float(MINHASH_K))
    s3 = (s * s) * s  # s^r, r = 3
    q = F.lit(1.0) - s3
    prob = F.lit(1.0) - ((q * q) * (q * q))  # 1 - q^b, b = 4
    return g.select(
        "match_count",
        "n_pairs",
        F.round(s, 6).alias("est_jaccard"),
        F.round(prob, 6).alias("collision_prob"),
    )


def near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication matrix — the curation diagnostic
    that tells a data-mixing pipeline WHERE its duplication lives: a
    syndication cluster (the same article across N scrape sources) calls
    for cross-source dedup priority, while intra-source duplication
    points at a crawler revisiting itself.  One row per unordered source
    pair that shares at least one verified near-dup pair, with the pair
    count, the mean verified Jaccard, and the intra-source flag.

    Shape: rides the shared MinHash-LSH kernel (``minhash_near_dup``'s
    verified pairs — candidate-only cost), then two size-GATED broadcast
    joins to the doc->source dim (doc-keyed, i.e. corpus-sized — at
    100 TB it must NOT be hint-broadcast, so ``broadcast_if_small``
    measures before hinting) and a |sources|^2-bounded aggregate.  The mean
    sums DECIMAL(28,20)-quantized Jaccards (the power-sum discipline:
    quantized terms add associatively, so the result is partitioning-
    and engine-order-independent), then one mirrored division."""
    pairs = minhash_near_dup(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    tagged = (
        pairs.join(broadcast_if_small(sa), "doc_a")
        .join(broadcast_if_small(sb), "doc_b")
        .select(
            F.least("src_a", "src_b").alias("src_lo"),
            F.greatest("src_a", "src_b").alias("src_hi"),
            F.col("jaccard").cast("decimal(28,20)").alias("jq"),
        )
    )
    return (
        tagged.groupBy("src_lo", "src_hi")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(
                F.sum("jq").cast("double") / F.count("*").cast("double"), 6
            ).alias("mean_jaccard"),
        )
        .withColumn("is_intra_source", F.col("src_lo") == F.col("src_hi"))
    )


# --- LSH band auto-tuning -------------------------------------------------
# Every production MinHash deployment tunes (bands, rows) against a target
# Jaccard threshold; the operator below SELECTS the family instead of
# assuming one.  All (b, r) with b*r == MINHASH_K are candidates.
LSH_FAMILIES = [(b, MINHASH_K // b) for b in (1, 2, 3, 4, 6, 12)]
# Riemann grid resolution for the s-curve error integrals.
LSH_GRID_N = 200
# Default target threshold: the engine's verified-near-dup threshold.
LSH_TARGET_JACCARD = JACCARD_THRESHOLD


def _pow_chain(x: str, n: int) -> str:
    """x^n as a fixed square-and-multiply parenthesization — the portable
    integer-exponent discipline (never pow(): libm differs across
    engines; an identical multiply parse tree cannot)."""
    if n == 1:
        return x
    if n % 2 == 0:
        half = _pow_chain(x, n // 2)
        return f"({half} * {half})"
    return f"({_pow_chain(x, n - 1)} * {x})"


def _case_pow(x: str, var: str) -> str:
    """CASE dispatch over the family exponents, each arm a fixed multiply
    chain.  The SAME string is evaluated by Catalyst (F.expr) and DuckDB,
    so the parse trees — and therefore the IEEE results — are identical."""
    arms = " ".join(
        f"WHEN {var} = {n} THEN {_pow_chain(x, n)}"
        for n in sorted({r for _, r in LSH_FAMILIES})
    )
    return f"CASE {arms} END"


def lsh_band_autotune(
    spark: SparkSession, sf_dir: str, target: float = LSH_TARGET_JACCARD
) -> DataFrame:
    """Select the MinHash-LSH banding (b, r) for a target Jaccard
    threshold, and report every candidate family's theoretical error next
    to its MEASURED candidate yield on the corpus.

    For each family with b*r == MINHASH_K the collision s-curve is
    p(s) = 1 - (1 - s^r)^b.  The tuner scores families by the unweighted
    Riemann error integrals (the datasketch/LSH-textbook objective):
    fp_area = integral_{0..t} p(s) ds (false-positive mass below the
    threshold) and fn_area = integral_{t..1} (1 - p(s)) ds (false-negative
    mass above it); chosen = argmin(total_error, tiebreak smaller b).
    Next to the theory, n_candidates is the family's actual banded-join
    yield on the corpus — theory picks the family, the measured yield
    validates the pick against real signature mass.

    Exactness: the grid probabilities are mirrored multiply chains
    (integer exponents dispatched by ``_case_pow`` — the identical
    expression TEXT runs in both engines); each grid term is quantized to
    an exact integer (picoparts via the floor(x*1e12+0.5) chain — pure
    correctly-rounded IEEE ops, so quantized terms sum associatively and
    the integral is partitioning- and engine-order-independent); yields are exact integers; ``chosen`` is a
    rank over exact decimals.

    Scale shape: theory is a 6x200 domain-bounded literal grid (one
    broadcast cross join, no corpus involvement); the measured yield rides
    the shared shingle kernel, one doc-keyed groupBy for the components,
    then a banded equi self-join per family — candidate-only cost, the
    same LSH discipline as minhash_near_dup, summed over 6 families
    (sum(b) = 28 signature rows per doc).  Nothing all-pairs; at 100 TB
    the tuner costs ~7x one banded index build, still linear in the
    corpus.  Target behavior: the (b, r) knob every production MinHash
    pipeline hand-tunes (reference fixes its analytics in DDL; this is
    the data-curation analog, SURVEY §2 LLM-pipeline family).
    """
    # -- theoretical error integrals over the literal grid --
    fams = spark.createDataFrame(LSH_FAMILIES, "b INT, r INT")
    grid = spark.range(1, LSH_GRID_N + 1).select(
        (F.col("id").cast("double") / F.lit(float(LSH_GRID_N))).alias("s")
    )
    step = F.lit(1.0) / F.lit(float(LSH_GRID_N))
    tgt = F.lit(float(target))
    th = (
        fams.crossJoin(F.broadcast(grid))  # 6 x 200 literal rows
        .withColumn("sr", F.expr(_case_pow("s", "r")))
        .withColumn("q", F.lit(1.0) - F.col("sr"))
        .withColumn("qb", F.expr(_case_pow("q", "b")))
        .withColumn("p", F.lit(1.0) - F.col("qb"))
        # each grid term quantized to an exact INTEGER (picoparts, the
        # floor chain in pure IEEE doubles — identical bits in both
        # engines); a double->DECIMAL(_,20) cast would NOT be portable
        # (Spark converts via the exact binary expansion, DuckDB through
        # float multiplication — they disagree beyond ~15 digits)
        .withColumn(
            "fp_e12",
            F.when(
                F.col("s") <= tgt,
                F.floor(F.col("p") * step * F.lit(1.0e12) + F.lit(0.5)),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "fn_e12",
            F.when(
                F.col("s") > tgt,
                F.floor((F.lit(1.0) - F.col("p")) * step * F.lit(1.0e12) + F.lit(0.5)),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    theory = th.groupBy("b", "r").agg(
        F.sum("fp_e12").cast("long").alias("fp_e12"),
        F.sum("fn_e12").cast("long").alias("fn_e12"),
    )

    # -- measured candidate yield per family on the corpus --
    sh = _capped_shingles(spark, sf_dir)
    minh = _minhash_columns(sh)
    mharr = F.array(*[F.col(f"mh_{i}").cast("string") for i in range(MINHASH_K)])
    ks = spark.range(0, MINHASH_K).select(F.col("id").cast("int").alias("k"))
    sigs = (
        minh.select("doc_id", mharr.alias("mh"))
        .crossJoin(F.broadcast(fams))
        .crossJoin(F.broadcast(ks))
        .filter(F.col("k") < F.col("b"))
        .select(
            "doc_id",
            "b",
            "r",
            "k",
            F.concat_ws(
                ":",
                F.slice("mh", F.col("k") * F.col("r") + F.lit(1), F.col("r")),
            ).alias("sig"),
        )
    )
    left = sigs.select(F.col("doc_id").alias("doc_a"), "b", "r", "k", "sig")
    right = sigs.select(F.col("doc_id").alias("doc_b"), "b", "r", "k", "sig")
    cand = (
        left.join(right, ["b", "r", "k", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("b", "r", "doc_a", "doc_b")
        .distinct()
    )
    measured = cand.groupBy("b", "r").agg(
        F.count("*").cast("long").alias("n_candidates")
    )

    from pyspark.sql import Window

    w = Window.orderBy(F.col("tot_e12").asc(), F.col("b").asc())
    scale = F.lit(1.0e12)
    return (
        theory.join(measured, ["b", "r"], "left")
        .withColumn(
            "n_candidates", F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long")
        )
        # exact-integer picopart sums; the ranking and tiebreak run on
        # integers, the exposed areas are ONE mirrored division each
        .withColumn("tot_e12", F.col("fp_e12") + F.col("fn_e12"))
        # 6-row frame: the single-partition window is domain-bounded
        .withColumn("rk", F.row_number().over(w))
        .select(
            F.col("b").cast("long").alias("b"),
            F.col("r").cast("long").alias("r"),
            F.lit(float(target)).alias("target_jaccard"),
            (F.col("fp_e12").cast("double") / scale).alias("fp_area"),
            (F.col("fn_e12").cast("double") / scale).alias("fn_area"),
            (F.col("tot_e12").cast("double") / scale).alias("total_error"),
            "n_candidates",
            (F.col("rk") == 1).alias("chosen"),
        )
    )


#: Log-spaced dedup-threshold sweep grid — the production question is
#: "how much of the corpus is implicated if I dedup at tau", asked at
#: coarse low thresholds (aggressive dedup) through 0.9 (near-exact).
NEAR_DUP_SWEEP_THRESHOLDS = (0.01, 0.02, 0.05, 0.1, 0.2, 0.5, 0.9)


def near_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold sensitivity card: for each candidate Jaccard
    threshold, the number of co-shingle pairs at or above it, the number
    of documents implicated, and the implicated corpus fraction — the
    sweep a curation pipeline runs BEFORE committing to a dedup threshold
    (pick tau where the implicated-fraction curve elbows; the fixture
    spans 3,400 pairs at 0.01 down to 25 verified near-dups at 0.9).

    Exactness: pair/doc counts are exact integers off the exact-Jaccard
    frame (inter/union — one mirrored division; comparisons against the
    literal grid are identical doubles in both engines); the corpus
    fraction rides the floor(x*1e6+0.5)/1e6 chain.

    Scale shape: rides the frequency-capped co-shingle equi-join the
    engine already owns for exact Jaccard (never all-pairs; the cap
    bounds any shingle's pair contribution at cap^2), then |pairs| x 7
    bounded threshold rows — the sweep itself adds no corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _capped_shingles(spark, sf_dir)
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
    v = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .cache()  # feeds the pair-count and doc-count branches
    )
    ths = spark.createDataFrame(
        [(float(t),) for t in NEAR_DUP_SWEEP_THRESHOLDS], "threshold double"
    )
    hit = v.crossJoin(F.broadcast(ths)).filter(F.col("jaccard") >= F.col("threshold"))
    pair_counts = hit.groupBy("threshold").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    doc_counts = (
        hit.select(
            "threshold", F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        )
        .groupBy("threshold")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    )
    total = docs.agg(F.count("*").cast("long").alias("n_total"))
    frac = F.floor(
        F.col("n_docs").cast("double") / F.col("n_total").cast("double")
        * F.lit(1000000.0)
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    return (
        ths.join(pair_counts, "threshold", "left")
        .join(doc_counts, "threshold", "left")
        .crossJoin(F.broadcast(total))
        .withColumn("n_pairs", F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long"))
        .withColumn("n_docs", F.coalesce(F.col("n_docs"), F.lit(0)).cast("long"))
        .select("threshold", "n_pairs", "n_docs", frac.alias("doc_frac"))
    )


#: Audit-queue depth per jaccard band.
AUDIT_SAMPLE_K = 5


def dedup_audit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HUMAN-AUDIT queue for the near-dup pipeline (NEW
    r11) — the "label these pairs before trusting the threshold" sample
    every production dedup run schedules: per jaccard band, the
    AUDIT_SAMPLE_K candidate pairs with the lowest engine-portable
    pick-hash (an unbiased, reproducible draw — same queue on any
    engine, any run, any partitioning; a random() sample would be
    neither auditable nor oracle-checkable).

    Band edges are integer-exact comparisons (10*inter < union |
    2*inter < union | else), so no division decides membership; the
    reported jaccard is integer micros through the floor chain.  The
    fixture's co-shingle jaccard is BIMODAL (~0.0x and >=0.9 — the r10
    ledger note), so the middle band may legitimately be empty; the
    pytest pins the two live bands and the hash-rank determinism.

    Scale shape: candidate pairs come from the memoized capped-shingle
    kernel (banded equi-join, never all-pairs); the per-band top-K is
    a rank window over a 3-band partitioning."""
    from pyspark.sql import Window as _W

    from ..functions.hashing import stable_hash64

    sh = _capped_shingles(spark, sf_dir)
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
    un = (F.col("na") + F.col("nb") - F.col("inter")).cast("long")
    banded = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("n_shared"),
            un.alias("n_union"),
            F.when(10 * F.col("inter") < un, "lt_0.1")
            .when(2 * F.col("inter") < un, "lt_0.5")
            .otherwise("ge_0.5")
            .alias("band"),
            stable_hash64(
                F.concat_ws(
                    "|",
                    F.col("doc_a").cast("string"),
                    F.col("doc_b").cast("string"),
                )
            ).alias("pick_hash"),
        )
    )
    w = _W.partitionBy("band").orderBy("pick_hash", "doc_a", "doc_b")
    return (
        banded.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= AUDIT_SAMPLE_K)
        .select(
            "band",
            "rank",
            "doc_a",
            "doc_b",
            "n_shared",
            "n_union",
            F.floor(
                (2000000 * F.col("n_shared") + F.col("n_union")).cast("double")
                / (2 * F.col("n_union")).cast("double")
            ).cast("long").alias("jaccard_micros"),
        )
    )


def exact_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring SCRUB — the removal half of Lee et al. 2021
    (NEW r14): ``substring_dedup_docs`` FLAGS documents carrying
    cross-doc duplicated 4-gram spans; this op actually EXCISES those
    spans and reconstructs the surviving text, the C4-style cleaning
    pass a training-data pipeline runs before tokenization.  Policy
    mirrors the flagging op exactly: a span occurrence is removed iff
    its 4-gram also occurs in a LOWER-doc_id document (the lowest-id
    copy is canonical and keeps its text; within-doc repeats are NOT
    removed — that is ``repetition_score``'s signal, not dedup).

    Every word position covered by ANY duplicated span is dropped
    (overlapping spans union their cover), and the cleaned text is the
    uncovered words re-joined in order — so partially-boilerplate
    documents survive with their novel content intact instead of being
    dropped whole.

    Shape: positions and spans are posexplode projections; ownership is
    the same one min-doc_id hash aggregate as the flagging op (the
    suffix array re-expressed as hash aggregation — distributes
    linearly); cover expansion is a 4x bounded explode of DUP spans
    only; reconstruction is one per-doc sorted-struct collect.  All
    shuffles are keyed by span or doc_id — no pairwise anything."""
    from .text import _word_ngrams  # local import avoids a module cycle

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    toks = docs.select(
        "doc_id", F.posexplode(words).alias("pos", "word")
    )
    spans = docs.select(
        "doc_id",
        F.posexplode(_word_ngrams(words, SUBSTR_NGRAM)).alias("p0", "span"),
    )
    # (span -> owner) from the memoized ownership index: the owner's own
    # row has doc_id == owner, so this filter IS the distinct owner map
    owners = (
        _span_owner_src(spark, sf_dir)
        .filter(F.col("doc_id") == F.col("owner"))
        .select("span", "owner")
    )
    dup = (
        spans.join(owners, "span")
        .filter(F.col("owner") < F.col("doc_id"))
        .select("doc_id", "p0")
    )
    covered = dup.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("p0"), F.col("p0") + F.lit(SUBSTR_NGRAM - 1))
        ).alias("pos"),
    ).distinct()
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
        ).alias("cleaned_text"),
    )
    return (
        docs.select("doc_id", F.size(words).cast("long").alias("n_words"))
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
