"""Round-6 edge and plan-regression tests.

Pins the round-6 scale fixes as plan facts:
- ngram_jaccard_pairs broadcasts the FREQUENT shingle set via left_anti
  (never the corpus-sized rare set);
- keyed-merge (Replacing/Collapsing/VersionedCollapsing) rewrites only the
  hash buckets present in a micro-batch, leaving other bucket dirs
  untouched on disk.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from realtime_analytics_with_kafka_clickhouse_spark.plans.inspect import formatted_plan

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_jaccard_anti_join_broadcasts_frequent_set(spark, queries):
    # The dropped (frequent, df > cap) set is bounded at shingle_rows/cap
    # members and is the ONLY safe broadcast side; the kept rare set is
    # vocabulary-sized.  Pin: the df-cap is applied as a broadcast
    # LeftAnti with the frequent set on the build side.  Since r10 the
    # kernel is memoized to scratch parquet, so the pin targets the LIVE
    # derivation (what the memo's compute() runs), and the consumer is
    # separately pinned to replay a plain scan — no shingle re-derivation.
    from realtime_analytics_with_kafka_clickhouse_spark.operators.dedup import (
        _doc_shingles,
        _frequent_shingles_removed,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    kernel = _frequent_shingles_removed(
        _doc_shingles(load_table(spark, SF_DIR, "documents"))
    )
    assert "BroadcastHashJoin LeftAnti BuildRight" in formatted_plan(kernel)
    plan = formatted_plan(queries["ngram_jaccard_pairs"](spark, SF_DIR))
    assert "LeftAnti" not in plan  # consumer replays the memoized scan


def test_keyed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The r6 scale fix for fact-keyed merges: a micro-batch touching one
    key must rewrite ONLY that key's hash bucket dir — every other bucket
    keeps its exact files and mtime (the analog of
    test_txlog_pruned_read_touches_one_dir)."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage import fs
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_replacing,
    )

    table = f"{tmp_path}/replacing_buckets"
    base = spark.createDataFrame(
        [(k, 0, f"s{k}") for k in range(64)], "k long, version long, s string"
    )
    merge_replacing(spark, table, base, key="k", version="version")
    dirs = [c for c in fs.list_dir(spark, table) if c.startswith("bucket=")]
    assert len(dirs) > 1  # 64 keys spread over several buckets
    before = {
        d: (fs.list_dir(spark, f"{table}/{d}"), fs.mtime_ms(spark, f"{table}/{d}"))
        for d in dirs
    }

    single = spark.createDataFrame([(7, 1, "UPD")], "k long, version long, s string")
    merge_replacing(spark, table, single, key="k", version="version")

    after = {
        d: (fs.list_dir(spark, f"{table}/{d}"), fs.mtime_ms(spark, f"{table}/{d}"))
        for d in dirs
    }
    changed = [d for d in dirs if before[d] != after[d]]
    assert len(changed) == 1, f"exactly one bucket rewritten, got {changed}"

    rows = {r["k"]: (r["version"], r["s"]) for r in spark.read.parquet(table).collect()}
    assert rows[7] == (1, "UPD") and rows[0] == (0, "s0") and len(rows) == 64


def test_keyed_merge_replay_skips_merged_buckets(spark, tmp_path):
    """Per-bucket replay idempotence: replaying a batch_id already merged
    into a bucket leaves the bucket untouched (marker gate), and a merge
    whose every touched bucket is up to date reports False."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_collapsing,
    )

    table = f"{tmp_path}/collapsing_replay"
    b0 = spark.createDataFrame([(k, 1) for k in range(16)], "k long, sign long")
    assert merge_collapsing(spark, table, b0, keys=["k"], batch_id=0)
    # Replay of batch 0: every bucket's marker is already at 0 -> no-op.
    assert not merge_collapsing(spark, table, b0, keys=["k"], batch_id=0)
    got = {(r["k"], r["sign"]) for r in spark.read.parquet(table).select("k", "sign").collect()}
    assert got == {(k, 1) for k in range(16)}  # replay did NOT double-count
    # A later batch with new ids merges normally.
    b1 = spark.createDataFrame([(3, -1)], "k long, sign long")
    assert merge_collapsing(spark, table, b1, keys=["k"], batch_id=1)
    got = {(r["k"], r["sign"]) for r in spark.read.parquet(table).select("k", "sign").collect()}
    assert got == {(k, 1) for k in range(16) if k != 3}  # k=3 annihilated


def test_compact_ranged_keeps_null_keys_and_rejects_all_null(spark, tmp_path):
    """ADVICE r5: range predicates evaluate NULL to false, so rows with a
    NULL split_col used to vanish from the rewritten snapshot.  They must
    ride in the first bucket; an entirely-NULL column raises instead of
    writing an empty table."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog

    table = str(tmp_path / "null_ranged")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    for i in range(2):
        assert txlog.append_tx(
            spark, table, df.filter(F.col("k") % 2 == i), batch_id=i
        )
    assert txlog.compact_tx_ranged(spark, table, "v", n_buckets=4)
    after = txlog.read_table(spark, table)
    assert after.count() == 100  # the 10 NULL-v rows survived OPTIMIZE
    assert after.filter(F.col("v").isNull()).count() == 10

    all_null = str(tmp_path / "all_null")
    nn = spark.range(10).select(F.col("id").alias("k"), F.lit(None).cast("long").alias("v"))
    assert txlog.append_tx(spark, all_null, nn, batch_id=0)
    assert txlog.append_tx(spark, all_null, nn, batch_id=1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="entirely NULL"):
        txlog.compact_tx_ranged(spark, all_null, "v", n_buckets=2)


def test_compact_ranged_preserves_blooms_and_foreign_zone_maps(spark, tmp_path):
    """ADVICE r5: OPTIMIZE used to drop per-dir blooms and any zone maps
    beyond split_col, silently widening later probes' scan sets.  The
    rewritten commit must carry blooms for every previously-bloomed
    column and zone maps for every previously-mapped column."""
    import hashlib

    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog

    table = str(tmp_path / "meta_ranged")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("u"),
        (F.col("id") * 2).alias("t"),
    )
    for i in range(3):
        assert txlog.append_tx(
            spark,
            table,
            df.filter(F.col("k") % 3 == i),
            batch_id=i,
            stats_cols=["t"],
            bloom_cols=["u"],
        )
    assert txlog.compact_tx_ranged(spark, table, "k", n_buckets=2)
    commit = txlog.read_commit(spark, table, txlog.latest_version(spark, table))
    for d in commit["dirs"]:
        assert "u" in commit["blooms"].get(d, {}), "bloom must survive OPTIMIZE"
        assert {"k", "t"} <= set(commit["stats"].get(d, {})), "zone maps must survive"
    # And the surviving bloom still serves an equality probe correctly.
    hashed = int(hashlib.md5(b"3").hexdigest()[:15], 16)
    pruned = txlog.read_table(spark, table, prune_eq={"u": hashed})
    got = pruned.filter(F.col("u") == 3).count()
    assert got == df.filter(F.col("u") == 3).count()


def _tiny_png() -> bytes:
    """A hand-built 2x2 grayscale PNG (pure stdlib — no imaging libs):
    pixels [[0, 64], [128, 255]]."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2, 8-bit gray
    raw = b"\x00" + bytes([0, 64]) + b"\x00" + bytes([128, 255])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_pil_branch_on_generated_png():
    """r5 verdict #6: the real-decoder seam.  Skips where Pillow is absent
    (this sandbox); where present, the PIL branch must decode a real PNG's
    PIXELS (not its compressed bytes) through the same feature fold."""
    pytest.importorskip("PIL")
    from realtime_analytics_with_kafka_clickhouse_spark.operators.multimodal import (
        _decode_pil,
    )

    png = _tiny_png()
    n_bytes, checksum, hist = _decode_pil(png)
    assert n_bytes == len(png)
    assert sum(hist) == 4  # 4 pixels, not len(png) bytes
    assert hist[0] == 1 and hist[2] == 1 and hist[4] == 1 and hist[7] == 1


def test_decode_stub_remains_default_registry_path(spark):
    """Zero oracle changes: the registry's decode_features still rides the
    stub (byte-level fold over the payload), so its histogram sums to the
    payload length."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.multimodal import (
        _decode_pil,
        _decode_stub,
        decode_features,
    )

    df = decode_features(spark, SF_DIR).limit(5)
    rows = df.collect()
    for r in rows:
        assert sum(r[f"hist_{i}"] for i in range(8)) == r["n_bytes"]
    # And the PIL branch raises cleanly where Pillow is missing, instead
    # of silently falling back (callers must choose their decoder).
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ModuleNotFoundError):
            _decode_pil(b"\x89PNG not really")
    assert decode_features.__defaults__[0] is _decode_stub


def test_python_datasource_partitions_and_plan(spark):
    """The Python DataSource must parallelize: the declared partition
    list becomes the scan's partitioning (8 partitions, no driver-side
    generation), and the proof query's aggregate rides a normal
    partial-agg shuffle on top."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources.pydatasource import (
        LEDGER_PARTS,
        LEDGER_ROWS,
        register_ledger_source,
    )

    register_ledger_source(spark)
    df = (
        spark.read.format("graft_ledger")
        .option("n", str(LEDGER_ROWS))
        .option("parts", str(LEDGER_PARTS))
        .load()
    )
    assert df.rdd.getNumPartitions() == LEDGER_PARTS
    assert df.count() == LEDGER_ROWS


def test_statestore_reader_exposes_partitioned_state(spark):
    """The state read is partition-parallel (one row group per state
    store partition) and carries the partition_id column — the audit
    surface, not a driver dump."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        statestore_inspect,
    )

    df = statestore_inspect(spark, SF_DIR)
    assert set(df.columns) == {"user_id", "n_events", "id_sum"}
    assert df.count() > 0


def test_recursive_ladder_depth_is_data_dependent(spark):
    """Each priority's ladder bottoms out below 2.0 — depth derives from
    the starting amount (the thing a static sequence() axis can't do)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e

    df = e.queries()["recursive_decay_ladder"](spark, SF_DIR)
    last = df.groupBy("priority").agg(
        F.max("step").alias("max_step"), F.min("amount").alias("min_amount")
    )
    for r in last.collect():
        assert r["max_step"] > 10  # real recursion depth, not a toy unroll
        assert 1.0 <= r["min_amount"] < 2.0  # terminated exactly at the predicate


def test_variant_rollup_prunes_scan_to_two_columns(spark, queries):
    """parse_json(props) must not widen the scan: only props + value are
    read (6-column table pruned to 2)."""
    from realtime_analytics_with_kafka_clickhouse_spark.plans.inspect import (
        read_schema_columns,
    )

    df = queries["variant_props_rollup"](spark, SF_DIR)
    (cols,) = read_schema_columns(df)
    assert cols == {"props", "value"}


def test_orc_roundtrip_pushes_filter_into_orc_scan(spark, queries):
    """The value > 0 predicate must reach the ORC reader (format-native
    pushdown, not a post-scan filter only)."""
    from realtime_analytics_with_kafka_clickhouse_spark.plans.inspect import (
        formatted_plan,
    )

    df = queries["orc_roundtrip_stats"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,0.0)]" in plan


def test_keyed_merge_full_annihilation_leaves_readable_empty_table(spark, tmp_path):
    """Hypothesis-found regression (rows=[(0,1),(0,-1)] over 3 epochs):
    when every key in every bucket annihilates, the table must stay
    READABLE as an empty frame with the right schema — the bucketed
    layout may not delete its last schema-bearing file."""
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_collapsing,
    )

    table = f"{tmp_path}/annihilate"
    plus = spark.createDataFrame([(0, 1)], "k long, sign long")
    minus = spark.createDataFrame([(0, -1)], "k long, sign long")
    empty = plus.limit(0)
    assert merge_collapsing(spark, table, plus, keys=["k"])
    assert merge_collapsing(spark, table, minus, keys=["k"])  # annihilates key 0
    merge_collapsing(spark, table, empty, keys=["k"])  # empty trailing epoch
    got = spark.read.parquet(table)
    assert got.count() == 0
    assert {"k", "sign"} <= set(got.columns)


def test_dynamic_backfill_rewrites_only_corrected_months(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an INSERT OVERWRITE carrying two
    months must replace exactly those month dirs — static mode would
    truncate the table, per-partition delete+append loses atomicity."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.normalize import (
        with_partition_month,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
    from realtime_analytics_with_kafka_clickhouse_spark.storage import fs
    from realtime_analytics_with_kafka_clickhouse_spark.storage.layout import (
        write_orders_table,
    )

    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderdate").alias("order_timestamp"),
        F.col("o_totalprice").alias("total_amount"),
    )
    table = f"{tmp_path}/orders_bf"
    write_orders_table(orders, table)
    dirs = [d for d in fs.list_dir(spark, table) if d.startswith("order_month=")]
    assert len(dirs) > 3
    target = sorted(dirs)[:2]
    before = {
        d: (fs.list_dir(spark, f"{table}/{d}"), fs.mtime_ms(spark, f"{table}/{d}"))
        for d in dirs
    }
    months = [int(d.split("=")[1]) for d in target]
    corrected = (
        with_partition_month(orders)
        .filter(F.col("order_month").isin(months))
        .drop("order_month")
        .withColumn("total_amount", F.col("total_amount") * 2)
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_orders_table(corrected, table, mode="overwrite")
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    after = {
        d: (fs.list_dir(spark, f"{table}/{d}"), fs.mtime_ms(spark, f"{table}/{d}"))
        for d in dirs
    }
    changed = sorted(d for d in dirs if before[d] != after[d])
    assert changed == target, f"only the corrected months may change: {changed}"
    n_before = orders.count()
    assert spark.read.parquet(table).count() == n_before  # no truncation


def test_ivf_persisted_index_prunes_cell_dirs(spark):
    """The persisted IVF index serves probes through zone-map-pruned
    reads: a single-cell probe must list fewer directories than the full
    4-chunk index."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        _build_ivf_index_table,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog

    table = _build_ivf_index_table(spark, SF_DIR)
    full = txlog.read_table(spark, table)
    pruned = txlog.read_table(spark, table, prune={"cluster": (0, 0)})
    full_dirs = {f.rsplit("/", 2)[-2] for f in full.inputFiles()}
    pruned_dirs = {f.rsplit("/", 2)[-2] for f in pruned.inputFiles()}
    assert len(full_dirs) == 4 and len(pruned_dirs) < 4
    # and the pruned scan still holds every cell-0 vector
    assert (
        pruned.filter(F.col("cluster") == 0).count()
        == full.filter(F.col("cluster") == 0).count()
    )


def test_bucket_swap_crash_states_recover(spark, tmp_path):
    """Per-bucket crash repair, all three windows of the HIDDEN-swap
    protocol: (a) a .bucket=i.swap-* orphan whose target vanished
    mid-swap is promoted; (b) one whose target survived (swap never
    began) is dropped; (c) a partial .stage-* dir is invisible to
    readers and swept.  Mid-crash, a reader sees either the old bucket
    or no bucket — never stale/duplicate rows (the reason swap names are
    dot-prefixed: a visible bucket=i.swap-* would match the partition
    pattern and leak)."""
    from realtime_analytics_with_kafka_clickhouse_spark.storage import fs
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        merge_replacing,
    )

    table = f"{tmp_path}/crashy"
    base = spark.createDataFrame(
        [(k, 0, f"s{k}") for k in range(32)], "k long, version long, s string"
    )
    merge_replacing(spark, table, base, key="k", version="version")
    dirs = sorted(d for d in fs.list_dir(spark, table) if d.startswith("bucket="))
    victim, stale_host = dirs[0], dirs[1]

    # (a) crash between delete and rename: target gone, hidden swap holds data
    fs.rename(spark, f"{table}/{victim}", f"{table}/.{victim}.swap-crashed")
    # (b) hidden swap next to an intact target (crash before the delete)
    fs.write_text(spark, f"{table}/.{stale_host}.swap-stale/_marker", "junk")
    # (c) partial stage from a crashed writer
    fs.write_text(spark, f"{table}/.stage-dead/bucket=0/_marker", "junk")

    # Mid-crash reader: old buckets minus the in-flight one; NO stale or
    # duplicate rows from hidden dirs.
    n_before = spark.read.parquet(table).count()
    assert n_before < 32

    upd = spark.createDataFrame([(5, 1, "UPD")], "k long, version long, s string")
    merge_replacing(spark, table, upd, key="k", version="version")

    assert not fs.exists(spark, f"{table}/.{victim}.swap-crashed")  # promoted
    assert not fs.exists(spark, f"{table}/.{stale_host}.swap-stale")  # swept
    assert not fs.exists(spark, f"{table}/.stage-dead")  # swept
    rows = {r["k"]: (r["version"], r["s"]) for r in spark.read.parquet(table).collect()}
    assert len(rows) == 32 and rows[5] == (1, "UPD") and rows[0] == (0, "s0")


def test_ivf_incremental_appends_then_ranged_optimize_restores_pruning(
    spark, tmp_path
):
    """Index freshness lifecycle: INCREMENTAL appends of new vectors are
    cell-UNSORTED (each append's cluster zone map spans everything, so a
    cell probe stops pruning), and the fix is the storage layer's own
    ranged OPTIMIZE on `cluster` — after compaction the same probe lists
    strictly fewer directories again and the answer set is unchanged."""
    from pyspark.sql import functions as F

    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        _kmeans_fit,
        _with_ranked_cells,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table
    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    assigned = _with_ranked_cells(emb, _kmeans_fit(spark, SF_DIR)).select(
        "vec_id", F.element_at("ranked", 1)["c"].alias("cluster"), "embedding"
    )
    table = f"{tmp_path}/ivf_inc"
    # 4 incremental appends chunked by ARRIVAL (vec_id), not by cell.
    for i in range(4):
        txlog.append_tx(
            spark,
            table,
            assigned.filter(F.pmod(F.col("vec_id"), F.lit(4)) == i),
            batch_id=i,
            stats_cols=["cluster"],
        )
    probe = txlog.read_table(spark, table, prune={"cluster": (0, 0)})
    n_dirs_before = len({f.rsplit("/", 2)[-2] for f in probe.inputFiles()})
    assert n_dirs_before == 4  # arrival-ordered appends: nothing prunes
    want = probe.filter(F.col("cluster") == 0).count()

    assert txlog.compact_tx_ranged(spark, table, "cluster", n_buckets=4)
    probe2 = txlog.read_table(spark, table, prune={"cluster": (0, 0)})
    n_dirs_after = len({f.rsplit("/", 2)[-2] for f in probe2.inputFiles()})
    assert n_dirs_after < 4, "ranged OPTIMIZE must restore cell pruning"
    assert probe2.filter(F.col("cluster") == 0).count() == want


def test_query_broadcast_ann_pushes_corpus_filter_and_prunes(spark, queries):
    """The corpus predicate must reach the parquet scan (filtered ANN
    pre-vector-math) and the scan must read only vec_id/embedding/label."""
    from realtime_analytics_with_kafka_clickhouse_spark.plans.inspect import (
        formatted_plan,
    )

    df = queries["ann_query_broadcast_topk"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(label), Not(EqualTo(label,0))]" in plan
