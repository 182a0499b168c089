"""Round-13 additions: the media near-dup-on-arrival lifecycle
(stream_media_ingest) — quarantine invariants, planted-canary recall,
batch-id replay no-ops, and the map-only hashing plan pin."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_DIR

ARRIVAL_POS = {2: 0, 0: 1, 3: 2, 1: 3}  # epoch (doc_id % 4) -> arrival order


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_media_ingest_lifecycle(spark, queries):
    """The media arrival-lifecycle invariants, read off the proof
    tables: (1) the ledger conserves arrivals (kept + exact + near_dup
    per format); (2) reasons split exact/near_dup on hamming == 0 with
    hamming <= 7 everywhere; (3) every hit's matched media ARRIVED in a
    strictly earlier epoch and is itself indexed; (4) no quarantined
    media entered the index; (5) every planted canary pair — Hamming-3
    AND exact-copy — has exactly its later-arriving member quarantined
    (positive recall evidence, not 0 == 0); (6) an at-least-once replay
    of a committed quarantine or index batch id is a committed no-op."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.multimodal import (
        MEDIA_INGEST_CANARY_OFFSET,
        MEDIA_INGEST_EXACT_OFFSET,
        MEDIA_INGEST_EXACT_RESIDUE,
        PHASH64_CANARY_MOD,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        stream_media_ingest,
    )

    ledger = queries["stream_media_ingest"](spark, SF_DIR).collect()
    for r in ledger:  # (1) conservation per format
        assert (
            r["n_arrived"]
            == r["n_kept"] + r["n_exact_quarantined"] + r["n_near_dup_quarantined"]
        ), r
    assert sum(r["n_near_dup_quarantined"] for r in ledger) > 0
    assert sum(r["n_exact_quarantined"] for r in ledger) > 0

    tables = stream_media_ingest.last_tables
    qt = txlog.read_table(spark, tables["quarantine"]).collect()
    indexed = {
        r["doc_id"]
        for r in txlog.read_table(spark, tables["hamming_index"])
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert qt
    for r in qt:  # (2) + (3)
        assert r["reason"] in ("exact", "near_dup")
        assert (r["hamming"] == 0) == (r["reason"] == "exact")
        assert 0 <= r["hamming"] <= 7
        assert (
            ARRIVAL_POS[r["matched_doc_id"] % 4] < ARRIVAL_POS[r["doc_id"] % 4]
        ), (r["doc_id"], r["matched_doc_id"])
        assert r["matched_doc_id"] in indexed
    quarantined = {r["doc_id"] for r in qt}
    assert not (quarantined & indexed)  # (4)

    # (5) canary recall: the later-arriving member of every planted pair
    # must be quarantined (hamming 3 for the flipped cohort, 0 for the
    # exact cohort) — whichever member the arrival order delays
    doc_ids = {
        r["doc_id"] for r in load_table(spark, SF_DIR, "documents").select("doc_id").collect()
    }
    by_id = {r["doc_id"]: r for r in qt}
    for orig in doc_ids:
        for residue, offset, expect_h in (
            (0, MEDIA_INGEST_CANARY_OFFSET, 3),
            (MEDIA_INGEST_EXACT_RESIDUE, MEDIA_INGEST_EXACT_OFFSET, 0),
        ):
            if orig % PHASH64_CANARY_MOD != residue:
                continue
            canary = orig + offset
            late = max(orig, canary, key=lambda d: ARRIVAL_POS[d % 4])
            assert late in by_id, (orig, canary)
            assert by_id[late]["hamming"] <= expect_h, by_id[late]
            # the flipped cohort is a >= Hamming-3 neighbor of ITS pair;
            # an even closer organic match may win the min-key pick, so
            # pin <= (exact cohort: 0 == 0 exactly)

    # (6) replays: a committed batch id refuses and changes nothing
    v_before, _ = txlog.snapshot(spark, tables["quarantine"])
    probe = spark.createDataFrame(
        [(999_999, "png", "near_dup", 1, 3)],
        "doc_id long, format string, reason string, matched_doc_id long, hamming long",
    )
    assert not txlog.append_tx(spark, tables["quarantine"], probe, batch_id=1)
    v_after, _ = txlog.snapshot(spark, tables["quarantine"])
    assert v_after == v_before
    i_before, _ = txlog.snapshot(spark, tables["hamming_index"])
    iprobe = spark.createDataFrame(
        [(999_999, 0, 0, 0)], "doc_id long, phash64 long, band int, val long"
    )
    assert not txlog.append_tx(spark, tables["hamming_index"], iprobe, batch_id=0)
    i_after, _ = txlog.snapshot(spark, tables["hamming_index"])
    assert i_after == i_before


def test_media_hashing_pass_is_map_only(spark):
    """Scale pin: the binary payload never rides an exchange — the
    fingerprint pass (media table scan -> Arrow-batched mapInPandas) has
    ZERO Exchange nodes; everything downstream of it carries only
    (doc_id, phash64)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.multimodal import (
        media_phash64,
    )

    df = media_phash64(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Exchange" not in plan, plan


def test_t_closeness_invariants(spark, queries):
    """TV-distance laws at the leanest SF: micros within [0, 1e6];
    sampling noise at sf0.001 puts EVERY nation above t = 0.05 (the
    probed one-branch SF — both branches fire at sf0.01/sf0.1, covered
    by the oracle sweep); one nation's TV re-derived in pure Python."""
    from collections import defaultdict

    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    rows = queries["t_closeness_report"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["tv_micros"] <= 1_000_000
        assert r["t_close"] is False  # sf0.001: all-violating (probed)
        assert 1 <= r["n_segments_present"] <= 5
    cust = load_table(spark, SF_DIR, "customer").collect()
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, SF_DIR, "nation").collect()
    }
    cell = defaultdict(int)
    for c in cust:
        cell[(nation[c["c_nationkey"]], c["c_mktsegment"])] += 1
    target = rows[0]["nation"]
    nc = sum(v for (n, _), v in cell.items() if n == target)
    ng = sum(cell.values())
    segs = {s for (_, s) in cell}
    num = sum(
        abs(cell.get((target, s), 0) * ng
            - sum(v for (n2, s2), v in cell.items() if s2 == s) * nc)
        for s in segs
    )
    assert rows[0]["tv_micros"] == (1_000_000 * num) // (2 * nc * ng)
    assert rows[0]["group_size"] == nc


def test_encoding_battery_laws(spark, queries):
    """Codec laws: every round-trip holds, hex is uppercase hex of the
    8-char head, bin re-parses to the doc id, and the first code point
    matches Python's ord() on a sampled doc."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )

    rows = queries["encoding_functions_battery"](spark, SF_DIR).collect()
    assert rows
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    import base64 as b64mod

    for r in rows[:50]:
        t = texts[r["doc_id"]]
        assert r["b64_roundtrip_ok"] is True
        assert r["b64_head"] == b64mod.b64encode(t[:24].encode()).decode()
        assert r["hex_head"] == t[:8].encode().hex().upper()
        assert int(r["doc_id_bin"], 2) == r["doc_id"]
        assert r["first_code_point"] == ord(t[0])


def test_encoding_battery_map_only(spark, queries):
    """Scale pin: the codec battery is map-only — zero exchanges."""
    df = queries["encoding_functions_battery"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Exchange" not in plan, plan
