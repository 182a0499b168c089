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
            early = min(orig, canary, key=lambda d: ARRIVAL_POS[d % 4])
            # PRECONDITION (fixture probe, pinned per ADVICE r13): the
            # EARLY member of every planted pair is itself INDEXED, not
            # organically quarantined against some other doc.  Only then
            # do the strong bounds below follow (flipped: hamming <= 3
            # against the pair; exact: hamming == 0).  If the early
            # member were quarantined at hamming h, the Hamming triangle
            # bounds the late member only by 3 + h (<= 10) and it could
            # legitimately be KEPT.  A failure HERE means the fixture
            # regenerated and the canary plant needs re-probing — it is
            # NOT a product bug.
            assert early in indexed, (
                "fixture precondition broke: canary early member "
                f"{early} (pair {orig}/{canary}) was organically "
                "quarantined; the recall bound no longer follows"
            )
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


def test_quality_calibration_laws(spark, queries):
    """Reliability-diagram laws at the leanest SF: >= 3 live bands with
    REAL pass-rate spread (the card is not a constant), per-band doc
    counts conserve the corpus, mean score sits inside its band's
    nominal range, and one band re-derives in pure Python."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.text import (
        gopher_quality_rules,
        quality_score,
    )

    rows = {r["band"]: r for r in queries["quality_score_calibration"](spark, SF_DIR).collect()}
    assert len(rows) >= 3
    rates = {r["gopher_pass_rate_micros"] for r in rows.values()}
    assert len(rates) >= 3  # real spread, not a constant card
    qs = {r["doc_id"]: r["quality_score"] for r in quality_score(spark, SF_DIR).collect()}
    gp = {
        r["doc_id"]: r["passes_gopher"]
        for r in gopher_quality_rules(spark, SF_DIR).collect()
    }
    assert sum(r["n_docs"] for r in rows.values()) == len(qs)
    import math

    band_docs = {}
    for d, s in qs.items():
        band_docs.setdefault(min(int(math.floor(s * 10)), 9), []).append(d)
    for b, r in rows.items():
        docs = band_docs[b]
        assert r["n_docs"] == len(docs)
        n_pass = sum(1 for d in docs if gp[d])
        assert r["gopher_pass_rate_micros"] == (2_000_000 * n_pass + len(docs)) // (
            2 * len(docs)
        )
        sm = sum(int(round(qs[d] * 1_000_000)) for d in docs)
        assert r["mean_score_micros"] == (2 * sm + len(docs)) // (2 * len(docs))


def test_semantic_ingest_lifecycle(spark, queries):
    """Embedding dedup-on-arrival invariants (the media-test siblings):
    ledger conservation per label; reasons split exact/semantic on
    cos_micros == 1e6 with every hit >= the SemDeDup threshold; every
    matched vector arrived strictly earlier and is indexed; quarantined
    vectors never entered the index; every planted exact-copy canary
    pair has its later-arriving member quarantined at cosine exactly
    1.0; a replayed batch id is a committed no-op."""
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import (
        load_table,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.storage import txlog
    from realtime_analytics_with_kafka_clickhouse_spark.streaming.pipeline import (
        SEMANTIC_INGEST_CANARY_MOD,
        SEMANTIC_INGEST_CANARY_OFFSET,
        stream_semantic_ingest,
    )

    ledger = queries["stream_semantic_ingest"](spark, SF_DIR).collect()
    for r in ledger:
        assert (
            r["n_arrived"]
            == r["n_kept"] + r["n_exact_quarantined"] + r["n_semantic_quarantined"]
        ), r
    assert sum(r["n_exact_quarantined"] for r in ledger) > 0
    assert sum(r["n_semantic_quarantined"] for r in ledger) > 0

    tables = stream_semantic_ingest.last_tables
    qt = txlog.read_table(spark, tables["quarantine"]).collect()
    indexed = {
        r["vec_id"]
        for r in txlog.read_table(spark, tables["sem_index"])
        .select("vec_id")
        .collect()
    }
    assert qt
    for r in qt:
        assert r["reason"] in ("exact", "semantic")
        assert (r["cos_micros"] == 1_000_000) == (r["reason"] == "exact")
        assert r["cos_micros"] >= 300_000  # the SemDeDup threshold
        assert (
            ARRIVAL_POS[r["matched_vec_id"] % 4] < ARRIVAL_POS[r["vec_id"] % 4]
        ), (r["vec_id"], r["matched_vec_id"])
        assert r["matched_vec_id"] in indexed
    quarantined = {r["vec_id"] for r in qt}
    assert not (quarantined & indexed)

    by_id = {r["vec_id"]: r for r in qt}
    vec_ids = {
        r["vec_id"]
        for r in load_table(spark, SF_DIR, "embeddings").select("vec_id").collect()
    }
    exact_seen = 0
    for orig in vec_ids:
        if orig % SEMANTIC_INGEST_CANARY_MOD != 0:
            continue
        canary = orig + SEMANTIC_INGEST_CANARY_OFFSET
        late = max(orig, canary, key=lambda d: ARRIVAL_POS[d % 4])
        early = min(orig, canary, key=lambda d: ARRIVAL_POS[d % 4])
        # the late member is ALWAYS quarantined: either its exact copy is
        # indexed (cos 1.0), or the early member was itself quarantined
        # against some indexed m with cos >= t — and cos(late, m) equals
        # cos(early, m) since the vectors are identical, so m catches the
        # late member too
        assert late in by_id, (orig, canary)
        if early in indexed:
            assert by_id[late]["cos_micros"] == 1_000_000, by_id[late]
            assert by_id[late]["matched_vec_id"] == early, by_id[late]
            exact_seen += 1
        else:
            assert early in by_id, (orig, canary)
    assert exact_seen > 0  # the cos-1.0 branch really fires

    v_before, _ = txlog.snapshot(spark, tables["quarantine"])
    probe = spark.createDataFrame(
        [(999_999, 1, "semantic", 1, 500_000)],
        "vec_id long, label int, reason string, matched_vec_id long, cos_micros long",
    )
    assert not txlog.append_tx(spark, tables["quarantine"], probe, batch_id=1)
    v_after, _ = txlog.snapshot(spark, tables["quarantine"])
    assert v_after == v_before


def test_quality_auc_matches_bruteforce(spark, queries):
    """AUC laws: the midrank aggregate equals the brute-force pairwise
    definition (P(score_pos > score_neg) + 0.5*P(tie)) recomputed in
    pure Python, and the score genuinely ranks (AUC well above 0.5)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.text import (
        gopher_quality_rules,
        quality_score,
    )

    row = queries["quality_score_auc"](spark, SF_DIR).collect()[0]
    qs = {r["doc_id"]: r["quality_score"] for r in quality_score(spark, SF_DIR).collect()}
    gp = {
        r["doc_id"]: r["passes_gopher"]
        for r in gopher_quality_rules(spark, SF_DIR).collect()
    }
    pos = [qs[d] for d in qs if gp[d]]
    neg = [qs[d] for d in qs if not gp[d]]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    # brute force in exact integers: AUC = (2*wins + ties) / (2*n1*n0)
    expect = (1_000_000 * (2 * wins + ties)) // (2 * len(pos) * len(neg))
    assert row["auc_micros"] == expect
    assert row["gini_micros"] == 2 * row["auc_micros"] - 1_000_000
    assert row["auc_micros"] > 600_000  # the score genuinely ranks
