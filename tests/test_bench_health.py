"""bench.py host-health gate (r14, judge directive #1).

Pure-python decision logic: a CPU-bound ingest canary landing >2x below
the committed clean-run history gets exactly one re-measure; if still
>2x below, the run is stamped health="throttled" so the official
BENCH_r{N}.json self-adjudicates host stalls instead of depending on
after-the-fact BENCH_NOTES forensics (three of four r13 bench runs were
stall-contaminated; the committed one carried a 5x-collapsed canary).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_healthy_run_no_remeasure():
    calls = []
    rate, health = resolve(100_000.0, 196_000.0, calls, retry_rate=0.0)
    assert health == "ok" and rate == 100_000.0
    assert calls == []  # above the 2x floor: no retry burned


def test_no_history_is_trivially_ok():
    calls = []
    rate, health = resolve(5.0, None, calls, retry_rate=0.0)
    assert health == "ok" and rate == 5.0 and calls == []


def test_transient_stall_recovers_on_retry():
    calls = []
    rate, health = resolve(38_000.0, 196_000.0, calls, retry_rate=190_000.0)
    assert health == "ok"
    assert rate == 190_000.0  # the recovered measurement is reported
    assert len(calls) == 1  # exactly one retry


def test_sustained_throttle_is_flagged():
    calls = []
    rate, health = resolve(38_000.0, 196_000.0, calls, retry_rate=40_000.0)
    assert health == "throttled"
    assert rate == 40_000.0  # best of the two honest measurements
    assert len(calls) == 1  # never more than one retry


def test_exactly_half_is_ok():
    # Boundary: rate == 0.5 * prior is NOT "< 0.5 * prior" — healthy.
    calls = []
    rate, health = resolve(98_000.0, 196_000.0, calls, retry_rate=0.0)
    assert health == "ok" and calls == []


def resolve(rate, prior, calls, retry_rate):
    def remeasure():
        calls.append(1)
        return retry_rate

    return bench.resolve_health(rate, prior, remeasure)


def test_prior_snapshot_resolves_highest_round():
    snap, path = bench.prior_snapshot()
    assert path is not None and os.path.basename(path).startswith(
        "BENCH_DETAIL_r"
    )
    # highest-round snapshot on disk wins
    import glob
    import re

    here = os.path.dirname(os.path.abspath(bench.__file__))
    rounds = [
        int(re.search(r"_r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(here, "BENCH_DETAIL_r*.json"))
        if re.search(r"_r(\d+)", os.path.basename(p))
    ]
    assert int(
        re.search(r"_r(\d+)", os.path.basename(path)).group(1)
    ) == max(rounds)
    with open(path) as f:
        assert snap == json.load(f)
    # the gate's history field is present in the committed snapshot
    assert snap.get("ingest_orders_per_sec", 0) > 0
