"""Semantics pins for the r8-late statistical battery (beyond DuckDB parity).

- KS: D vs a pure-Python ECDF sup recompute (one-vs-rest), plus the
  attained-at value; bounds 0 <= D <= 1.
- simpleLinearRegression: slope/intercept/r^2 vs numpy least squares on
  the same daily points; r^2 in [0, 1].
- skewPop/kurtPop: vs a pure-Python central-moment recompute.
- cramersV: chi2 vs a direct contingency recompute; V and the
  bias-corrected V in [0, 1]; partition-count invariance pins the
  ordered fold's merge-order independence.
"""

from __future__ import annotations

from tests.conftest import SF_DIR as SF_DIR_SMALL


def _event_values(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF_DIR_SMALL, "events")
        .select("event_type", "value", "user_id", "ts")
        .collect()
    )
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    return rows, by_type


def test_ks_statistic_matches_ecdf_recompute(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        ks_test_statistic,
    )

    got = {r["event_type"]: r for r in ks_test_statistic(spark, SF_DIR_SMALL).collect()}
    rows, by_type = _event_values(spark)
    grid = sorted({r["value"] for r in rows})
    n_total = len(rows)
    for et, sample in by_type.items():
        rest = [r["value"] for r in rows if r["event_type"] != et]
        n1, n2 = len(sample), len(rest)
        s_sorted, r_sorted = sorted(sample), sorted(rest)
        import bisect

        best, best_at = -1.0, None
        for v in grid:
            f1 = bisect.bisect_right(s_sorted, v) / n1
            f2 = bisect.bisect_right(r_sorted, v) / n2
            gap = abs(f1 - f2)
            if gap > best + 1e-15:
                best, best_at = gap, v
        g = got[et]
        assert g["n_sample"] == n1 and g["n_rest"] == n2 == n_total - n1
        assert 0.0 <= g["d_stat"] <= 1.0
        assert abs(g["d_stat"] - best) < 1e-6, (et, g["d_stat"], best)
        # the reported sup location must attain the sup
        f1 = bisect.bisect_right(s_sorted, g["d_at_value"]) / n1
        f2 = bisect.bisect_right(r_sorted, g["d_at_value"]) / n2
        assert abs(abs(f1 - f2) - best) < 1e-9
        import math

        assert abs(
            g["ks_stat"] - math.sqrt(n1 * n2 / (n1 + n2)) * g["d_stat"]
        ) < 1e-5


def test_simple_linreg_matches_numpy_lstsq(spark):
    import numpy as np

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        simple_linreg_trend,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in simple_linreg_trend(spark, SF_DIR_SMALL).collect()}
    ev = load_table(spark, SF_DIR_SMALL, "events").collect()
    daily: dict = {}
    import datetime

    epoch = datetime.date(1970, 1, 1)
    for r in ev:
        k = (r["event_type"], r["ts"].date())
        daily[k] = daily.get(k, 0.0) + r["value"]
    for et in got:
        pts = sorted(
            ((d - epoch).days, v) for (t, d), v in daily.items() if t == et
        )
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([round(p[1], 6) for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        yhat = slope * x + intercept
        ss_res = float(((y - yhat) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        r2 = 1.0 - ss_res / ss_tot
        g = got[et]
        assert g["n_days"] == len(pts)
        assert abs(g["slope_per_day"] - slope) < max(1e-3, 1e-4 * abs(slope))
        assert abs(g["intercept"] - intercept) < max(1e-2, 1e-4 * abs(intercept))
        assert 0.0 <= g["r2"] <= 1.0
        assert abs(g["r2"] - r2) < 1e-4


def test_skew_kurt_matches_moment_recompute(spark):
    import math

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        skew_kurt_battery,
    )

    got = {r["event_type"]: r for r in skew_kurt_battery(spark, SF_DIR_SMALL).collect()}
    _, by_type = _event_values(spark)
    for et, sample in by_type.items():
        n = len(sample)
        m1 = sum(sample) / n
        m2 = sum((v - m1) ** 2 for v in sample) / n
        m3 = sum((v - m1) ** 3 for v in sample) / n
        m4 = sum((v - m1) ** 4 for v in sample) / n
        g = got[et]
        assert g["n_sample"] == n
        assert abs(g["mean_value"] - m1) < 1e-5
        assert abs(g["variance_pop"] - m2) < max(1e-4, 1e-7 * m2)
        assert abs(g["skew_pop"] - m3 / (m2 * math.sqrt(m2))) < 1e-4
        assert abs(g["kurt_pop"] - m4 / (m2 * m2)) < 1e-3
        # Pearson's inequality: kurtosis >= skewness^2 + 1, always
        assert g["kurt_pop"] >= g["skew_pop"] ** 2 + 1.0 - 1e-9
    # merge-order independence at a different parallelism
    re = {r["event_type"]: r for r in
          skew_kurt_battery(spark, SF_DIR_SMALL).repartition(5).collect()}
    assert {k: (v["skew_pop"], v["kurt_pop"]) for k, v in got.items()} == {
        k: (v["skew_pop"], v["kurt_pop"]) for k, v in re.items()
    }


def test_cramers_v_matches_contingency_recompute(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        cramers_v_assoc,
    )

    row = cramers_v_assoc(spark, SF_DIR_SMALL).collect()
    assert len(row) == 1
    g = row[0]
    rows, _ = _event_values(spark)
    from collections import Counter

    cells = Counter((r["event_type"], f"region_{r['user_id'] % 7}") for r in rows)
    types = sorted({k[0] for k in cells})
    regions = sorted({k[1] for k in cells})
    n = sum(cells.values())
    chi2 = 0.0
    for t in types:
        rt = sum(v for (tt, _), v in cells.items() if tt == t)
        for rg in regions:
            ct = sum(v for (_, rr), v in cells.items() if rr == rg)
            e = rt * ct / n
            o = cells.get((t, rg), 0)
            chi2 += (o - e) ** 2 / e
    assert g["n_total"] == n
    assert g["r_levels"] == len(types) and g["c_levels"] == len(regions)
    assert abs(g["chi2"] - chi2) < max(1e-4, 1e-7 * chi2)
    assert 0.0 <= g["cramers_v"] <= 1.0
    assert 0.0 <= g["cramers_v_bc"] <= 1.0
    # bias correction can only shrink phi2 on this fixture's tiny effect
    assert g["cramers_v_bc"] <= g["cramers_v"] + 1e-9


def test_retention_conditions_matches_flag_recompute(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        retention_conditions,
    )

    g = retention_conditions(spark, SF_DIR_SMALL).collect()[0]
    import datetime

    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    epoch = datetime.date(2024, 1, 1)
    per: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        wk = (r["ts"].date() - epoch).days
        c = per.setdefault(r["user_id"], [0, 0, 0, 0])
        if r["event_type"] == "purchase":
            if 0 <= wk <= 6:
                c[0] = 1
            if 7 <= wk <= 13:
                c[1] = 1
            if 14 <= wk <= 20 and r["value"] > 60:
                c[2] = 1
            if 21 <= wk <= 27 and r["value"] > 150:
                c[3] = 1
    r1 = sum(c[0] for c in per.values())
    r2 = sum(c[0] * c[1] for c in per.values())
    r3 = sum(c[0] * c[2] for c in per.values())
    r4 = sum(c[0] * c[3] for c in per.values())
    assert (g["n_users"], g["r1"], g["r2"], g["r3"], g["r4"]) == (
        len(per), r1, r2, r3, r4,
    )
    # ClickHouse retention semantics: every r_i is cond1-gated
    assert g["r2"] <= g["r1"] and g["r3"] <= g["r1"] and g["r4"] <= g["r1"]
    # fixture falsifiability: the value-threshold gradient actually bites
    assert 0 < g["r4"] < g["r3"] < g["r1"]
    assert abs(g["ret4"] - g["r4"] / g["r1"]) < 5e-7  # round-6 output


def test_sequence_next_node_matches_chain_recompute(spark):
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        NEXT_NODE_WINDOW_US,
        sequence_next_node,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {
        r["next_event_type"]: r
        for r in sequence_next_node(spark, SF_DIR_SMALL).collect()
    }
    by_user: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        tus = int(r["ts"].timestamp() * 1_000_000)
        by_user.setdefault(r["user_id"], []).append(
            (tus, r["event_id"], r["event_type"])
        )
    from collections import Counter

    expect: Counter = Counter()
    for evs in by_user.values():
        evs.sort()
        s = next((e for e in evs if e[2] == "signup"), None)
        if s is None:
            continue
        p = next((e for e in evs if e[2] == "purchase" and e[:2] > s[:2]), None)
        if p is None:
            continue
        nxt = next(
            (e for e in evs if e[:2] > p[:2] and e[0] <= p[0] + NEXT_NODE_WINDOW_US),
            None,
        )
        expect[nxt[2] if nxt is not None else "(end)"] += 1
    assert {k: v["n_users"] for k, v in got.items()} == dict(expect)
    # both branches fire on the fixture: a silent hour AND a real next event
    assert "(end)" in got and len(got) >= 2
    total = sum(expect.values())
    for k, v in got.items():
        assert abs(v["share"] - expect[k] / total) < 5e-7  # round-6 output


def test_student_ttest_matches_pooled_recompute(spark):
    import math

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        student_ttest_values,
    )

    got = {r["event_type"]: r for r in student_ttest_values(spark, SF_DIR_SMALL).collect()}
    _, by_type = _event_values(spark)
    allv = [v for vs in by_type.values() for v in vs]
    for et, sample in by_type.items():
        rest = [v for o, vs in by_type.items() if o != et for v in vs]
        n1, n2 = len(sample), len(rest)
        m1, m2 = sum(sample) / n1, sum(rest) / n2
        ss1 = sum((x - m1) ** 2 for x in sample)
        ss2 = sum((x - m2) ** 2 for x in rest)
        sp2 = (ss1 + ss2) / (n1 + n2 - 2)
        t = (m1 - m2) / math.sqrt(sp2 * (1 / n1 + 1 / n2))
        g = got[et]
        assert g["n_sample"] == n1 and g["n_rest"] == n2
        assert g["df"] == len(allv) - 2
        assert abs(g["t_stat"] - t) < 1e-4, (et, g["t_stat"], t)


def test_lttb_matches_reference_walk(spark):
    """The HOF-fold LTTB must equal a pure-Python reference walk with the
    same bucketing; invariants: first/last kept, exactly one point per
    middle bucket, x strictly increasing."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        LTTB_N_OUT,
        lttb_downsample_daily,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = sorted(
        lttb_downsample_daily(spark, SF_DIR_SMALL).collect(), key=lambda r: r["idx"]
    )
    assert len(got) == LTTB_N_OUT
    import datetime
    from decimal import Decimal

    epoch = datetime.date(1970, 1, 1)
    daily: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        d = (r["ts"].date() - epoch).days
        daily[d] = daily.get(d, Decimal(0)) + Decimal(str(round(r["value"], 2)))
    pts = sorted((float(d), float(v)) for d, v in daily.items())
    m, nb = len(pts), LTTB_N_OUT - 2
    mm = m - 2
    sel = [pts[0]]
    px, py = pts[0]
    for b in range(nb):
        lo, hi = (b * mm) // nb, ((b + 1) * mm) // nb
        cands = pts[1 + lo : 1 + hi]
        if b < nb - 1:
            nlo, nhi = ((b + 1) * mm) // nb, ((b + 2) * mm) // nb
            nxt = pts[1 + nlo : 1 + nhi]
            ax = sum(p[0] for p in nxt) / len(nxt)
            ay = sum(p[1] for p in nxt) / len(nxt)
        else:
            ax, ay = pts[m - 1]
        best, bx, by = -1.0, None, None
        for cx, cy in cands:
            area = abs((px - ax) * (cy - py) - (px - cx) * (ay - py))
            if area > best:
                best, bx, by = area, cx, cy
        sel.append((bx, by))
        px, py = bx, by
    sel.append(pts[m - 1])
    assert [(r["x_day"], r["y_revenue"]) for r in got] == [
        (int(x), round(y, 6)) for x, y in sel
    ]
    # first/last anchored; strictly increasing x (one pick per bucket)
    assert got[0]["x_day"] == int(pts[0][0]) and got[-1]["x_day"] == int(pts[-1][0])
    xs = [r["x_day"] for r in got]
    assert xs == sorted(set(xs))


def test_minhash_scurve_candidates_share_a_band(spark):
    """Every LSH candidate shares a full band, so match_count >= r (3);
    theory column equals the mirrored multiply chain; est_jaccard is
    match/k; the pair total equals the near-dup pipeline's candidate
    count (same banded join, one truth)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.dedup import (
        MINHASH_BAND_ROWS,
        MINHASH_K,
        minhash_scurve_report,
    )

    rows = minhash_scurve_report(spark, SF_DIR_SMALL).collect()
    assert rows, "fixture must produce LSH candidates"
    for r in rows:
        assert r["match_count"] >= MINHASH_BAND_ROWS
        assert r["match_count"] <= MINHASH_K
        s = r["match_count"] / MINHASH_K
        assert abs(r["est_jaccard"] - s) < 5e-7
        q = 1.0 - (s * s) * s
        assert abs(r["collision_prob"] - (1.0 - ((q * q) * (q * q)))) < 5e-7
    # collision_prob is monotone in match_count
    srt = sorted(rows, key=lambda r: r["match_count"])
    probs = [r["collision_prob"] for r in srt]
    assert probs == sorted(probs)


def test_dau_wau_stickiness_matches_brute_recompute(spark):
    """Sweep-line WAU == brute trailing-7-day distinct per day; dau <= wau;
    the fixture genuinely exercises the multi-island branch (some user
    has a >6-day purchase gap)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        WAU_WINDOW_DAYS,
        dau_wau_stickiness,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["day"]: r for r in dau_wau_stickiness(spark, SF_DIR_SMALL).collect()}
    ud = {
        (r["user_id"], r["ts"].date())
        for r in load_table(spark, SF_DIR_SMALL, "events").collect()
        if r["event_type"] == "purchase"
    }
    days = sorted({d for _, d in ud})
    assert set(got) == set(days)
    import datetime

    gap_seen = False
    by_user: dict = {}
    for u, d in ud:
        by_user.setdefault(u, []).append(d)
    for ds in by_user.values():
        ds.sort()
        for a, b in zip(ds, ds[1:]):
            if (b - a).days > WAU_WINDOW_DAYS - 1:
                gap_seen = True
    assert gap_seen, "fixture must exercise the multi-island branch"
    for d in days:
        dau = sum(1 for (_, dd) in ud if dd == d)
        lo = d - datetime.timedelta(days=WAU_WINDOW_DAYS - 1)
        wau = len({u for (u, dd) in ud if lo <= dd <= d})
        g = got[d]
        assert (g["dau"], g["wau"]) == (dau, wau), (d, g, dau, wau)
        assert g["dau"] <= g["wau"]
        assert abs(g["stickiness"] - dau / wau) < 5e-7


def test_corr_matrix_matches_numpy(spark):
    """6 upper-triangle cells vs numpy corrcoef on the same daily triple;
    diagonal exactly 1.0 (x/(sqrt(x)*sqrt(x)) both engines); symmetry by
    construction; |corr| <= 1."""
    import numpy as np

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        corr_matrix_daily,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    rows = corr_matrix_daily(spark, SF_DIR_SMALL).collect()
    assert len(rows) == 6
    got = {(r["metric_i"], r["metric_j"]): r["corr"] for r in rows}
    daily: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        if r["event_type"] != "purchase":
            continue
        d = r["ts"].date()
        c, rev, us = daily.get(d, (0, 0.0, set()))
        us = set(us)
        us.add(r["user_id"])
        daily[d] = (c + 1, rev + r["value"], us)
    days = sorted(daily)
    mat = np.array(
        [[daily[d][0], round(daily[d][1], 2), len(daily[d][2])] for d in days],
        dtype=float,
    ).T
    ref = np.corrcoef(mat)
    names = ["orders", "revenue", "purchasers"]
    for i, a in enumerate(names):
        for j in range(i, 3):
            b = names[j]
            assert abs(got[(a, b)] - ref[i][j]) < 1e-5, (a, b)
            assert abs(got[(a, b)]) <= 1.0 + 1e-9
    assert got[("orders", "orders")] == 1.0
    assert rows[0]["n_days"] == len(days)


def test_mrl_truncation_recall_matches_numpy_and_monotone(spark):
    """Recall per truncated dim vs a numpy brute recompute with the same
    round-6 + id-tiebreak ranking; recall rises with kept dims; full-dim
    hits bounded by k*n."""
    import numpy as np

    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        MRL_DIMS,
        TOP_K,
        mrl_truncation_recall,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["dim_kept"]: r for r in mrl_truncation_recall(spark, SF_DIR_SMALL).collect()}
    assert set(got) == set(MRL_DIMS)
    rows = load_table(spark, SF_DIR_SMALL, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)

    def topk_sets(d):
        sub = mat[:, :d]
        unit = sub / np.linalg.norm(sub, axis=1, keepdims=True)
        cos = np.round(unit @ unit.T, 6)
        out = {}
        for qi, vid in enumerate(ids):
            mask = ids != vid
            order = np.lexsort((ids[mask], -cos[qi][mask]))[:TOP_K]
            out[vid] = set(ids[mask][order].tolist())
        return out

    full = topk_sets(mat.shape[1])
    n = len(ids)
    prev = -1.0
    for d in sorted(MRL_DIMS):
        sets = topk_sets(d)
        hits = sum(len(full[v] & sets[v]) for v in full)
        g = got[d]
        assert g["n_queries"] == n
        assert g["total_hits"] == hits, (d, g["total_hits"], hits)
        assert abs(g["recall_at_k"] - hits / (TOP_K * n)) < 5e-7
        assert g["recall_at_k"] >= prev  # more dims, never worse
        prev = g["recall_at_k"]
    assert got[max(MRL_DIMS)]["recall_at_k"] < 1.0  # truncation genuinely loses


def test_mrl_adaptive_rerank_beats_raw_truncation(spark):
    """The full-dim re-rank of the 8-dim shortlist must strictly beat the
    raw 8-dim top-5 recall (that lift is the whole point of adaptive
    retrieval), while staying below exact (shortlist misses are real)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.similarity import (
        ann_mrl_adaptive_rerank,
        mrl_truncation_recall,
    )

    g = ann_mrl_adaptive_rerank(spark, SF_DIR_SMALL).collect()[0]
    raw = {
        r["dim_kept"]: r["recall_at_k"]
        for r in mrl_truncation_recall(spark, SF_DIR_SMALL).collect()
    }
    assert g["coarse_dim"] == 8 and g["shortlist_k"] == 50
    assert g["recall_at_k"] > raw[8], (g["recall_at_k"], raw[8])
    assert g["recall_at_k"] < 1.0  # probe loss is real on this fixture
    assert 0 <= g["total_hits"] <= 5 * g["n_queries"]


def test_holt_forecast_matches_python_recurrence(spark):
    """The fold must equal a pure-Python Holt recurrence; forecasts are
    linear in h off (level, trend); SSE >= 0."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_HORIZON,
        holt_linear_forecast,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = sorted(holt_linear_forecast(spark, SF_DIR_SMALL).collect(), key=lambda r: r["h"])
    assert len(got) == HOLT_HORIZON
    daily: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        d = r["ts"].date()
        daily[d] = daily.get(d, 0.0) + r["value"]
    days = sorted(daily)
    ys = [round(daily[d], 6) for d in days]
    l, b, sse = ys[0], ys[1] - ys[0], 0.0
    for y in ys[1:]:
        pred = l + b
        sse += (y - pred) ** 2
        new_l = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * pred
        b = HOLT_BETA * (new_l - l) + (1 - HOLT_BETA) * b
        l = new_l
    g1 = got[0]
    assert abs(g1["level_final"] - l) < max(1e-3, 1e-6 * abs(l))
    assert abs(g1["trend_final"] - b) < max(1e-3, 1e-4 * abs(b))
    assert abs(g1["sse_one_step"] - sse) < max(1e-2, 1e-6 * sse)
    assert g1["sse_one_step"] >= 0
    import datetime

    for r in got:
        assert abs(r["forecast_revenue"] - (l + r["h"] * b)) < 1e-2
        assert r["forecast_day"] == days[-1] + datetime.timedelta(days=r["h"])


def test_spearman_matches_scipy_style_recompute(spark):
    """rho vs a pure-Python midrank Spearman (Pearson on average ranks);
    |rho| <= 1; doubled midranks give the identical statistic."""
    import math

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        spearman_rank_corr,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in spearman_rank_corr(spark, SF_DIR_SMALL).collect()}
    by_type: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        sod = (
            r["ts"].hour * 3600 + r["ts"].minute * 60 + r["ts"].second
        )
        by_type.setdefault(r["event_type"], []).append((r["value"], sod))

    def midranks(vals):
        from collections import Counter

        cnt = Counter(vals)
        out, below = {}, 0
        for v in sorted(cnt):
            out[v] = below + (cnt[v] + 1) / 2.0
            below += cnt[v]
        return out

    for et, pairs in by_type.items():
        mx = midranks([p[0] for p in pairs])
        my = midranks([p[1] for p in pairs])
        xs = [mx[p[0]] for p in pairs]
        ys = [my[p[1]] for p in pairs]
        n = len(pairs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        rho = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        g = got[et]
        assert g["n_sample"] == n
        assert abs(g["spearman_rho"]) <= 1.0 + 1e-9
        assert abs(g["spearman_rho"] - rho) < 1e-4, (et, g["spearman_rho"], rho)


def test_kendall_tau_b_matches_bruteforce_pairs(spark):
    """C/D/tau-b vs the O(n^2) brute pairwise recompute (feasible at
    sf0.001) — the 2-D prefix-sum construction must count every
    concordant/discordant pair exactly once."""
    import math

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        kendall_tau_b,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in kendall_tau_b(spark, SF_DIR_SMALL).collect()}
    by_type: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        by_type.setdefault(r["event_type"], []).append((r["value"], r["ts"].hour))
    for et, pts in by_type.items():
        n = len(pts)
        c = d = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = (pts[i][0] > pts[j][0]) - (pts[i][0] < pts[j][0])
                dy = (pts[i][1] > pts[j][1]) - (pts[i][1] < pts[j][1])
                if dx * dy > 0:
                    c += 1
                elif dx * dy < 0:
                    d += 1
        from collections import Counter

        tx = sum(t * (t - 1) // 2 for t in Counter(p[0] for p in pts).values())
        ty = sum(t * (t - 1) // 2 for t in Counter(p[1] for p in pts).values())
        n0 = n * (n - 1) // 2
        tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
        g = got[et]
        assert (g["concordant"], g["discordant"]) == (c, d), (et, g, c, d)
        assert abs(g["kendall_tau_b"] - tau) < 5e-7
        assert abs(g["kendall_tau_b"]) <= 1.0 + 1e-9


def test_revenue_concentration_matches_recompute(spark):
    """Gini/HHI/Pareto vs a pure-Python recompute; Gini in [0,1);
    HHI in [1/n, 1]; the Pareto set is the MINIMAL desc prefix
    reaching 80%."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        revenue_concentration,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["region"]: r for r in revenue_concentration(spark, SF_DIR_SMALL).collect()}
    per: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        if r["event_type"] != "purchase":
            continue
        k = (f"region_{r['user_id'] % 7}", r["user_id"])
        per[k] = per.get(k, 0.0) + r["value"]
    regions: dict = {}
    for (rg, u), rev in per.items():
        regions.setdefault(rg, []).append(round(rev, 2))
    for rg, revs in regions.items():
        revs.sort()
        n, s = len(revs), sum(revs)
        gini = 2.0 * sum((i + 1) * x for i, x in enumerate(revs)) / (n * s) - (
            n + 1
        ) / n
        hhi = sum(x * x for x in revs) / (s * s)
        desc = sorted(revs, reverse=True)
        cum, k = 0.0, 0
        for x in desc:
            if cum >= 0.8 * s - 1e-9:
                break
            cum += x
            k += 1
        g = got[rg]
        assert g["n_customers"] == n
        assert 0.0 <= g["gini"] < 1.0
        assert 1.0 / n - 1e-9 <= g["hhi"] <= 1.0
        assert abs(g["gini"] - gini) < 1e-4
        assert abs(g["hhi"] - hhi) < 1e-5
        assert g["pareto80_users"] == k, (rg, g["pareto80_users"], k)


def test_cohort_ltv_matches_recompute_and_monotone(spark):
    """Cumulative LTV vs a pure-Python recompute; cum_revenue monotone in
    age within a cohort; the multi-cohort branch fires at sf0.01 (the
    oracle-gate SF — sf0.001's 15 users all convert in week 0)."""
    from tests.conftest import SF_DIR_ORACLE

    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        cohort_ltv_curve,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = sorted(
        cohort_ltv_curve(spark, SF_DIR_SMALL).collect(),
        key=lambda r: (r["cohort_week"], r["age_weeks"]),
    )
    import datetime

    epoch = datetime.date(2024, 1, 1)
    uw = []
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        if r["event_type"] == "purchase":
            uw.append((r["user_id"], (r["ts"].date() - epoch).days // 7, r["value"]))
    cohort = {}
    for u, w, _ in uw:
        cohort[u] = min(cohort.get(u, 99), w)
    rev: dict = {}
    for u, w, v in uw:
        k = (cohort[u], w - cohort[u])
        rev[k] = rev.get(k, 0.0) + v
    sizes: dict = {}
    for u, cw in cohort.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    expect = {}
    for cw in sizes:
        cum = 0.0
        for age in sorted(a for (c, a) in rev if c == cw):
            cum += rev[(cw, age)]
            expect[(cw, age)] = cum
    prev_by_cohort: dict = {}
    for g in got:
        k = (g["cohort_week"], g["age_weeks"])
        assert abs(g["cum_revenue"] - expect[k]) < 1e-4
        assert g["cohort_users"] == sizes[g["cohort_week"]]
        assert abs(g["ltv_per_user"] - expect[k] / sizes[g["cohort_week"]]) < 5e-7
        p = prev_by_cohort.get(g["cohort_week"])
        if p is not None:
            assert g["cum_revenue"] >= p - 1e-9  # monotone within cohort
        prev_by_cohort[g["cohort_week"]] = g["cum_revenue"]
    # multi-cohort branch fires at the oracle SF
    bigger = cohort_ltv_curve(spark, SF_DIR_ORACLE).select("cohort_week").distinct()
    assert bigger.count() > 1


def test_cusum_changepoint_matches_recompute(spark):
    """Peak location and magnitude vs a pure-Python CUSUM over the same
    daily series; the scaled-exact argmax must pick the |cum_k - k*mean|
    maximizer (min day on ties)."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        cusum_changepoint,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in cusum_changepoint(spark, SF_DIR_SMALL).collect()}
    daily: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        k = (r["event_type"], r["ts"].date())
        daily[k] = daily.get(k, 0.0) + r["value"]
    by_type: dict = {}
    for (t, d), v in daily.items():
        by_type.setdefault(t, []).append((d, round(v, 6)))
    for t, pts in by_type.items():
        pts.sort()
        n = len(pts)
        s = sum(v for _, v in pts)
        mean = s / n
        best, best_day, cum = -1.0, None, 0.0
        for k, (d, v) in enumerate(pts, start=1):
            cum += v
            dev = abs(cum - k * mean)
            if dev > best + 1e-9:
                best, best_day = dev, d
        g = got[t]
        assert g["n_days"] == n
        assert g["changepoint_day"] == best_day, (t, g["changepoint_day"], best_day)
        assert abs(g["cusum_peak"] - best) < max(1e-3, 1e-6 * best)
        assert abs(g["mean_daily_revenue"] - mean) < 1e-4


def test_seasonal_dow_index_matches_recompute(spark):
    """Indices vs a pure-Python ratio-to-MA recompute; all 7 weekdays
    present; only full 7-day windows contribute; indices hover near 1."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        seasonal_dow_index,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["dow"]: r for r in seasonal_dow_index(spark, SF_DIR_SMALL).collect()}
    daily: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        d = r["ts"].date()
        daily[d] = daily.get(d, 0.0) + r["value"]
    days = sorted(daily)
    per: dict = {}
    for i in range(3, len(days) - 3):
        window = [round(daily[days[j]], 6) for j in range(i - 3, i + 4)]
        trend = sum(window) / 7.0
        ratio = round(daily[days[i]], 6) / trend
        per.setdefault(days[i].isoweekday(), []).append(ratio)
    assert set(got) == set(range(1, 8))
    for dow, ratios in per.items():
        g = got[dow]
        assert g["n_days"] == len(ratios)
        assert abs(g["seasonal_index"] - sum(ratios) / len(ratios)) < 1e-4
        assert 0.5 < g["seasonal_index"] < 1.5  # near-1 multiplicative index


def test_weekday_anova_matches_recompute(spark):
    """F, SSB, SSW vs a pure-Python one-way ANOVA on the same daily
    groups; SSB+SSW == total SS; F >= 0."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        weekday_anova_f,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    g = weekday_anova_f(spark, SF_DIR_SMALL).collect()[0]
    daily: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        d = r["ts"].date()
        daily[d] = daily.get(d, 0.0) + r["value"]
    groups: dict = {}
    for d, v in daily.items():
        groups.setdefault(d.isoweekday(), []).append(round(v, 2))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert g["k_groups"] == k and g["n_days"] == n
    assert abs(g["ss_between"] - ssb) < max(1e-2, 1e-6 * ssb)
    assert abs(g["ss_within"] - ssw) < max(1e-2, 1e-6 * ssw)
    assert abs(g["f_stat"] - f) < max(1e-4, 1e-4 * f)
    assert g["f_stat"] >= 0


def test_daily_acf_matches_recompute(spark):
    """ACF at lags 1/2/7 vs a pure-Python textbook estimator; |acf| <= 1;
    lag-k uses exactly n-k pairs."""
    from realtime_analytics_with_kafka_clickhouse_spark.operators.timeseries import (
        ACF_LAGS,
        daily_revenue_acf,
    )
    from realtime_analytics_with_kafka_clickhouse_spark.sources.tables import load_table

    got = {r["lag"]: r for r in daily_revenue_acf(spark, SF_DIR_SMALL).collect()}
    assert set(got) == set(ACF_LAGS)
    daily: dict = {}
    for r in load_table(spark, SF_DIR_SMALL, "events").collect():
        d = r["ts"].date()
        daily[d] = daily.get(d, 0.0) + r["value"]
    ys = [round(daily[d], 2) for d in sorted(daily)]
    n = len(ys)
    m = sum(ys) / n
    den = sum((y - m) ** 2 for y in ys)
    for k in ACF_LAGS:
        num = sum((ys[t] - m) * (ys[t + k] - m) for t in range(n - k))
        g = got[k]
        assert g["n_pairs"] == n - k and g["n_days"] == n
        assert abs(g["acf"] - num / den) < 1e-4, (k, g["acf"], num / den)
        assert abs(g["acf"]) <= 1.0 + 1e-9
