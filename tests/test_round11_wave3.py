"""Round-11 wave-3 replay tests (debut-round replays for the last four
`_R12_BACKLOG` names): Mahalanobis via numpy's actual covariance-matrix
inverse, Hodges-Lehmann via the brute-force Walsh-average multiset,
Cp/Cpk via statistics formulas, and Youden's J via a brute-force sweep
over every candidate threshold."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import raw, sql_round

SF = "/root/testdata/sf0.001"


def test_mahalanobis_matches_numpy_inverse_replay(spark):
    row = Q.QUERIES["analytic_mahalanobis_outliers"].fn(spark, SF).collect()[0]
    rows = raw(f"SELECT l_quantity, l_discount FROM '{SF}/lineitem.parquet'")
    x = np.array(
        [[int(q), int(sql_round(d * 10000))] for q, d in rows], dtype=float
    )
    mu = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)  # population covariance
    inv = np.linalg.inv(cov)  # the ACTUAL matrix inverse, not the 2x2 identity
    diff = x - mu
    md2 = np.einsum("ij,jk,ik->i", diff, inv, diff)
    assert row["n_rows"] == len(x)
    assert row["n_out_95"] == int((md2 > 5.991).sum())
    assert row["n_out_99"] == int((md2 > 9.210).sum())
    assert abs(row["max_md2"] - md2.max()) < 1e-5
    # chi2 cutoffs assume Gaussian tails; the bounded uniform-ish synthetic
    # columns have LIGHTER tails, so the outlier rate sits well under the
    # nominal 5% — only the ordering and the ceiling are distribution-free
    assert 0 <= row["n_out_95"] / len(x) < 0.20
    assert row["n_out_99"] <= row["n_out_95"]


def test_hodges_lehmann_matches_bruteforce_walsh_replay(spark):
    row = Q.QUERIES["analytic_hodges_lehmann"].fn(spark, SF).collect()[0]
    vals = sorted(int(q) for (q,) in raw(f"SELECT l_quantity FROM '{SF}/lineitem.parquet'"))
    n = len(vals)
    # brute-force over the value HISTOGRAM (the raw i<=j loop is O(n^2) in
    # rows; over <=50 distinct values it is exact and tiny)
    hist = defaultdict(int)
    for v in vals:
        hist[v] += 1
    walsh = defaultdict(int)
    hv = sorted(hist)
    for i, a in enumerate(hv):
        walsh[a + a] += hist[a] * (hist[a] + 1) // 2
        for b in hv[i + 1 :]:
            walsh[a + b] += hist[a] * hist[b]
    total = sum(walsh.values())
    assert total == n * (n + 1) // 2
    assert row["n_walsh_pairs"] == total

    def weighted_median(wh, t):
        import itertools
        lo = hi = None
        c = 0
        for s in sorted(wh):
            c += wh[s]
            if lo is None and c >= (t + 1) // 2:
                lo = s
            if hi is None and c >= (t + 2) // 2:
                hi = s
                break
        return (lo + hi) / 2

    hl = weighted_median(walsh, total) / 2
    assert abs(row["hodges_lehmann"] - hl) < 1e-9
    med = weighted_median({v: c for v, c in hist.items()}, n)
    assert abs(row["plain_median"] - med) < 1e-9
    # HL sits inside the data range and near the median for symmetric-ish data
    assert min(vals) <= row["hodges_lehmann"] <= max(vals)


def test_cpk_matches_python_replay(spark):
    row = Q.QUERIES["analytic_cpk_capability"].fn(spark, SF).collect()[0]
    cents = [
        int(sql_round(v * 100))
        for (v,) in raw(
            f"SELECT value FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
        )
    ]
    n = len(cents)
    mu = sum(cents) / n
    sigma = math.sqrt(sum(c * c for c in cents) / n - mu * mu)
    assert row["n_events"] == n
    assert row["n_within_spec"] == sum(1 for c in cents if 0 <= c <= 100000)
    assert abs(row["mean_cents"] - mu) < 1e-5
    assert abs(row["sigma_cents"] - sigma) < 1e-5
    assert abs(row["cp"] - 100000 / (6 * sigma)) < 1e-6
    assert abs(row["cpk"] - min(100000 - mu, mu - 0) / (3 * sigma)) < 1e-6
    # Cpk <= Cp always (equality iff perfectly centered)
    assert row["cpk"] <= row["cp"] + 1e-12


def test_youden_matches_bruteforce_sweep_replay(spark):
    row = Q.QUERIES["analytic_youden_threshold"].fn(spark, SF).collect()[0]
    rows = raw(f"SELECT o_totalprice, o_orderpriority FROM '{SF}/orders.parquet'")
    data = [
        (int(sql_round(p * 100)), 1 if pr in ("1-URGENT", "2-HIGH") else 0)
        for p, pr in rows
    ]
    n_pos = sum(l for _, l in data)
    n_neg = len(data) - n_pos
    best = None
    for thr in sorted({c for c, _ in data}):
        tp = sum(1 for c, l in data if c >= thr and l == 1)
        fp = sum(1 for c, l in data if c >= thr and l == 0)
        key = (tp * n_neg - fp * n_pos, -thr)  # maximize J, tie -> min thr
        if best is None or key > best[0]:
            best = (key, thr, tp, fp)
    _, thr, tp, fp = best
    assert (row["threshold_cents"], row["tp"], row["fp"]) == (thr, tp, fp)
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert abs(row["tpr"] - tp / n_pos) < 1e-9
    assert abs(row["fpr"] - fp / n_neg) < 1e-9
    assert abs(row["youden_j"] - (tp / n_pos - fp / n_neg)) < 1e-9
    assert row["youden_j"] >= 0  # the all-positive threshold gives J = 0


def test_survival_rmst_matches_python_km_replay(spark):
    """KM products and the step-function integral replayed with a plain
    python loop over explicit at-risk counts; also checks RMST against
    the direct 'mean of min(dur, tau) restricted by events' bound-free
    identities (RMST <= tau, RMST >= tau * S_final)."""
    rows = Q.QUERIES["analytic_survival_rmst"].fn(spark, SF).collect()
    out = {r["duration_days"]: r for r in rows}
    users = raw(
        f"""SELECT user_id, date_diff('day', min(ts), max(ts)),
                   max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    )
    byd = defaultdict(lambda: [0, 0])
    for _, dur, ev in users:
        byd[dur][0] += 1
        byd[dur][1] += ev
    n_all = sum(v[0] for v in byd.values())
    at_risk = n_all
    s = 1.0
    prev_t = 0
    rmst = 0.0
    s_prev = 1.0
    for t in sorted(byd):
        n_total, n_events = byd[t]
        rmst += s_prev * (min(t, 30) - min(prev_t, 30))
        s = s * (1.0 - n_events / at_risk)
        r = out[t]
        assert r["n_at_risk"] == at_risk and r["n_events"] == n_events
        assert abs(r["km_survival"] - s) < 1e-9
        at_risk -= n_total
        prev_t = t
        s_prev = s
    rmst += s_prev * (30 - min(prev_t, 30))
    for r in rows:
        assert abs(r["rmst_30d"] - rmst) < 1e-6
    assert 0.0 < rmst <= 30.0
    assert rmst >= 30.0 * s_prev - 1e-9  # area under a curve ending at S_final
