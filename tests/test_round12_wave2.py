"""Round-12 wave-2 replay tests: time-series diagnostics recomputed from
raw parquet with plain python/numpy floats (no wide-integer devices, no
shared SQL text) — the independent third implementation the debut
discipline requires."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import raw, sql_round

SF = "/root/testdata/sf0.001"


def _daily_purchases():
    counts = defaultdict(int)
    for (dy,) in raw(
        f"SELECT day(ts) FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ):
        counts[int(dy)] += 1
    days = sorted(counts)
    return days, [counts[d] for d in days]


def test_ljung_box_matches_numpy_replay(spark):
    rows = {r["lag"]: r for r in Q.QUERIES["analytic_ljung_box"].fn(spark, SF).collect()}
    _, ns = _daily_purchases()
    x = np.array(ns, dtype=float)
    d = len(x)
    dev = x - x.mean()
    denom = float((dev * dev).sum())
    q = 0.0
    for k in range(1, min(7, d - 1) + 1):
        rho = float((dev[:-k] * dev[k:]).sum()) / denom
        q += rho * rho / (d - k)
        r = rows[k]
        assert abs(r["rho"] - rho) < 1e-9
        assert abs(r["q_lb"] - d * (d + 2) * q) < 1e-6
    assert set(rows) == set(range(1, min(7, d - 1) + 1))


def test_jarque_bera_matches_numpy_replay(spark):
    out = {r["event_type"]: r for r in Q.QUERIES["analytic_jarque_bera"].fn(spark, SF).collect()}
    groups = defaultdict(list)
    for et, v in raw(f"SELECT event_type, value FROM '{SF}/events.parquet'"):
        groups[et].append(int(sql_round(v * 100)))
    assert set(out) == set(groups)
    for et, cents in groups.items():
        x = np.array(cents, dtype=float)
        n = len(x)
        m2 = float(((x - x.mean()) ** 2).mean())
        m3 = float(((x - x.mean()) ** 3).mean())
        m4 = float(((x - x.mean()) ** 4).mean())
        skew = m3 / m2**1.5
        kurt = m4 / m2**2
        jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
        r = out[et]
        assert r["n"] == n
        # raw-moment expansion vs numpy's centered sums: float cancellation
        # differs, so compare at the statistical (not ulp) scale
        assert abs(r["skewness"] - skew) < 1e-6
        assert abs(r["kurtosis"] - kurt) < 1e-6
        assert abs(r["jb_stat"] - jb) < max(1e-3, abs(jb) * 1e-5)


def test_durbin_watson_matches_numpy_replay(spark):
    row = Q.QUERIES["analytic_durbin_watson"].fn(spark, SF).collect()[0]
    days, ns = _daily_purchases()
    t = np.array(days, dtype=float)
    y = np.array(ns, dtype=float)
    beta, alpha = np.polyfit(t, y, 1)
    e = y - (alpha + beta * t)
    dw = float(((e[1:] - e[:-1]) ** 2).sum() / (e * e).sum())
    assert row["n_days"] == len(days)
    assert abs(row["slope"] - beta) < 1e-9
    assert abs(row["dw_stat"] - dw) < 1e-9
    assert abs(row["rho1_approx"] - (1 - dw / 2)) < 1e-9
    assert 0 <= row["dw_stat"] <= 4
