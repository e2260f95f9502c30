"""Round-12 wave-1 replay tests: every round-12 debut ships WITH an
independent Python/numpy replay in its debut round (the standing
round-11 discipline — a third implementation beside the correlated
Spark/DuckDB dual texts). The Wasserstein replay uses scipy-free direct
CDF integration over numpy arrays; Mood and Dunn replay the classical
textbook formulas from raw per-row data, not the engines' histogram
devices."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import raw, sql_round

SF = "/root/testdata/sf0.001"


def _event_cents():
    rows = raw(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    return [(et, int(sql_round(v * 100))) for et, v in rows]


def test_wasserstein_1d_matches_direct_cdf_replay(spark):
    row = Q.QUERIES["analytic_wasserstein_1d"].fn(spark, SF).collect()[0]
    xs = [v for et, v in _event_cents() if et == "purchase"]
    ys = [v for et, v in _event_cents() if et == "error"]
    support = sorted(set(xs) | set(ys))
    cx = Counter(xs)
    cy = Counter(ys)
    n1, n2 = len(xs), len(ys)
    w1 = 0.0
    f1 = f2 = 0
    for v, v_next in zip(support, support[1:]):
        f1 += cx.get(v, 0)
        f2 += cy.get(v, 0)
        w1 += abs(f1 / n1 - f2 / n2) * (v_next - v)
    assert (row["n1"], row["n2"], row["n_support"]) == (n1, n2, len(support))
    assert abs(row["w1_cents"] - w1) < 1e-6
    # metric sanity: W1 of a distribution against itself is 0, and the
    # engine value is bounded by the support diameter
    assert 0 <= row["w1_cents"] <= support[-1] - support[0]


def test_mood_median_matches_textbook_replay(spark):
    out = {r["event_type"]: r for r in Q.QUERIES["analytic_mood_median"].fn(spark, SF).collect()}
    data = _event_cents()
    vals = sorted(v for _, v in data)
    n = len(vals)
    m = vals[(n + 1) // 2 - 1]  # lower median (1-based rank ceil(n/2))
    groups = defaultdict(list)
    for et, v in data:
        groups[et].append(v)
    a_tot = sum(1 for _, v in data if v > m)
    b_tot = n - a_tot
    chi2 = 0.0
    for et, vs in groups.items():
        a_g = sum(1 for v in vs if v > m)
        n_g = len(vs)
        for obs, marg in ((a_g, a_tot), (n_g - a_g, b_tot)):
            e = n_g * marg / n
            chi2 += (obs - e) ** 2 / e
        assert out[et]["n_above"] == a_g
        assert out[et]["n_at_or_below"] == n_g - a_g
        assert out[et]["median_cents"] == m
    # 5 per-group micro-quantized terms -> bound 5 * 0.5e-6
    assert abs(out[next(iter(out))]["chi2"] - chi2) < 1e-5


def test_dunn_test_matches_midrank_replay(spark):
    rows = Q.QUERIES["analytic_dunn_test"].fn(spark, SF).collect()
    data = _event_cents()
    # classical midranks over the pooled sample
    vals = sorted(v for _, v in data)
    n = len(vals)
    start = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        start[vals[i]] = (i + 1 + j) / 2  # midrank of the tie block
        i = j
    groups = defaultdict(list)
    for et, v in data:
        groups[et].append(start[v])
    freq = Counter(vals)
    tt = sum(f**3 - f for f in freq.values())
    var = n * (n + 1) / 12 - tt / (12 * (n - 1))
    got = {(r["g1"], r["g2"]): r for r in rows}
    names = sorted(groups)
    n_pairs = 0
    for gi in names:
        for gj in names:
            if gi >= gj:
                continue
            n_pairs += 1
            ri = sum(groups[gi]) / len(groups[gi])
            rj = sum(groups[gj]) / len(groups[gj])
            z = (ri - rj) / math.sqrt(var * (1 / len(groups[gi]) + 1 / len(groups[gj])))
            r = got[(gi, gj)]
            assert (r["n1"], r["n2"]) == (len(groups[gi]), len(groups[gj]))
            assert abs(r["mean_rank_diff"] - (ri - rj)) < 1e-6
            assert abs(r["z_dunn"] - z) < 1e-8
    assert len(rows) == n_pairs  # k*(k-1)/2 pairs, each exactly once
