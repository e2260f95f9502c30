"""Round-12 wave-4 replay tests: blocked/ordered nonparametrics and MASE
recomputed from raw parquet with plain python — textbook formulas with
true midranks and float arithmetic, no histogram or wide-integer
devices."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import raw, sql_round

SF = "/root/testdata/sf0.001"


def _midranks(values):
    """value -> midrank over the multiset."""
    freq = Counter(values)
    ranks = {}
    below = 0
    for v in sorted(freq):
        ranks[v] = below + (freq[v] + 1) / 2
        below += freq[v]
    return ranks


def test_cochran_q_matches_textbook_replay(spark):
    out = {r["event_type"]: r for r in Q.QUERIES["analytic_cochran_q"].fn(spark, SF).collect()}
    reach = defaultdict(set)
    for uid, dy, et in raw(
        f"SELECT DISTINCT user_id, day(ts), event_type FROM '{SF}/events.parquet'"
    ):
        reach[(uid, int(dy))].add(et)
    k = len({et for s in reach.values() for et in s})
    keep = {u: s for u, s in reach.items() if 0 < len(s) < k}
    cj = Counter(et for s in keep.values() for et in s)
    t = sum(len(s) for s in keep.values())
    sr2 = sum(len(s) ** 2 for s in keep.values())
    sc2 = sum(c * c for c in cj.values())
    q = (k - 1) * (k * sc2 - t * t) / (k * t - sr2)
    for et, r in out.items():
        assert r["n_informative_reached"] == cj.get(et, 0)
        assert r["n_blocks"] == len(keep)
        assert r["df"] == k - 1
        assert abs(r["q_stat"] - q) < 1e-9
    assert set(out) == {et for s in reach.values() for et in s}


def _day_type_cells():
    cells = defaultdict(lambda: defaultdict(int))
    types = set()
    for dy, et in raw(f"SELECT day(ts), event_type FROM '{SF}/events.parquet'"):
        cells[int(dy)][et] += 1
        types.add(et)
    return cells, sorted(types)


def test_kendall_w_matches_textbook_replay(spark):
    out = {r["event_type"]: r for r in Q.QUERIES["analytic_kendall_w"].fn(spark, SF).collect()}
    cells, types = _day_type_cells()
    m, n = len(cells), len(types)
    rsum = defaultdict(float)
    tie_term = 0
    for dy, row in cells.items():
        vals = [row.get(t, 0) for t in types]
        ranks = _midranks(vals)
        for t, v in zip(types, vals):
            rsum[t] += ranks[v]
        for f in Counter(vals).values():
            tie_term += f**3 - f
    s = sum((rsum[t] - m * (n + 1) / 2) ** 2 for t in types)
    w = 12 * s / (m * m * n * (n * n - 1) - m * tie_term)
    for t in types:
        r = out[t]
        assert r["rank_sum_x2"] == round(2 * rsum[t])
        assert abs(r["mean_rank"] - rsum[t] / m) < 1e-6
        assert abs(r["kendall_w"] - w) < 1e-9
        assert abs(r["chi2"] - m * (n - 1) * w) < 1e-8
    assert 0 <= out[types[0]]["kendall_w"] <= 1


def test_jonckheere_matches_textbook_replay(spark):
    row = Q.QUERIES["analytic_jonckheere"].fn(spark, SF).collect()[0]
    groups = defaultdict(list)
    for et, v in raw(f"SELECT event_type, value FROM '{SF}/events.parquet'"):
        groups[et].append(int(sql_round(v * 100)))
    names = sorted(groups)
    jt2 = 0
    for i, gi in enumerate(names):
        ci = Counter(groups[gi])
        for gj in names[i + 1:]:
            for vj in groups[gj]:
                less = sum(c for v, c in ci.items() if v < vj)
                eq = ci.get(vj, 0)
                jt2 += 2 * less + eq
    ns = [len(groups[g]) for g in names]
    nn = sum(ns)
    e = (nn * nn - sum(x * x for x in ns)) / 4
    freq = Counter(v for vs in groups.values() for v in vs)
    a = (nn * (nn - 1) * (2 * nn + 5)
         - sum(x * (x - 1) * (2 * x + 5) for x in ns)
         - sum(f * (f - 1) * (2 * f + 5) for f in freq.values()))
    b = (sum(x * (x - 1) * (x - 2) for x in ns)
         * sum(f * (f - 1) * (f - 2) for f in freq.values()))
    c = (sum(x * (x - 1) for x in ns) * sum(f * (f - 1) for f in freq.values()))
    var = a / 72 + b / (36 * nn * (nn - 1) * (nn - 2)) + c / (8 * nn * (nn - 1))
    z = (jt2 / 2 - e) / math.sqrt(var)
    assert row["n_events"] == nn
    assert row["jt_x2"] == jt2
    assert row["e_jt_x2"] == round(2 * e)
    assert abs(row["z_jt"] - z) < 1e-8


def test_page_trend_matches_textbook_replay(spark):
    rows = {r["weekday"]: r for r in Q.QUERIES["analytic_page_trend"].fn(spark, SF).collect()}
    weeks = defaultdict(lambda: defaultdict(int))
    for ts, in raw(
        f"SELECT ts FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ):
        iso = ts.isocalendar()
        weeks[(iso[0], iso[1])][ts.weekday()] += 1
    m, n = len(weeks), 7
    rsum = defaultdict(float)
    for wkey, row in weeks.items():
        vals = [row.get(d, 0) for d in range(7)]
        ranks = _midranks(vals)
        for d, v in enumerate(vals):
            rsum[d] += ranks[v]
    l_stat = sum((d + 1) * rsum[d] for d in range(7))
    e_l = m * n * (n + 1) ** 2 / 4
    var = m * n * n * (n + 1) * (n * n - 1) / 144
    z = (l_stat - e_l) / math.sqrt(var)
    for d in range(7):
        r = rows[d]
        assert r["rank_sum_x2"] == round(2 * rsum[d])
        assert abs(r["l_stat"] - l_stat) < 0.51  # engine rounds to 1 dp
        assert abs(r["e_l"] - e_l) < 0.51
        assert abs(r["z_page"] - z) < 1e-6
    assert len(rows) == 7


def test_mase_daily_matches_python_replay(spark):
    row = Q.QUERIES["analytic_mase_daily"].fn(spark, SF).collect()[0]
    counts = defaultdict(int)
    for dy, in raw(
        f"SELECT day(ts) FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ):
        counts[int(dy)] += 1
    ys = [counts[d] for d in sorted(counts)]
    dd = len(ys)
    e1 = sum(abs(ys[t] - ys[t - 1]) for t in range(1, dd))
    e7 = sum(abs(ys[t] - ys[t - 7]) for t in range(7, dd))
    mase = (e1 / (dd - 1)) / (e7 / (dd - 7))
    assert row["n_days"] == dd
    assert row["abs_err_naive1"] == e1
    assert row["abs_err_seasonal7"] == e7
    assert abs(row["mase"] - mase) < 1e-9
