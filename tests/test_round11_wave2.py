"""Round-11 wave-2 replay tests: independent Python/numpy recomputation
of the 8 `_R12_BACKLOG` queries (debut-round replays, the standing
defense against correlated dual-text bugs). Where a genuinely different
algorithm exists, the replay uses it: VIF replays by ACTUALLY REGRESSING
each predictor on the other two (numpy lstsq) instead of the closed-form
correlation identity the dual texts share; Brown-Forsythe medians come
from statistics.median over the raw values, not the histogram device."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import numpy as np

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import raw, sql_round

SF = "/root/testdata/sf0.001"


def test_scd_type6_matches_row_replay(spark):
    out = {
        (r["o_orderkey"], r["valid_from"]): r
        for r in Q.QUERIES["cdc_scd_type6"].fn(spark, SF).collect()
    }
    expect = {}
    for k, price in raw(f"SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"):
        cents = int(sql_round(price * 100))
        m = k % 4
        if m == 0:
            expect[(k, 1)] = (cents, 2, False, None, cents + 1000)
            expect[(k, 2)] = (cents + 1000, None, True, cents, cents + 1000)
        elif m == 1:
            expect[(k, 1)] = (cents, 2, False, None, cents)
        else:
            expect[(k, 1)] = (cents, None, True, None, cents)
    assert set(out) == set(expect) and expect
    for key, (pc, vt, cur, prev, cp) in expect.items():
        r = out[key]
        assert (
            r["price_cents"], r["valid_to"], r["is_current"],
            r["prev_price_cents"], r["current_price_cents"],
        ) == (pc, vt, cur, prev, cp)
    # SCD invariants: at most one current row per key; prev only on v2 rows
    by_key = defaultdict(list)
    for (k, _), r in out.items():
        by_key[k].append(r)
    assert all(sum(r["is_current"] for r in rows) <= 1 for rows in by_key.values())


def test_analyze_stats_matches_python_replay(spark):
    out = {r["column_name"]: r for r in Q.QUERIES["layout_analyze_stats"].fn(spark, SF).collect()}
    rows = raw(
        f"""SELECT l_quantity, l_extendedprice, l_discount, l_shipdate, l_returnflag
            FROM '{SF}/lineitem.parquet'"""
    )
    epoch = __import__("datetime").date(1970, 1, 1)
    cols = {
        "l_quantity": [int(r[0]) for r in rows],
        "l_extendedprice_cents": [int(sql_round(r[1] * 100)) for r in rows],
        "l_discount_bp": [int(sql_round(r[2] * 10000)) for r in rows],
        "l_shipdate_day": [
            ((r[3].date() if hasattr(r[3], "date") else r[3]) - epoch).days for r in rows
        ],
        "l_returnflag_code": [ord(r[4][0]) for r in rows],
    }
    assert set(out) == set(cols)
    for name, vals in cols.items():
        r = out[name]
        assert (r["n_rows"], r["ndv"], r["min_v"], r["max_v"]) == (
            len(vals), len(set(vals)), min(vals), max(vals)
        ), name


def test_cochran_armitage_matches_python_replay(spark):
    row = Q.QUERIES["analytic_cochran_armitage"].fn(spark, SF).collect()[0]
    g = defaultdict(lambda: [0, 0])
    # ADVICE r11: the dose score is the ISO WEEKDAY (0 = Monday), not
    # day-of-month mod 7 — replay via python's own weekday(), a third
    # implementation independent of both isodow and F.weekday
    for ts, et in raw(f"SELECT ts, event_type FROM '{SF}/events.parquet'"):
        s = ts.weekday()
        g[s][0] += 1
        g[s][1] += 1 if et == "error" else 0
    n = sum(v[0] for v in g.values())
    rr = sum(v[1] for v in g.values())
    sr = sum(s * v[1] for s, v in g.items())
    sn = sum(s * v[0] for s, v in g.items())
    ssn = sum(s * s * v[0] for s, v in g.items())
    t = sr - rr * sn / n
    p = rr / n
    var = p * (1 - p) * (ssn - sn * sn / n)
    assert (row["n_events"], row["n_errors"]) == (n, rr)
    assert abs(row["trend_stat"] - t) < 1e-6
    assert abs(row["z_score"] - t / math.sqrt(var)) < 1e-9


def test_levene_bf_matches_python_replay(spark):
    out = {r["l_returnflag"]: r for r in Q.QUERIES["analytic_levene_bf"].fn(spark, SF).collect()}
    groups = defaultdict(list)
    for flag, q in raw(f"SELECT l_returnflag, l_quantity FROM '{SF}/lineitem.parquet'"):
        groups[flag].append(int(q))
    meds = {gname: statistics.median(v) for gname, v in groups.items()}
    z = {gname: [abs(q - meds[gname]) for q in v] for gname, v in groups.items()}
    n = sum(len(v) for v in z.values())
    k = len(z)
    zbar = sum(sum(v) for v in z.values()) / n
    between = sum(len(v) * (sum(v) / len(v) - zbar) ** 2 for v in z.values())
    within = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in z.values())
    w = ((n - k) / (k - 1)) * between / within
    assert set(out) == set(groups)
    for gname, v in groups.items():
        r = out[gname]
        assert r["n_g"] == len(v)
        assert abs(r["group_median"] - meds[gname]) < 1e-9
        assert abs(r["mean_abs_dev"] - sum(z[gname]) / len(v)) < 1e-6
        # micro quantization of per-group contributions (doubled-z scale
        # cancels in the ratio)
        assert abs(r["bf_w_stat"] - w) < 1e-4
        assert r["bf_w_stat"] >= 0


def test_negbin_moments_matches_python_replay(spark):
    out = {r["event_type"]: r for r in Q.QUERIES["analytic_negbin_moments"].fn(spark, SF).collect()}
    counts = defaultdict(lambda: defaultdict(int))
    for et, uid in raw(f"SELECT event_type, user_id FROM '{SF}/events.parquet'"):
        counts[et][uid] += 1
    assert set(out) == set(counts)
    for et, d in counts.items():
        xs = list(d.values())
        n = len(xs)
        m = sum(xs) / n
        v = sum(x * x for x in xs) / n - m * m
        r = out[et]
        assert r["n_users"] == n
        assert abs(r["mean_count"] - m) < 1e-6
        assert abs(r["var_count"] - v) < 1e-6
        assert abs(r["dispersion_index"] - v / m) < 1e-6
        if v > m:
            assert abs(r["nb_r"] - m * m / (v - m)) < 1e-5
            assert abs(r["nb_p"] - m / v) < 1e-6
        else:
            assert r["nb_r"] is None and r["nb_p"] is None


def test_vif_matches_actual_regression_replay(spark):
    """Replay by ACTUALLY regressing each predictor on the other two with
    numpy lstsq — the closed-form correlation identity the dual texts
    share is never used, so a transcription slip in it cannot hide."""
    out = {r["variable"]: r for r in Q.QUERIES["analytic_vif"].fn(spark, SF).collect()}
    rows = raw(
        f"SELECT l_quantity, l_extendedprice, l_discount FROM '{SF}/lineitem.parquet'"
    )
    x = np.array(
        [
            [int(q), int(sql_round(p * 100)) // 100, int(sql_round(disc * 10000))]
            for q, p, disc in rows
        ],
        dtype=float,
    )
    names = ["l_quantity", "l_extendedprice_dollars", "l_discount_bp"]
    for i, name in enumerate(names):
        y = x[:, i]
        others = x[:, [j for j in range(3) if j != i]]
        a = np.column_stack([np.ones(len(x)), others])
        coef, *_ = np.linalg.lstsq(a, y, rcond=None)
        resid = y - a @ coef
        ss_res = float(resid @ resid)
        ss_tot = float(((y - y.mean()) ** 2).sum())
        r2 = 1 - ss_res / ss_tot
        r = out[name]
        assert abs(r["r_squared"] - r2) < 1e-6, name
        assert abs(r["vif"] - 1 / (1 - r2)) < 1e-4, name
        # TPC-H columns are near-orthogonal: VIF must sit close to 1
        assert 1.0 <= r["vif"] < 1.5


def test_ivf_balance_matches_python_replay(spark):
    row = Q.QUERIES["sim_ivf_balance"].fn(spark, SF).collect()[0]
    emb = {
        vid: [float(v) for v in vec]
        for vid, vec in raw(f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'")
    }
    cents = [(cid, emb[cid]) for cid in sorted(emb)[:16]]

    def seq_dot(a, b):
        acc = 0.0
        for p, q in zip(a, b):
            acc += p * q
        return acc

    sizes = defaultdict(int)
    for vid, vec in emb.items():
        vn = math.sqrt(seq_dot(vec, vec))
        best = min(
            ((-(seq_dot(vec, cv) / (vn * math.sqrt(seq_dot(cv, cv)))), cid) for cid, cv in cents)
        )
        sizes[best[1]] += 1
    k = len(sizes)
    s = sum(sizes.values())
    s2 = sum(n * n for n in sizes.values())
    assert (row["n_lists_used"], row["n_vectors"]) == (k, s)
    assert (row["max_list"], row["min_list"]) == (max(sizes.values()), min(sizes.values()))
    assert abs(row["cv"] - math.sqrt(k * s2 - s * s) / s) < 1e-6
    assert abs(row["imbalance_factor"] - max(sizes.values()) * k / s) < 1e-6
    assert row["imbalance_factor"] >= 1.0  # equality iff perfectly balanced


def test_bland_altman_matches_python_replay(spark):
    row = Q.QUERIES["analytic_bland_altman"].fn(spark, SF).collect()[0]
    days = defaultdict(lambda: [0, 0])
    for day, et in raw(f"SELECT day(ts), event_type FROM '{SF}/events.parquet'"):
        if et == "purchase":
            days[day][0] += 1
        elif et == "error":
            days[day][1] += 1
    diffs = [p - e for p, e in days.values()]
    n = len(diffs)
    md = sum(diffs) / n
    sd = math.sqrt(sum(d * d for d in diffs) / n - md * md)
    outside = sum(1 for d in diffs if d > md + 1.96 * sd or d < md - 1.96 * sd)
    assert row["n_days"] == n
    assert abs(row["mean_diff"] - md) < 1e-6
    assert abs(row["sd_diff"] - sd) < 1e-6
    assert abs(row["loa_low"] - (md - 1.96 * sd)) < 1e-6
    assert abs(row["loa_high"] - (md + 1.96 * sd)) < 1e-6
    assert row["n_outside"] == outside
    # ~95% of days inside the limits by construction of the method
    assert outside <= max(2, n // 10)
