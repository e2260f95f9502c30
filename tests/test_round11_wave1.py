"""Round-11 wave-1 replay tests: every round-11 query ships WITH its
independent Python/numpy replay in its debut round (the defense the
round-10 verdict asked to make standing — a third implementation beside
the correlated Spark/DuckDB dual texts). Generic-loop replays are used
wherever the query unrolls or reformulates an algorithm: DTW replays as
a classic numpy DP table, median-rank/Theil/KW statistics replay without
the micro-integer quantization (tolerance = the documented quantization
bound), and the sort-order advisor replays with a plain python sort."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import duckdb
import numpy as np

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import _raster, md5_u32, raw, sql_round

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Theil index: unquantized replay + the Shorrocks additivity theorem.
# ---------------------------------------------------------------------------

def test_theil_index_matches_unquantized_replay(spark):
    row = Q.QUERIES["analytic_theil_index"].fn(spark, SF).collect()[0]
    spend = defaultdict(lambda: defaultdict(int))
    for nat, price, cust in raw(
        f"""SELECT c.c_nationkey, o.o_totalprice, o.o_custkey
            FROM '{SF}/orders.parquet' o JOIN '{SF}/customer.parquet' c
            ON o.o_custkey = c.c_custkey"""
    ):
        spend[nat][cust] += int(sql_round(price * 100))
    xs = [(g, x) for g, d in spend.items() for x in d.values()]
    n = len(xs)
    mu = sum(x for _, x in xs) / n
    total = sum((x / mu) * math.log(x / mu) for _, x in xs) / n
    groups = {g: list(d.values()) for g, d in spend.items()}
    s = sum(x for _, x in xs)
    between = within = 0.0
    for g, vals in groups.items():
        mg = sum(vals) / len(vals)
        between += (len(vals) / n) * (mg / mu) * math.log(mg / mu)
        tg = sum((x / mg) * math.log(x / mg) for x in vals) / len(vals)
        within += (sum(vals) / s) * tg
    assert row["n_customers"] == n and row["n_groups"] == len(groups)
    # quantization bound: per-term rounding at 1e-6, ~n terms / n
    assert abs(row["theil_total"] - total) < 1e-5
    assert abs(row["theil_between"] - between) < 1e-5
    assert abs(row["theil_within"] - within) < 1e-5
    # Shorrocks additivity: total = between + within (exact theorem; the
    # engine's decomp_gap reports only its quantization residual)
    assert abs(total - (between + within)) < 1e-12
    assert abs(row["decomp_gap"]) < 1e-5
    assert row["theil_total"] > 0 and row["theil_between"] >= 0


# ---------------------------------------------------------------------------
# Kendall tau-b: exact integer tallies from a direct double loop.
# ---------------------------------------------------------------------------

def test_kendall_tau_matches_python_replay(spark):
    row = Q.QUERIES["analytic_kendall_tau_daily"].fn(spark, SF).collect()[0]
    days = defaultdict(lambda: [0, 0])
    for day, et in raw(f"SELECT day(ts), event_type FROM '{SF}/events.parquet'"):
        if et == "purchase":
            days[day][0] += 1
        elif et == "error":
            days[day][1] += 1
    pts = [tuple(days[d]) for d in sorted(days)]
    nc = nd = tp = te = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
            if dx == 0:
                tp += 1
            if dy == 0:
                te += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    assert (row["n_days"], row["n_concordant"], row["n_discordant"]) == (len(pts), nc, nd)
    assert (row["ties_x"], row["ties_y"]) == (tp, te)
    tau = (nc - nd) / math.sqrt((n0 - tp) * (n0 - te))
    assert abs(row["tau_b"] - tau) < 1e-9
    assert -1.0 <= row["tau_b"] <= 1.0


# ---------------------------------------------------------------------------
# Kruskal-Wallis: replay with scipy-style average ranks from a full sort.
# ---------------------------------------------------------------------------

def test_kruskal_wallis_matches_rank_replay(spark):
    out = {r["event_type"]: r for r in Q.QUERIES["analytic_kruskal_wallis"].fn(spark, SF).collect()}
    rows = raw(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    vals = [(g, int(sql_round(v * 100))) for g, v in rows]
    allv = sorted(v for _, v in vals)
    n = len(allv)
    # average rank per value from the sorted order (textbook definition,
    # not the histogram identity the dual texts share)
    first = {}
    for i, v in enumerate(allv):
        first.setdefault(v, i + 1)
    cnt = defaultdict(int)
    for v in allv:
        cnt[v] += 1
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    groups = defaultdict(list)
    for g, v in vals:
        groups[g].append(v)
    h = 0.0
    for g, vs in groups.items():
        rg = sum(avg_rank[v] for v in vs)
        h += rg * rg / len(vs)
        assert abs(out[g]["mean_rank"] - rg / len(vs)) < 1e-5
        assert out[g]["n_g"] == len(vs)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    ties = sum(c**3 - c for c in cnt.values())
    c_corr = 1 - ties / (n**3 - n)
    any_row = next(iter(out.values()))
    # per-group micro quantization: |err| <= 0.5e-6 * n_groups
    assert abs(any_row["h_stat"] - h) < 1e-5
    assert abs(any_row["h_tie_corrected"] - h / c_corr) < 1e-5
    assert any_row["h_stat"] >= 0


# ---------------------------------------------------------------------------
# Friedman: within-day ranks replayed via sorted positions.
# ---------------------------------------------------------------------------

def test_friedman_matches_rank_replay(spark):
    out = {r["event_type"]: r for r in Q.QUERIES["analytic_friedman_test"].fn(spark, SF).collect()}
    cnt = defaultdict(lambda: defaultdict(int))
    types = set()
    for day, et in raw(f"SELECT day(ts), event_type FROM '{SF}/events.parquet'"):
        cnt[day][et] += 1
        types.add(et)
    types = sorted(types)
    k, n = len(types), len(cnt)
    rsum = defaultdict(float)
    tie_sum = 0
    for day, d in cnt.items():
        vals = [d.get(t, 0) for t in types]
        sv = sorted(vals)
        for t, v in zip(types, vals):
            lo = sv.index(v) + 1
            hi = len(sv) - sv[::-1].index(v)
            rsum[t] += (lo + hi) / 2
        tcnt = defaultdict(int)
        for v in vals:
            tcnt[v] += 1
        tie_sum += sum(c**3 - c for c in tcnt.values())
    q = 12.0 / (n * k * (k + 1)) * sum(r * r for r in rsum.values()) - 3 * n * (k + 1)
    c_corr = 1 - tie_sum / (n * k * (k * k - 1))
    for t in types:
        assert out[t]["rank_sum_x2"] == int(2 * rsum[t])
        assert abs(out[t]["mean_rank"] - rsum[t] / n) < 1e-6
        assert abs(out[t]["friedman_q"] - q) < 1e-9
        if c_corr > 0:
            assert abs(out[t]["q_tie_corrected"] - q / c_corr) < 1e-9


# ---------------------------------------------------------------------------
# Hurst R/S: per-window rescaled range replayed with numpy.
# ---------------------------------------------------------------------------

def test_hurst_rs_matches_numpy_replay(spark):
    out = {r["window_size"]: r for r in Q.QUERIES["analytic_hurst_rs"].fn(spark, SF).collect()}
    days = defaultdict(int)
    for (d,) in raw(
        f"SELECT day(ts) FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ):
        days[d] += 1
    vs = np.array([days[d] for d in sorted(days)], dtype=float)
    pts = []
    for w in (4, 8, 16):
        rsv = []
        for i in range(len(vs) // w):
            s = vs[i * w : (i + 1) * w]
            m = s.sum() / w
            cum = np.cumsum(s - m)
            rng = max(cum.max(), 0.0) - min(cum.min(), 0.0)
            sd = math.sqrt(((s - m) ** 2).sum() / w)
            if sd > 0:
                rsv.append(rng / sd)
        if rsv:
            mean = sum(rsv) / len(rsv)
            pts.append((w, len(rsv), mean))
            r = out[w]
            assert r["n_windows"] == len(rsv)
            assert abs(r["rs_mean"] - mean) < 1e-6
    lx = [math.log(w) for w, _, _ in pts]
    ly = [math.log(m) for _, _, m in pts if m > 0]
    npn = len(lx)
    slope = (npn * sum(x * y for x, y in zip(lx, ly)) - sum(lx) * sum(ly)) / (
        npn * sum(x * x for x in lx) - sum(lx) ** 2
    )
    for r in out.values():
        assert abs(r["hurst_h"] - slope) < 1e-4  # micro-nat log quantization
    # R/S grows with window size for any non-constant series
    assert out[16]["rs_mean"] > out[4]["rs_mean"]


# ---------------------------------------------------------------------------
# Weibull median-rank fit: unquantized numpy OLS replay.
# ---------------------------------------------------------------------------

def test_weibull_fit_matches_numpy_replay(spark):
    rows = Q.QUERIES["analytic_weibull_fit"].fn(spark, SF).collect()
    out = {r["duration_days"]: r for r in rows}
    users = raw(
        f"""SELECT user_id, date_diff('day', min(ts), max(ts)) FROM
            '{SF}/events.parquet' GROUP BY user_id"""
    )
    durs = defaultdict(int)
    for _, d in users:
        if d >= 1:
            durs[d] += 1
    n = sum(durs.values())
    cum = 0
    pts = []
    for d in sorted(durs):
        cum += durs[d]
        fr = (cum - 0.3) / (n + 0.4)
        pts.append((math.log(d), math.log(-math.log(1 - fr)), d, fr))
    a = np.column_stack([np.ones(len(pts)), np.array([p[0] for p in pts])])
    coef, *_ = np.linalg.lstsq(a, np.array([p[1] for p in pts]), rcond=None)
    intercept, slope = coef
    # micro-nat log quantization amplifies into the slope when the
    # lifetime spread is tiny (sf0.001: ln-x spread ~0.07), so the
    # tolerance is relative to the fitted magnitude
    tol = 1e-4 * max(1.0, abs(slope))
    for _, _, d, fr in pts:
        assert abs(out[d]["f_median_rank"] - fr) < 1e-9
        assert abs(out[d]["weibull_shape"] - slope) < tol
        assert abs(out[d]["weibull_ln_scale"] - (-intercept / slope)) < tol
    assert set(out) == {d for _, _, d, _ in pts}


# ---------------------------------------------------------------------------
# DTW: classic full numpy DP table — independent of the nested-fold form.
# ---------------------------------------------------------------------------

def test_dtw_matches_numpy_dp_replay(spark):
    row = Q.QUERIES["analytic_dtw_daily"].fn(spark, SF).collect()[0]
    days = defaultdict(lambda: [0, 0])
    for day, et in raw(f"SELECT day(ts), event_type FROM '{SF}/events.parquet'"):
        if et == "purchase":
            days[day][0] += 1
        elif et == "error":
            days[day][1] += 1
    xs = [days[d][0] for d in sorted(days)]
    ys = [days[d][1] for d in sorted(days)]
    n, m = len(xs), len(ys)
    dp = np.full((n + 1, m + 1), np.iinfo(np.int64).max // 2, dtype=np.int64)
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = abs(xs[i - 1] - ys[j - 1]) + min(
                dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
            )
    assert (row["n_x"], row["n_y"]) == (n, m)
    assert row["dtw_cost"] == int(dp[n][m])
    assert abs(row["dtw_per_step"] - dp[n][m] / (n + m)) < 1e-6
    # DTW is bounded above by the rigid same-index alignment
    rigid = sum(abs(a - b) for a, b in zip(xs, ys))
    assert row["dtw_cost"] <= rigid


# ---------------------------------------------------------------------------
# DQ audit: every rule replayed with python dicts/sets.
# ---------------------------------------------------------------------------

def test_dq_audit_matches_python_replay(spark):
    out = {r["rule"]: r for r in Q.QUERIES["olap_dq_audit"].fn(spark, SF).collect()}
    orders = raw(
        f"SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderdate FROM '{SF}/orders.parquet'"
    )
    li = raw(f"SELECT l_orderkey, l_shipdate FROM '{SF}/lineitem.parquet'")
    okeys = [o[0] for o in orders]
    odate = {o[0]: o[3] for o in orders}
    prio = {"1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"}
    expect = {
        "pk_unique_orders": (len(orders), len(orders) - len(set(okeys))),
        "fk_lineitem_orders": (len(li), sum(1 for k, _ in li if k not in odate)),
        "range_totalprice_positive": (len(orders), sum(1 for o in orders if o[1] <= 0)),
        "enum_orderpriority": (len(orders), sum(1 for o in orders if o[2] not in prio)),
        "not_null_orderdate": (len(orders), sum(1 for o in orders if o[3] is None)),
        "date_ship_after_order": (
            sum(1 for k, _ in li if k in odate),
            sum(1 for k, s in li if k in odate and s < odate[k]),
        ),
    }
    assert set(out) == set(expect)
    for rule, (checked, viol) in expect.items():
        r = out[rule]
        assert (r["n_checked"], r["n_violations"]) == (checked, viol), rule
        assert r["pass"] == (1 if viol == 0 else 0)
    # the synthetic generator honors referential integrity and pk rules
    assert out["pk_unique_orders"]["pass"] == 1
    assert out["fk_lineitem_orders"]["pass"] == 1


# ---------------------------------------------------------------------------
# Sort-order advisor: plain python sort replay + the design invariant
# (sorting by the predicate column beats the random key).
# ---------------------------------------------------------------------------

def test_sort_order_advisor_matches_python_replay(spark):
    out = {r["sort_key"]: r for r in Q.QUERIES["layout_sort_order_advisor"].fn(spark, SF).collect()}
    epoch = __import__("datetime").date(1970, 1, 1)
    rows = [
        (((ship.date() if hasattr(ship, "date") else ship) - epoch).days, ok, sk, ok * 10 + ln)
        for ok, sk, ln, ship in raw(
            f"SELECT l_orderkey, l_suppkey, l_linenumber, l_shipdate FROM '{SF}/lineitem.parquet'"
        )
    ]
    n = len(rows)
    wglob = max(p for p, *_ in rows) - min(p for p, *_ in rows)
    for name, key in (("l_shipdate", 0), ("l_orderkey", 1), ("l_suppkey", 2)):
        order = sorted(rows, key=lambda t: (t[key], t[3]))
        zones = defaultdict(list)
        for rk, t in enumerate(order, start=1):
            zones[(rk - 1) * 64 // n].append(t[0])
        sum_zone = sum(max(ps) - min(ps) + 1 for ps in zones.values())
        r = out[name]
        assert r["n_files"] == len(zones)
        assert r["sum_zone_width"] == sum_zone - len(zones)
        assert r["expected_scan_ppm"] == sum_zone * 1000000 // (len(zones) * (wglob + 1))
    # design invariant: predicate-column sort collapses zones; the
    # uncorrelated key is strictly worse, natural order in between
    assert (
        out["l_shipdate"]["expected_scan_ppm"]
        < out["l_suppkey"]["expected_scan_ppm"]
    )


# ---------------------------------------------------------------------------
# MinHash band tuning: full python MinHash replay (shingles -> signatures
# -> per-config buckets) plus the S-curve threshold identities.
# ---------------------------------------------------------------------------

def test_band_tuning_matches_minhash_replay(spark):
    from etl_consumer_spark.extensions.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    out = {r["bands"]: r for r in Q.QUERIES["dedup_minhash_band_tuning"].fn(spark, SF).collect()}
    sigs = {}
    for doc_id, text in raw(f"SELECT doc_id, text FROM '{SF}/documents.parquet'"):
        ws = re.split(r"\s+", text.strip())
        grams = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)} if len(ws) >= 3 else set()
        if not grams:
            continue
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % MINHASH_P for g in grams]
        sigs[doc_id] = [min((a * h + b) % MINHASH_P for h in hs) for a, b in zip(MINHASH_A, MINHASH_B)]
    for bands in (8, 4, 2):
        r = 8 // bands
        buckets = defaultdict(int)
        for sig in sigs.values():
            for b in range(bands):
                buckets[(b, tuple(sig[b * r : (b + 1) * r]))] += 1
        row = out[bands]
        assert row["rows_per_band"] == r
        assert row["n_buckets"] == len(buckets)
        assert row["max_bucket"] == max(buckets.values())
        assert row["probe_pairs"] == sum(c * (c - 1) // 2 for c in buckets.values())
        assert abs(row["s_threshold"] - (1 / bands) ** (1 / r)) < 1e-6
    # more bands of fewer rows = lower threshold = more candidate probes
    assert out[8]["s_threshold"] < out[4]["s_threshold"] < out[2]["s_threshold"]
    assert out[8]["probe_pairs"] >= out[2]["probe_pairs"]


# ---------------------------------------------------------------------------
# RLE runs: byte-exact replay over the synthesized raster.
# ---------------------------------------------------------------------------

def test_rle_runs_matches_byte_replay(spark):
    out = {r["media_id"]: r for r in Q.QUERIES["mm_image_rle_runs"].fn(spark, SF).collect()}
    expect = {}
    for doc_id, text in raw(f"SELECT doc_id, text FROM '{SF}/documents.parquet'"):
        _, ras = _raster(text)
        runs = []
        cur = 1
        for i in range(1, len(ras)):
            if ras[i] == ras[i - 1]:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        expect[doc_id] = (len(ras), len(runs), max(runs), len(runs) * 1000000 // len(ras))
    assert set(out) == set(expect) and expect
    for doc_id, (nb, nr, mx, ppm) in expect.items():
        r = out[doc_id]
        assert (r["n_bytes"], r["n_runs"], r["max_run"], r["rle_ratio_ppm"]) == (nb, nr, mx, ppm)
