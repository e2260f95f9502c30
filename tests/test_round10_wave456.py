"""Round-10 wave-4..6 replay tests (VERDICT r10 #3): independent
Python/numpy recomputation of the 12 `_R11_BACKLOG` queries' statistics
from the raw parquet rows. Where the query unrolls an algorithm (MMR's
three greedy steps, median polish's two sweeps), the replay runs the
GENERIC loop form, so an unrolling mistake cannot self-confirm.
See test_round10_wave123.py for the shared replay conventions."""

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
# HMM forward filter: the scaled-forward recursion replayed as a plain loop.
# ---------------------------------------------------------------------------

def test_hmm_forward_matches_python_replay(spark):
    out = {
        r["user_id"]: r for r in Q.QUERIES["analytic_hmm_forward"].fn(spark, SF).collect()
    }
    series = defaultdict(list)
    for uid, ts, eid, val in raw(
        f"SELECT user_id, ts, event_id, value FROM '{SF}/events.parquet'"
    ):
        series[uid].append((ts, eid, 1.0 if val > 500 else 0.0))
    expect = {}
    for uid, evs in series.items():
        if len(evs) < 5:
            continue
        evs.sort(key=lambda t: (t[0], t[1]))
        a1, a2, sc = 0.5, 0.5, 0.0
        for _, _, x in evs:
            b1 = 0.2 if x > 0.5 else 0.8
            b2 = 0.6 if x > 0.5 else 0.4
            n1 = (a1 * 0.8 + a2 * 0.3) * b1
            n2 = (a1 * 0.2 + a2 * 0.7) * b2
            if n1 + n2 < 1e-9:
                a1, a2, sc = n1 * 1e9, n2 * 1e9, sc + 1.0
            else:
                a1, a2 = n1, n2
        expect[uid] = (len(evs), a2 / (a1 + a2), int(sc))
    assert set(out) == set(expect) and expect
    for uid, (n, p_high, n_rescales) in expect.items():
        r = out[uid]
        assert r["n_events"] == n and r["n_rescales"] == n_rescales
        assert abs(r["p_high_regime"] - p_high) < 1e-9
        assert 0.0 <= r["p_high_regime"] <= 1.0


# ---------------------------------------------------------------------------
# Shewhart X-bar/R: subgroup stats and control flags replayed exactly.
# ---------------------------------------------------------------------------

def test_shewhart_xbar_matches_python_replay(spark):
    out = {r["day"]: r for r in Q.QUERIES["analytic_shewhart_xbar"].fn(spark, SF).collect()}
    days = defaultdict(list)
    for day, val in raw(
        f"SELECT day(ts), value FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ):
        days[day].append(int(sql_round(val * 100)))
    sub = {
        d: (
            len(cs),
            int(sql_round(float(sum(cs)) / len(cs) * 1000000)),
            max(cs) - min(cs),
        )
        for d, cs in days.items()
    }
    cl = float(sum(m for _, m, _ in sub.values())) / len(sub)
    rbar = float(sum(r for _, _, r in sub.values())) / len(sub)
    assert set(out) == set(sub) and sub
    n_ooc = 0
    for d, (n, mean_micro, rng) in sub.items():
        r = out[d]
        assert r["n_samples"] == n and r["range_cents"] == rng
        assert abs(r["day_mean_cents"] - mean_micro / 1000000.0) < 1e-6
        assert abs(r["center_line_cents"] - cl / 1000000.0) < 1e-6
        ooc = 1 if abs(mean_micro - cl) > 0.153 * rbar * 1000000 else 0
        assert r["out_of_control"] == ooc
        n_ooc += ooc
    # limits derived from the data itself: most days must be in control
    assert n_ooc < len(sub)


# ---------------------------------------------------------------------------
# Nelson-Aalen: cumulative hazard replayed from explicit at-risk counts;
# cross-checked against Kaplan-Meier via -ln(S) >= H relation bound-free
# sanity (H nondecreasing, increments = d/n).
# ---------------------------------------------------------------------------

def test_nelson_aalen_matches_python_replay(spark):
    out = {
        r["duration_days"]: r
        for r in Q.QUERIES["analytic_nelson_aalen"].fn(spark, SF).collect()
    }
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
    h = 0.0
    at_risk = n_all
    prev_h = -1.0
    for dur in sorted(byd):
        n_total, n_events = byd[dur]
        h += n_events / at_risk
        r = out[dur]
        assert r["n_events"] == n_events and r["n_at_risk"] == at_risk
        assert abs(r["cumulative_hazard"] - h) < 1e-9
        assert r["cumulative_hazard"] >= prev_h  # hazard never decreases
        prev_h = r["cumulative_hazard"]
        at_risk -= n_total
    assert set(out) == set(byd) and byd


# ---------------------------------------------------------------------------
# Truncated importance weights: clip, mass and ESS replayed with exact ints.
# ---------------------------------------------------------------------------

def test_importance_truncation_matches_python_replay(spark):
    out = {
        r["source"]: r
        for r in Q.QUERIES["sample_importance_truncation"].fn(spark, SF).collect()
    }
    per = defaultdict(lambda: [0, 0, 0, 0])  # n, mass, clipped, sumsq_div
    for src, n_chars in raw(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet' WHERE n_chars > 0"
    ):
        wm = int(sql_round(min(2000.0 / n_chars, 3.0) * 1000000))
        per[src][0] += 1
        per[src][1] += wm
        per[src][2] += 1 if 2000.0 / n_chars > 3.0 else 0
        per[src][3] += wm * wm // 1000000
    assert set(out) == set(per) and per
    for src, (n, mass, clipped, ssq) in per.items():
        r = out[src]
        assert (r["n_docs"], r["weight_mass_micro"], r["n_clipped"]) == (n, mass, clipped)
        ess = sql_round(float(mass) * mass / ssq, 6) / 1000000.0
        assert abs(r["ess"] - ess) < 1e-9
        # ESS is capped by the group size and positive
        assert 0.0 < r["ess"] <= n + 1e-9


# ---------------------------------------------------------------------------
# Bitmap index audit: masks, popcounts and the partition invariant replayed
# with python ints.
# ---------------------------------------------------------------------------

def test_bitmap_index_matches_python_replay(spark):
    out = {
        r["o_orderpriority"]: r
        for r in Q.QUERIES["layout_bitmap_index"].fn(spark, SF).collect()
    }
    masks = defaultdict(int)
    rows = defaultdict(set)
    for pri, k in raw(
        f"SELECT o_orderpriority, o_orderkey FROM '{SF}/orders.parquet'"
    ):
        masks[(pri, k // 32)] |= 1 << (k % 32)
        rows[(pri, k // 32)].add(k)
    per_pri = defaultdict(lambda: [0, 0, 0])
    orw = defaultdict(int)
    for (pri, blk), m in masks.items():
        per_pri[pri][0] += 1
        per_pri[pri][1] += bin(m).count("1")
        per_pri[pri][2] += len(rows[(pri, blk)])
        orw[blk] |= m
    or_bits = sum(bin(m).count("1") for m in orw.values())
    n_keys = len({k for s in rows.values() for k in s})
    assert set(out) == set(per_pri) and per_pri
    for pri, (nb, bits, exact) in per_pri.items():
        r = out[pri]
        assert (r["n_blocks"], r["n_set_bits"], r["n_rows_exact"]) == (nb, bits, exact)
        assert r["popcount_matches"] == (1 if bits == exact else 0)
        assert r["popcount_matches"] == 1  # keys are unique, so always exact
        assert (r["union_bits"], r["n_keys_exact"]) == (or_bits, n_keys)
    # priorities partition the keys: OR-popcount equals distinct keys
    assert or_bits == n_keys


# ---------------------------------------------------------------------------
# Heaps law: vocabulary growth replayed with python sets over bucket
# prefixes (the direct 10-pass definition, not the min-bucket shortcut).
# ---------------------------------------------------------------------------

def test_heaps_law_matches_direct_prefix_replay(spark):
    out = {
        r["prefix_decile"]: r for r in Q.QUERIES["text_heaps_law"].fn(spark, SF).collect()
    }
    buckets = defaultdict(list)
    for doc_id, text in raw(f"SELECT doc_id, text FROM '{SF}/documents.parquet'"):
        buckets[md5_u32(f"hp{doc_id}") % 10].append(re.split(r"\s+", text.strip().lower()))
    # direct definition: cumulative token count and cumulative DISTINCT
    # vocabulary over growing bucket prefixes — the query's min-first-bucket
    # shortcut must agree with this 10-pass recomputation
    n_cum = 0
    vocab = set()
    pts = []
    for b in range(10):
        for ws in buckets.get(b, []):
            n_cum += len(ws)
            vocab.update(ws)
        if n_cum > 0 and len(vocab) > 0:
            pts.append((b, n_cum, len(vocab)))
    lx = [int(sql_round(math.log(n) * 1000000)) for _, n, _ in pts]
    ly = [int(sql_round(math.log(v) * 1000000)) for _, _, v in pts]
    npn = len(pts)
    sx, sy = sum(lx), sum(ly)
    sxy = sum(x * y for x, y in zip(lx, ly))
    sxx = sum(x * x for x in lx)
    beta = (npn * sxy - float(sx) * sy) / (npn * sxx - float(sx) * sx)
    assert set(out) == {b for b, _, _ in pts} and pts
    for b, n, v in pts:
        r = out[b]
        assert (r["n_tokens_cum"], r["vocab_cum"]) == (n, v)
        assert abs(r["heaps_beta"] - beta) < 1e-6
    # Heaps exponent sits in [0, 1): the sf0.001 synthetic corpus saturates
    # its 31-word vocabulary in the first prefix, so beta is exactly 0 here;
    # it only turns strictly positive when the vocabulary actually grows
    assert 0.0 <= beta < 1.0
    vocabs = [v for _, _, v in pts]
    if vocabs[-1] > vocabs[0]:
        assert beta > 0.0


# ---------------------------------------------------------------------------
# MMR rerank: the generic greedy loop (any k) replayed with numpy dots —
# the query unrolls exactly 3 steps, so an unrolling slip cannot hide.
# ---------------------------------------------------------------------------

def test_mmr_rerank_matches_generic_greedy_replay(spark):
    out = {
        (r["query_id"], r["pick"]): r
        for r in Q.QUERIES["sim_mmr_rerank"].fn(spark, SF).collect()
    }
    emb = {
        vid: [float(x) for x in vec]
        for vid, vec in raw(f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'")
    }

    def dot_micro(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return int(sql_round(acc * 1000000))

    expect = {}
    for qid in [v for v in emb if v < 20]:
        rel = {c: dot_micro(emb[qid], emb[c]) for c in emb if c != qid}
        c8 = sorted(rel, key=lambda c: (-rel[c], c))[:8]
        sims = {(a, b): dot_micro(emb[a], emb[b]) for a in c8 for b in c8 if a != b}
        picked = []
        for pick in range(1, 4):
            if pick == 1:
                best = c8[0]
                score = 7 * rel[best]
            else:
                cands = [c for c in c8 if c not in picked]
                scored = [
                    (7 * rel[c] - 3 * max(sims[(c, p)] for p in picked), c)
                    for c in cands
                ]
                score, best = max(scored, key=lambda t: (t[0], -t[1]))
            picked.append(best)
            expect[(qid, pick)] = (best, score)
    assert set(out) == set(expect) and expect
    for key, (sel, score) in expect.items():
        assert (out[key]["selected_id"], out[key]["score_x10micro"]) == (sel, score)


# ---------------------------------------------------------------------------
# Median polish: the generic alternating-sweep loop replayed with numpy
# medians over an explicit 5x12 matrix.
# ---------------------------------------------------------------------------

def test_median_polish_matches_numpy_replay(spark):
    res = Q.QUERIES["analytic_median_polish"].fn(spark, SF).collect()
    out = {(r["kind"], r["key"]): r["effect"] for r in res}
    cells = {}
    for pri, m, cents in raw(
        f"""SELECT o_orderpriority, month(o_orderdate),
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FROM '{SF}/orders.parquet' GROUP BY 1, 2"""
    ):
        cells[(pri, m)] = float(cents)
    pris = sorted({p for p, _ in cells})
    assert len(pris) == 5 and len(cells) == 60, "matrix must be complete 5x12"
    mat = np.array([[cells[(p, m)] for m in range(1, 13)] for p in pris])
    r_eff = np.zeros(5)
    c_eff = np.zeros(12)
    for _ in range(2):  # two full row+column sweeps, generic loop form
        rm = np.median(mat, axis=1)
        mat = mat - rm[:, None]
        r_eff += rm
        cm = np.median(mat, axis=0)
        mat = mat - cm[None, :]
        c_eff += cm
    resid = np.abs(mat).sum()
    for i, p in enumerate(pris):
        assert abs(out[("row", p)] - r_eff[i]) < 1e-6
    for j in range(12):
        assert abs(out[("col", str(j + 1))] - c_eff[j]) < 1e-6
    assert abs(out[("resid", "total_abs")] - resid) < 1e-4


# ---------------------------------------------------------------------------
# Bloom semi-join reduction: the PLAIN join replayed with python dicts —
# the Bloom prefilter must be invisible in the result.
# ---------------------------------------------------------------------------

def test_semijoin_bloom_reduction_matches_plain_join_replay(spark):
    out = {
        r["n_name"]: r
        for r in Q.QUERIES["olap_semijoin_bloom_reduction"].fn(spark, SF).collect()
    }
    nat = dict(raw(f"SELECT n_nationkey, n_name FROM '{SF}/nation.parquet'"))
    sup = {
        sk: nat[nk]
        for sk, nk in raw(f"SELECT s_suppkey, s_nationkey FROM '{SF}/supplier.parquet'")
        if nat[nk] in ("NATION_3", "NATION_7")
    }
    agg = defaultdict(lambda: [0, 0])
    for sk, price in raw(
        f"SELECT l_suppkey, l_extendedprice FROM '{SF}/lineitem.parquet'"
    ):
        if sk in sup:
            agg[sup[sk]][0] += 1
            agg[sup[sk]][1] += int(sql_round(price * 100))
    assert set(out) == set(agg) and agg
    for name, (n, cents) in agg.items():
        assert (out[name]["n_lineitems"], out[name]["revenue_cents"]) == (n, cents)


# ---------------------------------------------------------------------------
# Incremental view maintenance: delta-maintained view replayed and checked
# against an independently recomputed post-apply state.
# ---------------------------------------------------------------------------

def test_view_maintenance_matches_python_replay(spark):
    out = {
        r["o_orderpriority"]: r
        for r in Q.QUERIES["cdc_view_maintenance"].fn(spark, SF).collect()
    }
    orders = raw(
        f"SELECT o_orderpriority, o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"
    )
    # the applied state, simulated row by row (the "truth" the view must hit)
    state = defaultdict(lambda: [0, 0])
    for pri, k, price in orders:
        if k % 4 == 1:
            continue  # deleted
        cents = int(sql_round(price * 100)) + (1000 if k % 4 == 0 else 0)
        state[pri][0] += 1
        state[pri][1] += cents
    assert set(out) == set(state) and state
    for pri, (n, cents) in state.items():
        r = out[pri]
        assert (r["n_orders"], r["revenue_cents"]) == (n, cents)
        assert r["matches_recompute"] == 1


# ---------------------------------------------------------------------------
# Median-cut palette: histogram, weighted-median cut, palette and L1 error
# replayed from the synthesized raster bytes.
# ---------------------------------------------------------------------------

def test_palette_mediancut_matches_byte_replay(spark):
    out = {
        r["media_id"]: r
        for r in Q.QUERIES["mm_image_palette_mediancut"].fn(spark, SF).collect()
    }
    expect = {}
    for doc_id, text in raw(f"SELECT doc_id, text FROM '{SF}/documents.parquet'"):
        _, ras = _raster(text)
        hist = defaultdict(int)
        for byte in ras:
            hist[byte] += 1
        n = len(ras)
        c = 0
        cut = None
        for v in sorted(hist):
            c += hist[v]
            if 2 * c >= n:
                cut = v
                break
        lo = {v: k for v, k in hist.items() if v <= cut}
        hi = {v: k for v, k in hist.items() if v > cut}
        n_lo, s_lo = sum(lo.values()), sum(v * k for v, k in lo.items())
        n_hi, s_hi = sum(hi.values()), sum(v * k for v, k in hi.items())
        pal_lo = s_lo // n_lo
        pal_hi = s_hi // n_hi if n_hi > 0 else None
        l1 = sum(
            k * abs(v - (pal_lo if v <= cut else pal_hi)) for v, k in hist.items()
        )
        expect[doc_id] = (cut, pal_lo, pal_hi, n_lo, n_hi, l1)
    assert set(out) == set(expect) and expect
    for doc_id, (cut, pal_lo, pal_hi, n_lo, n_hi, l1) in expect.items():
        r = out[doc_id]
        assert (r["cut_value"], r["pal_lo"], r["pal_hi"], r["n_lo"], r["n_hi"], r["l1_error"]) == (
            cut, pal_lo, pal_hi, n_lo, n_hi, l1
        )
        # palette ordering invariant: lo mean <= cut < hi mean
        assert pal_lo <= cut and (pal_hi is None or pal_hi > cut)


# ---------------------------------------------------------------------------
# Runs test: sign sequence, run count and z replayed; the median is
# recomputed with numpy's linear interpolation.
# ---------------------------------------------------------------------------

def test_runs_test_matches_python_replay(spark):
    row = Q.QUERIES["analytic_runs_test"].fn(spark, SF).collect()[0]
    days = defaultdict(int)
    for (d,) in raw(
        f"SELECT day(ts) FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ):
        days[d] += 1
    counts = [days[d] for d in sorted(days)]
    med = float(np.percentile(np.array(counts, dtype=float), 50))
    sg = [1 if c > med else 0 for c in counts]
    n1 = sum(sg)
    n2 = len(sg) - n1
    runs = 1 + sum(1 for a, b in zip(sg, sg[1:]) if a != b)
    assert (row["n_days"], row["n1"], row["n2"], row["runs"]) == (len(sg), n1, n2, runs)
    exp_runs = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    assert abs(row["expected_runs"] - exp_runs) < 1e-9
    if n1 > 0 and n2 > 0 and n1 + n2 > 1:
        z = (runs - exp_runs) / math.sqrt(
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / (float(n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
        )
        assert abs(row["z_score"] - z) < 1e-9
    else:
        assert row["z_score"] is None
