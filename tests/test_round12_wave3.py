"""Round-12 wave-3 replay tests: ranking metrics, JSD, Halton and PMI
recomputed from raw parquet with plain python floats and no quantization
devices — the independent third implementation beside the dual texts."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import raw, sql_round

SF = "/root/testdata/sf0.001"


def _ranked_users():
    """Per user: events sorted by (cents desc, event_id asc), rel flags."""
    users = defaultdict(list)
    for uid, eid, v, et in raw(
        f"SELECT user_id, event_id, value, event_type FROM '{SF}/events.parquet'"
    ):
        users[uid].append((int(sql_round(v * 100)), eid, 1 if et == "purchase" else 0))
    return {
        u: [rel for _, _, rel in sorted(evs, key=lambda x: (-x[0], x[1]))]
        for u, evs in users.items()
    }


def test_ndcg_at10_matches_python_replay(spark):
    row = Q.QUERIES["analytic_ndcg_at10"].fn(spark, SF).collect()[0]
    total, n_users = 0.0, 0
    for rels in _ranked_users().values():
        r_tot = sum(rels)
        if r_tot == 0:
            continue
        n_users += 1
        dcg = sum(
            rel * math.log(2) / math.log(i + 2) for i, rel in enumerate(rels[:10])
        )
        idcg = sum(math.log(2) / math.log(i + 2) for i in range(min(10, r_tot)))
        total += dcg / idcg
    assert row["n_users"] == n_users
    # nano quantization of gains and per-user ratios: ~1e-9 per level
    assert abs(row["mean_ndcg_at10"] - total / n_users) < 1e-7
    assert 0 < row["mean_ndcg_at10"] <= 1


def test_mrr_at10_matches_python_replay(spark):
    row = Q.QUERIES["analytic_mrr_at10"].fn(spark, SF).collect()[0]
    ranked = _ranked_users()
    rr, hits = 0.0, 0
    for rels in ranked.values():
        top = rels[:10]
        if 1 in top:
            hits += 1
            # the engine stores floor(1e9/rank); replay the same floor
            rr += math.floor(1e9 / (top.index(1) + 1)) / 1e9
    assert row["n_users"] == len(ranked)
    assert row["n_hit"] == hits
    assert abs(row["mrr_at10"] - rr / len(ranked)) < 1e-9


def test_jsd_matches_python_replay(spark):
    row = Q.QUERIES["analytic_jsd_weekday_weekend"].fn(spark, SF).collect()[0]
    a, b = Counter(), Counter()
    for et, ts in raw(f"SELECT event_type, ts FROM '{SF}/events.parquet'"):
        (b if ts.weekday() >= 5 else a)[et] += 1
    ta, tb = sum(a.values()), sum(b.values())
    jsd = 0.0
    for g in set(a) | set(b):
        p, q = a[g] / ta, b[g] / tb
        m = (p + q) / 2
        if p:
            jsd += p * math.log(p / m) / 2
        if q:
            jsd += q * math.log(q / m) / 2
    assert (row["n_weekday"], row["n_weekend"]) == (ta, tb)
    assert abs(row["jsd_nats"] - jsd) < 1e-9
    assert abs(row["jsd_bits"] - jsd / math.log(2)) < 1e-9
    assert 0 <= row["jsd_nats"] <= math.log(2)  # JSD's hard bound


def _radical_inverse(i, base, digits):
    rev = 0
    for _ in range(digits):
        rev = rev * base + i % base
        i //= base
    return rev


def test_halton_qmc_matches_python_replay(spark):
    rows = {(r["cx"], r["cy"]): r["n_points"]
            for r in Q.QUERIES["sample_halton_qmc"].fn(spark, SF).collect()}
    keys = [k for (k,) in raw(
        f"SELECT p_partkey FROM '{SF}/part.parquet' WHERE p_partkey <= 1024"
    )]
    cells = Counter()
    for i in keys:
        cx = _radical_inverse(int(i), 2, 20) * 4 // 2**20
        cy = _radical_inverse(int(i), 3, 13) * 4 // 3**13
        cells[(cx, cy)] += 1
    assert rows == dict(cells)
    assert sum(rows.values()) == len(keys)
    # base-2/3 radical inverses stratify: every occupied row/col in range
    assert all(0 <= cx <= 3 and 0 <= cy <= 3 for cx, cy in rows)


def test_brier_online_matches_python_replay(spark):
    row = Q.QUERIES["analytic_brier_online"].fn(spark, SF).collect()[0]
    users = defaultdict(list)
    for uid, eid, ts, et in raw(
        f"SELECT user_id, event_id, ts, event_type FROM '{SF}/events.parquet'"
    ):
        users[uid].append((ts, eid, 1 if et == "purchase" else 0))
    n = r = 0
    sq = 0.0
    for evs in users.values():
        pp = pe = 0
        for _, _, y in sorted(evs):
            p = pp / pe if pe else 0.0
            sq += (p - y) ** 2
            n += 1
            r += y
            pp += y
            pe += 1
    rate = r / n
    assert (row["n_events"], row["n_purchases"]) == (n, r)
    assert abs(row["brier"] - sq / n) < 1e-6  # nano per-row quantization
    assert abs(row["brier_climatology"] - rate * (1 - rate)) < 1e-9
    assert abs(row["brier_skill"] - (1 - row["brier"] / row["brier_climatology"])) < 1e-6


def test_collocations_pmi_matches_python_replay(spark):
    rows = Q.QUERIES["text_collocations_pmi"].fn(spark, SF).collect()
    uni, big = Counter(), Counter()
    for (text,) in raw(f"SELECT text FROM '{SF}/documents.parquet'"):
        w = [t for t in __import__("re").split(r"\s+", text.strip().lower())]
        uni.update(w)
        big.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    scored = []
    for bg, cb in big.items():
        if cb < 5:
            continue
        w1, w2 = bg.split(" ")[0], bg.split(" ")[1]
        pmi = math.log((cb / n2) / ((uni[w1] / n1) * (uni[w2] / n1)))
        scored.append((-round(pmi * 1e6), bg, cb, pmi))
    scored.sort()
    top = scored[:20]
    assert len(rows) == min(20, len(scored))
    for r, (_, bg, cb, pmi) in zip(rows, top):
        assert (r["bigram"], r["n_cooccur"]) == (bg, cb)
        assert abs(r["pmi"] - pmi) < 1e-6
