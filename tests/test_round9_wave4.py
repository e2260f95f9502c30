"""Round-9 wave-4 targeted tests: invariants and independent replays for
the per-day Elo ladder, the Delta-style change data feed, item-item CF,
word burstiness, and the Gram-matrix power iteration (numpy spectral
differential)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

import etl_consumer_spark.plans.queries as Q

SF = "/root/testdata/sf0.001"


def test_elo_per_day_zero_sum_and_gradient(spark):
    rows = Q.QUERIES["analytic_elo_per_day"].fn(spark, SF).collect()
    per_day = defaultdict(dict)
    for r in rows:
        per_day[r["day"]][r["player"]] = r["rating"]
    assert len(per_day) > 0
    for day, ratings in per_day.items():
        assert len(ratings) == 16
        # both players move by the same quantized delta -> exact zero sum
        assert abs(sum(ratings.values()) - 16000.0) < 1e-3, day
    # matches are skill-graded: pooled mean rating must rise with index
    pooled = defaultdict(list)
    for ratings in per_day.values():
        for p, v in ratings.items():
            pooled[p].append(v)
    means = {p: sum(v) / len(v) for p, v in pooled.items()}
    low = sum(means[p] for p in range(4)) / 4
    high = sum(means[p] for p in range(12, 16)) / 4
    assert high > low + 10, f"skill gradient not visible: {low:.1f} vs {high:.1f}"


def test_change_data_feed_image_pairing_and_replay(spark):
    import duckdb

    rows = Q.QUERIES["cdc_change_data_feed"].fn(spark, SF).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["_change_type"]].append(r)
    pre = {r["k"] for r in by_type["update_preimage"]}
    post = {r["k"] for r in by_type["update_postimage"]}
    assert pre == post, "every update must emit both images"
    ins = {r["k"] for r in by_type["insert"]}
    dele = {r["k"] for r in by_type["delete"]}
    assert not (ins & dele) and not (ins & pre) and not (dele & pre)
    # independent replay of the version semantics
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"
    ).fetchall()
    maxk = max(k for k, _ in orders)

    def state(limit):
        log = []
        for k, v in orders:
            if k % 4 != 3:
                log.append((k, k * 2, "upsert", v))
            if k % 16 == 1:
                log.append((k, k * 2 + 1, "delete", None))
            if k % 8 == 2:
                log.append((k, k * 2 + 2, "upsert", v + 77.0))
        latest = {}
        for k, pos, op, v in log:
            if pos <= limit and (k not in latest or pos > latest[k][0]):
                latest[k] = (pos, op, v)
        return {k: v for k, (pos, op, v) in latest.items() if op == "upsert"}

    v1, v2 = state(maxk), state(float("inf"))
    assert ins == set(v2) - set(v1)
    assert dele == set(v1) - set(v2)
    assert pre == {k for k in set(v1) & set(v2) if v1[k] != v2[k]}


def test_item_item_cf_cosine_replay(spark):
    import duckdb

    rows = Q.QUERIES["analytic_item_item_cf"].fn(spark, SF).collect()
    assert rows
    con = duckdb.connect()
    baskets = con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey % 200 FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    orders_of = defaultdict(set)
    for o, item in baskets:
        orders_of[item].add(o)
    for r in rows[:50]:
        co = len(orders_of[r["item"]] & orders_of[r["neighbor"]])
        assert r["n_co_orders"] == co
        expect = co / (len(orders_of[r["item"]]) * len(orders_of[r["neighbor"]])) ** 0.5
        assert abs(r["cosine"] - expect) < 1e-6
        assert 0 < r["cosine"] <= 1
        assert 1 <= r["rnk"] <= 5


def test_burstiness_vmr_replay(spark):
    import duckdb

    rows = Q.QUERIES["text_burstiness"].fn(spark, SF).collect()
    assert len(rows) <= 20 and rows
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lower(trim(text)) FROM '{SF}/documents.parquet'"
    ).fetchall()
    n_docs = len(docs)
    top = rows[0]
    counts = []
    for _, text in docs:
        counts.append(text.split().count(top["word"]))
    c = np.array(counts, dtype=np.float64)
    vmr = c.var(ddof=1) / c.mean()
    assert abs(top["vmr"] - vmr) < 1e-6
    assert top["df"] == int((c > 0).sum())
    # ranking is strictly rank-consecutive
    assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == list(
        range(1, len(rows) + 1)
    )


def test_gram_power_iteration_matches_numpy_spectrum(spark):
    import duckdb

    rows = sorted(
        Q.QUERIES["sim_gram_power_iteration"].fn(spark, SF).collect(),
        key=lambda r: r["component"],
    )
    assert len(rows) == 64
    con = duckdb.connect()
    emb = con.execute(f"SELECT embedding FROM '{SF}/embeddings.parquet'").fetchall()
    Qm = np.array([[round(x * 1000) for x in e] for (e,) in emb], dtype=np.int64)
    G = (Qm.T @ Qm).astype(np.float64)
    # replay the registered fold: 64 UN-normalized steps on the
    # trace-scaled matrix, one final normalization, Rayleigh * trace
    tr = float(np.trace(G))
    Gs = G / tr
    v = np.full(64, 0.125)
    for _ in range(64):
        v = Gs @ v
    v = v / np.sqrt((v * v).sum())
    lam = (v @ (Gs @ v)) * tr
    got_v = np.array([r["eigvec"] for r in rows])
    assert np.max(np.abs(got_v - v)) < 1e-6
    assert abs(rows[0]["eigenvalue"] - lam) < 1e-2
    # convergence: Rayleigh quotient within 0.1% of the true top eigenvalue
    true_top = np.linalg.eigvalsh(G).max()
    assert abs(lam - true_top) / true_top < 1e-3
    # unit norm
    assert abs((got_v * got_v).sum() - 1.0) < 1e-6
