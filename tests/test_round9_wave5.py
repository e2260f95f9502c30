"""Round-9 wave-5 targeted tests: python replays for Dunning LLR
collocations, the Mann-Kendall/Sen trend readout, and pixel-entropy QA."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import etl_consumer_spark.plans.queries as Q

SF = "/root/testdata/sf0.001"


def test_gtest_llr_replay_and_nonnegative(spark):
    import duckdb

    rows = Q.QUERIES["analytic_gtest_collocations"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT lower(trim(text)) FROM '{SF}/documents.parquet'"
    ).fetchall()
    pairs = []
    for (t,) in texts:
        ws = [w for w in __import__("re").split(r"[^a-z]+", t)]
        pairs.extend(
            (a, b)
            for a, b in zip(ws, ws[1:])
            if len(a) >= 2 and len(b) >= 2
        )
    n = len(pairs)
    c_ab = Counter(pairs)
    c_a = Counter(a for a, _ in pairs)
    c_b = Counter(b for _, b in pairs)

    def llr(a, b):
        o11 = c_ab[(a, b)]
        o12 = c_a[a] - o11
        o21 = c_b[b] - o11
        o22 = n - c_a[a] - c_b[b] + o11
        e11 = c_a[a] * c_b[b] / n
        e12 = c_a[a] * (n - c_b[b]) / n
        e21 = (n - c_a[a]) * c_b[b] / n
        e22 = (n - c_a[a]) * (n - c_b[b]) / n
        tot = 0.0
        for o, e in ((o11, e11), (o12, e12), (o21, e21), (o22, e22)):
            if o > 0:
                tot += o * math.log(o / e)
        return 2 * tot

    for r in rows:
        assert r["llr"] >= -1e-9, "LLR against the MLE alternative is nonnegative"
        assert abs(r["llr"] - llr(r["a"], r["b"])) < 1e-5
    # descending order with deterministic tie-break
    vals = [r["llr"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_mann_kendall_replay(spark):
    import duckdb

    rows = {
        r["event_type"]: r
        for r in Q.QUERIES["analytic_mann_kendall"].fn(spark, SF).collect()
    }
    assert len(rows) == 5
    con = duckdb.connect()
    for et, row in list(rows.items())[:2]:
        daily = con.execute(
            f"""SELECT day(ts), sum(CAST(round(value * 100) AS BIGINT))
                FROM '{SF}/events.parquet' WHERE event_type = '{et}'
                GROUP BY 1 ORDER BY 1"""
        ).fetchall()
        ds = [d for d, _ in daily]
        xs = [x for _, x in daily]
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        z = (s - 1) / math.sqrt(var_s) if s > 0 else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
        slopes = sorted(
            (xs[j] - xs[i]) / (ds[j] - ds[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        m = len(slopes)
        sen = slopes[m // 2] if m % 2 == 1 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
        assert row["n_days"] == n
        assert row["s"] == s
        assert abs(row["z_stat"] - z) < 1e-6
        assert abs(row["sen_slope_per_day"] - sen / 100.0) < 1e-6
        assert row["significant"] == int(abs(z) > 1.96)


def test_image_entropy_replay_and_bounds(spark):
    import duckdb

    rows = Q.QUERIES["mm_image_entropy"].fn(spark, SF).collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    )
    assert len(rows) == len(texts)
    for r in rows[:20]:
        text = texts[r["media_id"]]
        w = 8 + len(text) % 8
        ras = (hashlib.md5(text.encode()).hexdigest() * 6)[: w * 12]
        cnt = Counter(ras)
        n = len(ras)
        h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        assert r["n_px"] == n
        assert r["n_levels"] == len(cnt)
        assert abs(r["entropy_nats"] - h) < 1e-6
        # hex alphabet: at most 16 levels -> H <= ln(16)
        assert -1e-9 <= r["entropy_nats"] <= math.log(16) + 1e-9


def test_bigram_devices_survive_single_token_docs(spark):
    """Review regression: sequence(0, size-2) yields the DESCENDING
    [0, -1] for a 1-token array and ws[-1] throws under Spark-4 ANSI;
    the zip_with(slice, slice) form must degrade to an empty pair list
    instead. (Real corpora contain 1-word documents; the synthetic
    tables happen not to.)"""
    df = spark.createDataFrame([(["hello"],), (["a", "b", "c"],)], "ws array<string>")
    out = df.selectExpr(
        "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),"
        " slice(ws, 2, greatest(size(ws) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b)) AS bigrams"
    ).collect()
    got = {tuple(r["bigrams"]) for r in out}
    assert got == {(), ("a b", "b c")}
