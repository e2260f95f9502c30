"""Round-7 operator tests: Sobel edges vs an independent numpy replay,
Holt recurrence vs a plain-Python fold, Kaplan-Meier invariants, mixture
solver feasibility, modularity/assortativity structure checks, seasonal
decomposition identity, and the F8 full-map generation guard."""

from __future__ import annotations

import hashlib

import numpy as np

from etl_consumer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_sobel_matches_numpy(spark):
    """Registered kernel vs a direct numpy convolution on the same
    synthesized rasters (independent of the kernel's slice algebra)."""
    import pandas as pd

    got = {
        r["media_id"]: r
        for r in QUERIES["mm_image_sobel_edges"].fn(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, d in docs.head(25).iterrows():
        hx = hashlib.md5(d.text.encode()).hexdigest()
        w = 8 + len(d.text) % 8
        ras = (hx * 6)[: w * 12]
        g = np.array([ord(c) for c in ras], dtype=np.int64).reshape(4, w, 3)[:, :, 0]
        kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]])
        ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]])
        mags = []
        for r_ in range(1, 3):
            for c_ in range(1, w - 1):
                win = g[r_ - 1 : r_ + 2, c_ - 1 : c_ + 2]
                mags.append(abs(int((kx * win).sum())) + abs(int((ky * win).sum())))
        row = got[d.doc_id]
        assert row["n_interior"] == 2 * (w - 2)
        assert row["grad_sum"] == sum(mags)
        assert row["grad_md5"] == hashlib.md5(
            ",".join(map(str, mags)).encode()
        ).hexdigest()


def test_holt_matches_python_fold(spark):
    rows = QUERIES["analytic_holt_winters"].fn(spark, SF).collect()
    assert rows
    # replay one series in plain python
    from etl_consumer_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF, "events")
        .orderBy("ts", "event_id")
        .select("user_id", "value")
        .collect()
    )
    series: dict[int, list[float]] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(r.value)
    for row in rows[:10]:
        vs = series[row.user_id]
        l, b = vs[0], vs[1] - vs[0]
        for v in vs[2:]:
            nl = 0.5 * v + 0.5 * l + 0.5 * b
            b = 0.25 * v - 0.25 * l + 0.75 * b
            l = nl
        assert abs(row.level_final - l) < 1e-9
        assert abs(row.trend_final - b) < 1e-9
        assert abs(row.forecast_next - (l + b)) < 1e-9


def test_kaplan_meier_monotone_and_bounded(spark):
    rows = sorted(
        QUERIES["analytic_kaplan_meier"].fn(spark, SF).collect(),
        key=lambda r: r.t,
    )
    assert rows, "no death times at sf0.001"
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.km_survival <= prev + 1e-12  # non-increasing in t
        assert r.n_deaths >= 1 and r.n_risk >= r.n_deaths
        prev = r.km_survival


def test_mixture_solver_exact_proportions(spark):
    from etl_consumer_spark.plans.queries import _MIX_WEIGHTS

    rows = QUERIES["sample_mixture_solver"].fn(spark, SF).collect()
    by_lang: dict[str, int] = {}
    quota = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
        quota[r.lang] = r.lang_quota
    w = dict(_MIX_WEIGHTS)
    for lang, n in by_lang.items():
        assert n == quota[lang], "quota not met exactly"
    # kept counts follow the weights: k_l == floor(w_l * T / 10) for one T
    ts = {lang: by_lang[lang] * 10 // w[lang] for lang in by_lang}
    t_est = max(ts.values())
    for lang, n in by_lang.items():
        assert n == w[lang] * t_est // 10 or n == quota[lang]


def test_modularity_sums_and_range(spark):
    rows = QUERIES["graph_modularity"].fn(spark, SF).collect()
    assert len(rows) == 8
    q = sum(r.q_contrib for r in rows)
    assert -1.0 <= q <= 1.0
    # degree sums add to 2m; intra edges cannot exceed m
    total_deg = sum(r.degree_sum for r in rows)
    total_intra = sum(r.intra_edges for r in rows)
    assert total_deg % 2 == 0 and total_intra <= total_deg // 2


def test_assortativity_in_range(spark):
    row = QUERIES["graph_assortativity"].fn(spark, SF).collect()[0]
    assert -1.0 - 1e-9 <= row.assortativity <= 1.0 + 1e-9
    assert row.n_directed_edges > 0 and row.n_directed_edges % 2 == 0  # 2m entries
    # Cauchy-Schwarz on the correlation pieces
    assert row.sum_deg_sq * row.n_directed_edges >= row.sum_deg * row.sum_deg


def test_seasonal_decompose_identity(spark):
    rows = QUERIES["analytic_seasonal_decompose"].fn(spark, SF).collect()
    assert rows
    # total == seasonal + residual per day, and residuals sum ~0 per dow
    by_dow: dict[int, float] = {}
    for r in rows:
        assert abs((r.seasonal + r.residual) - r.total) < 1e-9
        by_dow[r.dow] = by_dow.get(r.dow, 0.0) + r.residual
    for s in by_dow.values():
        assert abs(s) < 1e-6


def test_f8_full_charmap_literal_covers_every_entry():
    from etl_consumer_spark.functions.text import (
        _DELETIONS, _MULTI_REPLACEMENTS, _SUBSTITUTIONS,
    )
    from etl_consumer_spark.plans.queries import _F8_FULL_CHAIN, _F8_FULL_LIT

    for src, _ in _MULTI_REPLACEMENTS + _SUBSTITUTIONS:
        assert src in _F8_FULL_LIT
    for ch in _DELETIONS:
        assert ch in _F8_FULL_LIT
    n_entries = len(_MULTI_REPLACEMENTS) + len(_SUBSTITUTIONS) + len(_DELETIONS)
    assert _F8_FULL_CHAIN.count("replace(") == n_entries


def test_audio_downsample_matches_numpy(spark):
    """Kernel decimation vs direct numpy block sums on the md5 signal."""
    import pandas as pd

    got = {
        r["media_id"]: r
        for r in QUERIES["mm_audio_downsample"].fn(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, d in docs.head(25).iterrows():
        hx = hashlib.md5(d.text.encode()).hexdigest()
        v = np.array([ord(c) - 77 for c in hx], dtype=np.int64)
        blocks = v.reshape(-1, 2).sum(axis=1)
        r = got[d.doc_id]
        assert r["out_rate"] == 8000 and r["n_out"] == 16
        assert r["sum_abs"] == int(np.abs(blocks).sum())
        assert r["peak"] == int(np.abs(blocks).max())
        assert r["ds_md5"] == hashlib.md5(
            ",".join(str(int(x)) for x in blocks).encode()
        ).hexdigest()


def test_dsir_resample_favors_target_lang(spark):
    """The resample keys derive from exp(importance): the kept set's mean
    importance must exceed the corpus mean (the whole point of DSIR)."""
    imp = {
        r.doc_id: r.avg_importance
        for r in QUERIES["text_dsir_importance"].fn(spark, SF).collect()
    }
    kept = QUERIES["sample_dsir_resample"].fn(spark, SF).collect()
    assert len(kept) == 64
    corpus_mean = sum(imp.values()) / len(imp)
    kept_mean = sum(r.avg_importance for r in kept) / len(kept)
    assert kept_mean > corpus_mean


def test_jsonl_corrupt_counts(spark):
    row = QUERIES["source_jsonl_corrupt_records"].fn(spark, SF).collect()[0]
    assert row.n_good > 0 and row.n_corrupt > 0
    # every 7th doc (doc_id % 7 == 6) is corrupted
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert row.n_corrupt == int((docs.doc_id % 7 == 6).sum())
    assert row.n_good == len(docs) - row.n_corrupt
