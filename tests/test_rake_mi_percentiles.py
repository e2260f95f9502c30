"""Session-4 batch 2: RAKE keywords, entropy/MI, exact percentiles."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# RAKE: pure-Python reference on a tiny corpus
# ---------------------------------------------------------------------------

def _rake_ref(texts, stopwords={"a", "the"}, max_len=4):
    pw = []  # (doc, phrase_key, pos, word)
    for d, text in enumerate(texts):
        pid = 0
        for pos, word in enumerate(text.split(" ")):
            if word in stopwords:
                pid += 1
            else:
                pw.append((d, pid, pos, word))
    from collections import defaultdict

    plen = defaultdict(int)
    for d, pid, _, _ in pw:
        plen[(d, pid)] += 1
    pw = [r for r in pw if plen[(r[0], r[1])] <= max_len]
    freq, degree = defaultdict(int), defaultdict(int)
    for d, pid, _, word in pw:
        freq[word] += 1
        degree[word] += plen[(d, pid)]
    score = {w: degree[w] * 1_000_000 // freq[w] for w in freq}
    phrases = defaultdict(list)
    for d, pid, pos, word in pw:
        phrases[(d, pid)].append((pos, word))
    out = defaultdict(lambda: [0, 0])
    for (_, _), items in phrases.items():
        items.sort()
        text = " ".join(w for _, w in items)
        s = sum(score[w] for _, w in items)
        out[text][0] = max(out[text][0], s)
        out[text][1] += 1
    return {t: (s, n) for t, (s, n) in out.items()}


def test_rake_matches_reference_on_tiny_corpus(spark):
    texts = [
        "fast scan the fast scan a join",
        "fast scan the join a fast scan fast scan",
        "a b c d e f g the x",  # >4-word run is excluded entirely
    ]
    ref = _rake_ref(texts)
    assert "b c d e f g" not in ref and "fast scan" in ref
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from pyspark.sql import Window

    words = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
    marked = words.withColumn("is_stop", F.col("word").isin("a", "the"))
    running = F.sum(F.col("is_stop").cast("int")).over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    cand = marked.withColumn("phrase_id", running).filter(~F.col("is_stop"))
    plen = cand.groupBy("doc_id", "phrase_id").agg(F.count("*").alias("phrase_len"))
    pw = cand.join(plen, ["doc_id", "phrase_id"]).filter(F.col("phrase_len") <= 4)
    scored = (
        pw.groupBy("word")
        .agg(F.count("*").alias("freq"), F.sum("phrase_len").alias("degree"))
        .withColumn("score_ppm", F.expr("degree * 1000000 DIV freq"))
    )
    phrases = (
        pw.join(F.broadcast(scored.select("word", "score_ppm")), "word")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
            ).alias("phrase"),
            F.sum("score_ppm").alias("score_ppm"),
        )
    )
    got = {
        r["phrase"]: (r["score_ppm"], r["n_occurrences"])
        for r in phrases.groupBy("phrase")
        .agg(F.max("score_ppm").alias("score_ppm"), F.count("*").alias("n_occurrences"))
        .collect()
    }
    assert got == ref


def test_rake_registry_top20_is_deterministic(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    a = [tuple(r) for r in QUERIES["text_rake_keywords"].fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in QUERIES["text_rake_keywords"].fn(spark, SF_DIR).collect()]
    assert a == b and len(a) == 20
    scores = [s for _, s, _ in a]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# entropy / MI
# ---------------------------------------------------------------------------

def _h(counts):
    n = sum(counts)
    return -sum(c / n * math.log(c / n) for c in counts if c)


def test_mi_of_independent_columns_is_near_zero_and_self_mi_is_entropy(spark):
    # X uniform over 4 values, Y = X -> MI = H(X); Z independent -> MI ~ 0
    rows = [(i, i % 4, i % 4, (i * 7 + 3) % 5) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x int, y int, z int")

    def mi(df, a, b):
        jo = df.groupBy(a, b).count().withColumnRenamed("count", "nxy")
        na = df.groupBy(a).count().withColumnRenamed("count", "nx")
        nb = df.groupBy(b).count().withColumnRenamed("count", "ny")
        n = df.count()
        term = (
            F.col("nxy") / n * F.log(F.col("nxy") * n / (F.col("nx") * F.col("ny")))
        )
        return (
            jo.join(na, a).join(nb, b).agg(F.sum(term)).collect()[0][0]
        )

    h_x = _h([500, 500, 500, 500])
    assert mi(df, "x", "y") == pytest.approx(h_x, rel=1e-9)
    assert abs(mi(df, "x", "z")) < 0.01


def test_registry_entropy_mi_bounds(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    row = QUERIES["analytic_entropy_mi"].fn(spark, SF_DIR).collect()[0]
    assert row["h_event_type"] > 0 and row["h_cohort"] > 0
    # 0 <= MI <= min(H(X), H(Y)); NMI in [0, 1] (tiny negative = fp noise)
    assert -1e-9 <= row["mi"] <= min(row["h_event_type"], row["h_cohort"]) + 1e-9
    assert -1e-6 <= row["nmi"] <= 1 + 1e-9


# ---------------------------------------------------------------------------
# percentiles
# ---------------------------------------------------------------------------

def test_percentiles_match_numpy_linear_interpolation(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    out = {r["event_type"]: r for r in QUERIES["olap_percentiles_exact"].fn(spark, SF_DIR).collect()}
    import duckdb

    raw = duckdb.sql(
        f"SELECT event_type, CAST(floor(value) AS BIGINT) AS x FROM '{SF_DIR}/events.parquet'"
    ).fetchdf()
    for et, grp in raw.groupby("event_type"):
        xs = grp["x"].to_numpy(dtype=np.float64)
        row = out[et]
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert row[col] == pytest.approx(
                np.quantile(xs, p, method="linear"), rel=1e-12
            ), (et, col)
        assert row["n"] == len(xs)


# ---------------------------------------------------------------------------
# MAD robust outliers
# ---------------------------------------------------------------------------

def test_mad_flags_planted_outlier_that_zscore_masking_would_miss(spark):
    """49 points at 100 +/- 2 and one at 10000: MAD stays ~2 so the spike
    is flagged; the spike itself inflates stddev to ~1400, putting its own
    z-score at ~7 but pulling smaller anomalies under the z threshold —
    the masking MAD is immune to."""
    import numpy as np

    xs = [100 + (i % 5) - 2 for i in range(49)] + [10000]
    df = spark.createDataFrame([("g", int(x)) for x in xs], "event_type string, x long")
    med = df.groupBy("event_type").agg(F.expr("percentile(x, 0.5)").alias("med"))
    dev = df.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.expr("abs(CAST(x AS DOUBLE) - med)")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    out = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.expr("adev > 5 * mad"))
        .collect()
    )
    assert [r["x"] for r in out] == [10000]
    arr = np.array(xs, dtype=float)
    assert np.median(np.abs(arr - np.median(arr))) == pytest.approx(
        mad.collect()[0]["mad"]
    )


def test_registry_mad_bounds(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    rows = QUERIES["analytic_anomaly_mad"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["mad"] >= 0 and 0 <= r["n_outliers"] < r["n"]
