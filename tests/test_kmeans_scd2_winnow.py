"""Unit/property tests for the session-3 operators: quantized k-means,
SCD Type-2 history, winnowing fingerprints.

The registry oracles value-check these on the driver tables; here we pin
the algorithmic guarantees on hand-built inputs: Lloyd monotonicity,
interval chain integrity, and the winnowing shared-run guarantee.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_consumer_spark.extensions.similarity import kmeans_lloyd_quantized
from etl_consumer_spark.extensions.text_analysis import winnow_fingerprints
from etl_consumer_spark.operators.scd import scd2_history


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs far apart; k=2 must split them exactly
    blob_a = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1]]
    blob_b = [[5.0, 5.0], [5.1, 5.0], [5.0, 5.1], [5.1, 5.1]]
    out = kmeans_lloyd_quantized(_emb(spark, blob_a + blob_b), k=2, iterations=2)
    rows = {r.id: r.cl for r in out.collect()}
    assert len({rows[i] for i in range(4)}) == 1
    assert len({rows[i] for i in range(4, 8)}) == 1
    assert rows[0] != rows[4]


def test_kmeans_inertia_non_increasing_with_iterations(spark):
    vecs = [[(i * 37 % 11) / 10.0, (i * 53 % 13) / 10.0, (i * 71 % 7) / 10.0]
            for i in range(40)]
    df = _emb(spark, vecs)
    inertias = []
    for it in range(0, 4):
        out = kmeans_lloyd_quantized(df, k=4, iterations=it)
        inertias.append(sum(r.d2 for r in out.collect()))
    # Lloyd's algorithm: total inertia never increases (integer floor on the
    # centroid update can stall it, never raise it past the previous step
    # by more than the quantization bound; in practice monotone here)
    assert all(b <= a for a, b in zip(inertias, inertias[1:]))


def test_kmeans_deterministic_across_runs(spark):
    vecs = [[(i * 13 % 17) / 10.0, (i * 29 % 19) / 10.0] for i in range(30)]
    df = _emb(spark, vecs)
    a = sorted(map(tuple, kmeans_lloyd_quantized(df, k=3, iterations=2).collect()))
    b = sorted(map(tuple, kmeans_lloyd_quantized(df, k=3, iterations=2).collect()))
    assert a == b


def test_scd2_intervals_chain_without_gaps(spark):
    ev = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "x")],
        "k: long, ts: long, val: string",
    )
    out = scd2_history(ev, ["k"], "ts").orderBy("k", "ts").collect()
    k1 = [r for r in out if r.k == 1]
    assert [(r.valid_from, r.valid_to, r.is_current) for r in k1] == [
        (10, 20, False),
        (20, 30, False),
        (30, None, True),
    ]
    k2 = [r for r in out if r.k == 2]
    assert [(r.valid_from, r.valid_to, r.is_current) for r in k2] == [(15, None, True)]


def test_scd2_tie_break_via_seq_cols(spark):
    # same ts twice: seq column must order the versions deterministically
    ev = spark.createDataFrame(
        [(1, 10, 2, "late"), (1, 10, 1, "early")], "k: long, ts: long, seq: long, v: string"
    )
    out = scd2_history(ev, ["k"], "ts", seq_cols=["seq"]).orderBy("seq").collect()
    assert [r.v for r in out] == ["early", "late"]
    assert out[0].is_current is False and out[1].is_current is True


def test_winnowing_shared_run_yields_shared_fingerprint(spark):
    # the SIGMOD'03 guarantee: a shared run spanning >= w+k-1 words must
    # produce at least one common fingerprint between the two documents
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = "xx yy " + shared + " p q r"
    d2 = "completely different prefix words " + shared + " other tail"
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id: long, text: string"
    )
    from etl_consumer_spark.extensions.text_analysis import winnow_selections

    sel = winnow_selections(df, "doc_id", "text", k=3, w=3).collect()
    h1 = {r.h for r in sel if r.id == 1}
    h2 = {r.h for r in sel if r.id == 2}
    assert h1 & h2, "shared run of >= w+k-1 words must share a fingerprint"


def test_winnowing_identical_docs_identical_fingerprints(spark):
    text = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id: long, text: string")
    out = {r.id: r.fp_md5 for r in winnow_fingerprints(df).collect()}
    assert out[1] == out[2]


def test_winnowing_short_doc_still_fingerprinted(spark):
    df = spark.createDataFrame(
        [(1, "just four words here")], "doc_id: long, text: string"
    )
    out = winnow_fingerprints(df, k=4, w=5).collect()
    assert len(out) == 1 and out[0].n_fingerprints == 1


def test_winnowing_density_roughly_two_over_w_plus_one(spark):
    words = " ".join(f"w{(i * 7919) % 104729}" for i in range(400))
    df = spark.createDataFrame([(1, words)], "doc_id: long, text: string")
    n = winnow_fingerprints(df, k=4, w=5).collect()[0].n_fingerprints
    n_grams = 400 - 3
    density = n / n_grams
    assert 0.2 < density < 0.55  # expected ~2/(w+1) = 0.33 on random hashes


def test_winnow_pairs_catch_shared_run_not_unrelated(spark, tmp_path):
    import os

    from etl_consumer_spark.plans.queries import QUERIES

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    rows = [
        (1, "intro words " + shared + " closing remark", "en", "web", 0),
        (2, "other beginning " + shared + " different end", "en", "web", 0),
        (3, "entirely unrelated content about something else whatsoever here", "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path / "wp")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    pairs = {(r.doc_a, r.doc_b) for r in QUERIES["dedup_winnow_pairs"].fn(spark, d).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
