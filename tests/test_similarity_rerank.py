"""Two-stage IVF-probe → exact-rerank kNN: recall properties.

The driver's synthetic embeddings are isotropic random (measured
intra-label cosine ~0.005), so pruned ANN recall vs brute force is
inherently partial there; these tests pin the properties that DO hold:
exactness at full probe, monotone recall in n_probe, and 100% recall on
a corpus with real cluster structure.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_consumer_spark.extensions.similarity import (
    knn_bruteforce,
    knn_ivf,
    knn_ivf_rerank,
)
from etl_consumer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _topk(df):
    return {(r["query_id"], r["rank"]): r["neighbor_id"] for r in df.collect()}


def _recall(got, truth):
    hits = sum(1 for k in truth if got.get(k) == truth[k])
    return hits / len(truth)


def test_full_probe_equals_bruteforce(spark):
    """n_probe = n_clusters probes every cluster: the candidate pool is the
    whole corpus, so the exact rerank must reproduce brute force exactly —
    the recall oracle in the limit."""
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    brute = _topk(knn_bruteforce(q, emb, k=3))
    full = _topk(knn_ivf_rerank(q, emb, n_clusters=8, n_probe=8, k=3))
    assert full == brute


def test_rerank_recall_beats_single_probe(spark):
    """Multi-probe + rerank must dominate the single-cluster knn_ivf on
    recall@3 (it searches a strict superset of candidates)."""
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    truth = _topk(knn_bruteforce(q, emb, k=3))
    single = _recall(_topk(knn_ivf(q, emb, n_clusters=16, k=3)), truth)
    multi = _recall(_topk(knn_ivf_rerank(q, emb, n_clusters=16, n_probe=4, k=3)), truth)
    assert multi >= single
    assert multi >= 4 / 16  # must at least match the searched-fraction floor


def test_rerank_exact_on_clustered_corpus(spark):
    """On data with real cluster structure (the case IVF exists for), a
    2-of-4 probe achieves 100% recall: tight angular clusters mean the true
    neighbors share the query's probed clusters."""
    dim, per = 8, 10
    rows = []
    # 4 well-separated direction clusters; ids 0-3 are one vector per
    # cluster so deterministic_centroids(4) picks one centroid per cluster
    for c in range(4):
        for i in range(per):
            vec = [0.0] * dim
            vec[c] = 10.0
            vec[(c + 4) % dim] = 1.0 + 0.1 * i            # intra-cluster spread
            vec[(c + 5) % dim] = 0.05 * ((i * 7) % 5)     # deterministic jitter
            vid = c + 4 * i  # interleave: ids 0..3 cover all 4 clusters
            rows.append((vid, [float(v) for v in vec]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") % 7 == 0)
    brute = _topk(knn_bruteforce(q, emb, k=3))
    got = _topk(knn_ivf_rerank(q, emb, n_clusters=4, n_probe=2, k=3))
    assert got == brute


def test_multi_probe_assignment_shape(spark):
    """assign_clusters(n_probe=p) emits exactly p rows per vector, each a
    distinct cluster, ranked by cosine."""
    from etl_consumer_spark.extensions.similarity import (
        assign_clusters,
        deterministic_centroids,
    )

    emb = load_table(spark, SF, "embeddings")
    cents = deterministic_centroids(emb, 8)
    probes = assign_clusters(emb, cents, n_probe=3)
    per_vec = probes.groupBy("vec_id").agg(
        F.count("*").alias("n"), F.count_distinct("cid").alias("nd")
    )
    bad = per_vec.filter((F.col("n") != 3) | (F.col("nd") != 3)).count()
    assert bad == 0


def test_trained_ivf_full_probe_equals_bruteforce(spark):
    """With k-means centroids as the coarse quantizer, n_probe=k still
    reduces to brute force — the trained index changes WHERE vectors live,
    never which neighbors exist."""
    from etl_consumer_spark.extensions.similarity import kmeans_centroids

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(emb, k=4, iterations=2)
    cents_df = spark.createDataFrame(
        [(j, [v / 1000.0 for v in c]) for j, c in enumerate(cents)],
        "cid long, cvec array<double>",
    )
    brute = _topk(knn_bruteforce(q, emb, k=3))
    full = _topk(knn_ivf_rerank(q, emb, n_probe=4, k=3, centroids=cents_df))
    assert full == brute


def test_kmeans_centroids_shape_and_determinism(spark):
    from etl_consumer_spark.extensions.similarity import kmeans_centroids

    emb = load_table(spark, SF, "embeddings")
    a = kmeans_centroids(emb, k=4, iterations=2)
    b = kmeans_centroids(emb, k=4, iterations=2)
    assert a == b
    assert len(a) == 4 and all(len(c) == 64 for c in a)


def test_ivfpq_full_probe_wide_shortlist_equals_bruteforce(spark):
    """IVF-PQ reduces to brute force when nothing is pruned: n_probe =
    n_clusters makes the candidate pool the whole corpus, and a shortlist
    wider than the corpus means the ADC approximation cannot drop a true
    neighbor before the exact rerank."""
    from etl_consumer_spark.extensions.similarity import ivfpq_search

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    brute = _topk(knn_bruteforce(q, emb, k=3))
    full = _topk(
        ivfpq_search(
            q, emb, n_clusters=8, n_probe=8, n_sub=4, sub_dim=16,
            k_codebook=8, shortlist=10_000, k=3,
        )
    )
    assert full == brute


def test_ivfpq_narrow_search_is_subset_ranked(spark):
    """Production-shaped params (4-of-16 probe, 10-wide shortlist): output
    is exactly k ranked rows per query, ranks 1..k, no self-matches."""
    from etl_consumer_spark.extensions.similarity import ivfpq_search

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = ivfpq_search(q, emb, k=3).collect()
    by_q = {}
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_q) == 10
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
