"""Scale-guard tests for the dedup family: hot-LSH-bucket caps and
data-dependent IVF cluster counts (the quadratic-blowup guards that the
sf0.01 oracle corpus is too benign to exercise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_consumer_spark.extensions import dedup as D


def test_candidate_pairs_hot_bucket_cap(spark):
    """Adversarial fixture: every doc lands in the same (band, bucket) —
    uncapped emits the full quadratic N(N-1)/2 pair set, the cap drops the
    bucket entirely."""
    n = 40
    buckets = spark.createDataFrame(
        [(i, 0, "deadbeef") for i in range(n)], "doc_id long, band int, bucket string"
    )
    uncapped = D.candidate_pairs(buckets)
    assert uncapped.count() == n * (n - 1) // 2
    capped = D.candidate_pairs(buckets, max_bucket_size=10)
    assert capped.count() == 0


def test_candidate_pairs_cap_keeps_cold_buckets(spark):
    """The cap only drops over-full buckets; pairs from cold buckets (and
    from other bands of the same docs) survive."""
    rows = [(i, 0, "hot") for i in range(20)]          # band 0: one hot bucket
    rows += [(1, 1, "x"), (2, 1, "x"), (5, 1, "y"), (6, 1, "y")]  # band 1: cold
    buckets = spark.createDataFrame(rows, "doc_id long, band int, bucket string")
    capped = D.candidate_pairs(buckets, max_bucket_size=4)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    assert got == {(1, 2), (5, 6)}


def test_embedding_lsh_hot_bucket_cap(spark):
    """All-identical vectors collapse into one LSH bucket; the cap bounds
    the pair join instead of letting it go quadratic."""
    vec = [1.0] * 64
    emb = spark.createDataFrame(
        [(i, vec) for i in range(30)], "vec_id long, embedding array<float>"
    )
    uncapped = D.embedding_near_dups_lsh(emb, threshold=0.5, n_planes=4, dim=64)
    assert uncapped.count() == 30 * 29 // 2
    capped = D.embedding_near_dups_lsh(
        emb, threshold=0.5, n_planes=4, dim=64, max_bucket_size=8
    )
    assert capped.count() == 0


def test_embedding_near_dups_data_dependent_clusters(spark):
    """n_clusters=None derives the cluster count from the row count
    (≈ rows/target_cluster_size, floor 16) instead of a fixed k."""
    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    # target 10 per cluster -> 16-cluster floor beats 100/10; with target 4
    # the derived count is 25 and the plan still returns a valid pair set
    out = D.embedding_near_dups(
        emb, threshold=0.99, n_clusters=None, target_cluster_size=4, vec_col="embedding"
    )
    pairs = out.collect()
    for r in pairs:
        assert r["a"] < r["b"] and r["cos_sim"] >= 0.99
    # fixed-k and derived-k agree on the invariant: pair lists are subsets of
    # the full quadratic search at the same threshold
    full = (
        emb.alias("x").crossJoin(emb.alias("y"))
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .count()
    )
    assert len(pairs) <= full


def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (forces multiple propagation rounds), a 2-node pair,
    and an isolated vertex: components are labeled by their min id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a long, b long"
    )
    vertices = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 99]], "doc_id long")
    out = {r["doc_id"]: r["component"] for r in
           D.connected_components(pairs, vertices).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_merging_clusters(spark):
    """Two clusters bridged by one edge collapse to one component."""
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 3)], "a long, b long"
    )
    vertices = spark.createDataFrame([(i,) for i in [1, 2, 3, 4]], "doc_id long")
    out = {r["doc_id"]: r["component"] for r in
           D.connected_components(pairs, vertices).collect()}
    assert set(out.values()) == {1}


def test_pii_scrub_patterns(spark):
    from etl_consumer_spark.extensions.text_analysis import pii_scrub
    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [
            ("mail a.b+c@x-y.co.uk end", "mail <EMAIL> end"),
            ("ip 192.168.0.1 here", "ip <IP> here"),
            ("call +62 812-3456-789 now", "call <PHONE> now"),
            ("clean text stays", "clean text stays"),
        ],
        "t string, want string",
    )
    got = df.select(pii_scrub(SF.col("t")).alias("s"), "want").collect()
    for r in got:
        assert r["s"] == r["want"]


def test_word_shingles_short_docs_ansi_safe(spark):
    """Docs shorter than n words must yield an empty shingle set, not an
    ANSI element_at trap (sequence(1, 0) is DESCENDING in Spark)."""
    from pyspark.sql import functions as F

    from etl_consumer_spark.extensions.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "one two three")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("s")).collect()}
    assert rows[1] == [] and rows[2] == [] and rows[3] == []
    assert rows[4] == ["one two three"]
