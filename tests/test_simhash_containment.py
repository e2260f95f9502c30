"""Round-5 dedup additions: SimHash Hamming-block LSH and containment.

Pins the two properties the operators' scale designs rest on:
- pigeonhole recall: with n_blocks >= max_distance+1, block-LSH candidate
  generation finds EVERY pair within the distance bound (verified against
  an all-pairs popcount on a small corpus);
- containment vs jaccard: a document fully contained in a larger one scores
  containment 1.0 even when jaccard is low.
"""

import itertools

from pyspark.sql import functions as F

from etl_consumer_spark.extensions import dedup as D
from etl_consumer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hamming_block_lsh_equals_all_pairs(spark):
    docs = load_table(spark, SF, "documents")
    sigs = D.simhash16(D.exploded_shingles(docs))
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in D.simhash_hamming_pairs(sigs, max_distance=3, n_blocks=4).collect()
    }
    fps = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    want = set()
    for a, b in itertools.combinations(sorted(fps), 2):
        d = bin(fps[a] ^ fps[b]).count("1")
        if d <= 3:
            want.add((a, b, d))
    assert got == want
    assert want, "fixtures contain near-dup fingerprints; test not vacuous"


def test_hamming_requires_enough_blocks():
    import pytest

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    sigs = spark.createDataFrame([(1, 0)], "doc_id long, simhash long")
    with pytest.raises(ValueError):
        D.simhash_hamming_pairs(sigs, max_distance=4, n_blocks=4)


def test_containment_catches_subset_docs(spark):
    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (1, big),
        (2, "alpha beta gamma delta epsilon zeta"),  # subset of doc 1
        (3, "totally unrelated words nothing shared here at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.exploded_shingles(docs)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    got = {r["a"]: r for r in D.containment_pairs(sh, pairs).collect()}
    # all of doc 2's shingles appear in doc 1 → containment_b == 1.0,
    # while jaccard would be |B|/|A| ≪ 1
    r = got[1]
    assert r["b"] == 2
    assert abs(r["containment_b"] - 1.0) < 1e-12
    assert r["containment_a"] < 0.5
    # (1,3) shares no shingles → no row at all
    assert len(got) == 1


def test_range_frame_peers_share_value(spark):
    """RANGE frame: orders on the same (custkey, day) are peers and must
    carry identical trailing-window values."""
    from etl_consumer_spark.plans.queries import QUERIES

    out = QUERIES["olap_range_frame_window"].fn(spark, SF)
    per_day = out.join(
        load_table(spark, SF, "orders").select(
            "o_orderkey", F.unix_date(F.col("o_orderdate").cast("date")).alias("d")
        ),
        "o_orderkey",
    )
    distinct_vals = (
        per_day.groupBy("o_custkey", "d")
        .agg(F.count_distinct("rev_30d").alias("nv"))
        .agg(F.max("nv"))
        .collect()[0][0]
    )
    assert distinct_vals == 1
