"""Portable HLL sketch tests: register determinism + estimate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_consumer_spark.extensions.sketches import hll_count_distinct, hll_estimate


def test_hll_estimate_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "v long")
    est = hll_count_distinct(df, F.col("v"))
    assert abs(est - n) / n < 0.15  # HLL-256 standard error ~6.5%


def test_hll_duplicates_dont_inflate(spark):
    df = spark.createDataFrame([(i % 100,) for i in range(10_000)], "v long")
    est = hll_count_distinct(df, F.col("v"))
    assert abs(est - 100) / 100 < 0.25


def test_hll_merge_is_max_per_bucket():
    # two sketches merge by max rank; estimate of merge >= each part
    a = [(i, 3) for i in range(0, 128)]
    b = [(i, 5) for i in range(64, 256)]
    merged = {}
    for bk, r in a + b:
        merged[bk] = max(merged.get(bk, 0), r)
    assert hll_estimate(list(merged.items())) >= max(hll_estimate(a), hll_estimate(b))


def test_bloom_filter_no_false_negatives_and_merge(spark):
    from pyspark.sql import functions as F

    from etl_consumer_spark.extensions.sketches import (
        bloom_bits,
        bloom_might_contain,
    )

    keys_a = [f"k{i}" for i in range(0, 50)]
    keys_b = [f"k{i}" for i in range(50, 100)]
    df_a = spark.createDataFrame([(k,) for k in keys_a], "key string")
    df_b = spark.createDataFrame([(k,) for k in keys_b], "key string")
    bits_a = {r["word_idx"]: r["bits"] for r in bloom_bits(df_a).collect()}
    # no false negatives
    assert all(bloom_might_contain(bits_a, k) for k in keys_a)
    # most absent keys are rejected (fp rate at n=50, m=1024, k=4 is ~2%)
    rejected = sum(not bloom_might_contain(bits_a, f"absent{i}") for i in range(200))
    assert rejected >= 180
    # merging filters = union + bit_or, equals the filter over the union
    merged_df = bloom_bits(df_a).unionByName(bloom_bits(df_b)) \
        .groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    merged = {r["word_idx"]: r["bits"] for r in merged_df.collect()}
    direct = {r["word_idx"]: r["bits"]
              for r in bloom_bits(df_a.unionByName(df_b)).collect()}
    assert merged == direct


def test_hll_registers_merge_equals_union(spark):
    """HLL mergeability: max-per-bucket over two sketches equals the sketch
    of the unioned input (what makes the sketch partial-agg friendly)."""
    from pyspark.sql import functions as F

    from etl_consumer_spark.extensions.sketches import hll_estimate, hll_registers

    a = spark.range(0, 5000).select(F.col("id").alias("v"))
    b = spark.range(3000, 9000).select(F.col("id").alias("v"))
    ra = hll_registers(a, F.col("v"))
    rb = hll_registers(b, F.col("v"))
    merged = (
        ra.unionByName(rb).groupBy("bucket").agg(F.max("r").alias("r"))
    )
    direct = hll_registers(a.unionByName(b), F.col("v"))
    m = {r["bucket"]: r["r"] for r in merged.collect()}
    d = {r["bucket"]: r["r"] for r in direct.collect()}
    assert m == d
    est = hll_estimate(sorted(d.items()))
    assert abs(est - 9000) / 9000 < 0.15  # ~6.5% expected error at m=256


# -- round-5: KMV set-operation sketches ------------------------------------


def test_kmv_estimates_close_to_exact(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    row = QUERIES["sketch_kmv_setops"].fn(spark, "/root/testdata/sf0.01").collect()[0]
    # k=64 KMV has relative error ~1/sqrt(k-2) ≈ 13%; allow 3 sigma
    for est, exact in ((row["est_a"], row["exact_a"]), (row["est_b"], row["exact_b"])):
        assert abs(est - exact) / exact < 0.4, (est, exact)
    # union of two subsets of the same customer pool: bounded by sum,
    # at least each side
    assert row["est_union"] >= max(row["est_a"], row["est_b"]) * 0.8
    assert row["est_union"] <= row["est_a"] + row["est_b"]
    # both halves draw from the same customer pool -> heavy overlap: the
    # intersection estimate must be decisively positive
    assert row["est_intersect"] > 0.3 * min(row["est_a"], row["est_b"])
