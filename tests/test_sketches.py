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
