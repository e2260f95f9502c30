"""Salted aggregation / salted join correctness (skew utilities)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_consumer_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_plain(spark):
    # 90% of rows share key 1 (the skew scenario)
    rows = [(1, float(i)) for i in range(900)] + [(i % 7 + 2, 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, v double")
    plain = {
        (r["k"]): (r["n"], r["total"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("total")).collect()
    }
    salted = {
        (r["k"]): (r["n"], r["total"])
        for r in salted_agg(
            df,
            ["k"],
            [("n", F.count("*"), F.sum("n")), ("total", F.sum("v"), F.sum("total"))],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1), (3, 9)], "k int, lv int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k int, rv string")
    plain = {(r["k"], r["lv"], r["rv"]) for r in left.join(right, ["k"]).collect()}
    salted = {(r["k"], r["lv"], r["rv"]) for r in salted_join(left, right, ["k"], n_salts=4).collect()}
    assert salted == plain
    assert len(salted) == 501
