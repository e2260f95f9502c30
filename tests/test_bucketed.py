"""Bucketed co-located join: assert the join plan has no shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_consumer_spark.sinks.bucketed import co_located_join, has_shuffle, write_bucketed
from etl_consumer_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    # disable auto-broadcast so the bucketed sort-merge path is exercised
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            ["o_orderkey"],
            n_buckets=8,
        )
        joined = co_located_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        assert not has_shuffle(joined), "bucketed equi-join must plan without Exchange"
        # sanity: result matches the plain (shuffled) join
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), ["o_orderkey"]
        )
        assert joined.count() == plain.count()
        # contrast: the plain join on unbucketed sources DOES shuffle
        assert has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_no_exchange(spark):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    try:
        write_bucketed(orders, "b_orders2", ["o_custkey"], n_buckets=8)
        agg = spark.table("b_orders2").groupBy("o_custkey").agg(F.count("*").alias("n"))
        assert not has_shuffle(agg), "groupBy on the bucket key must avoid the shuffle"
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders2")
