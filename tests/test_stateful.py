"""Cross-batch stateful streaming operator tests (applyInPandasWithState)."""

from __future__ import annotations


from etl_consumer_spark.streaming.stateful import (
    streaming_first_seen,
    streaming_running_counts,
)


def _run_two_batches(spark, tmp_path, build_query):
    """Drive a file-stream with two sequential parquet batches; collect sink
    rows after each. Returns list of row-lists per batch boundary."""
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "c")], "k long, v double, tag string"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema("k long, v double, tag string").parquet(in_dir)
    q = build_query(stream)
    q.processAllAvailable()
    first = [tuple(r) for r in spark.table(q.name).collect()]
    spark.createDataFrame(
        [(1, 1.0, "d"), (3, 7.0, "e")], "k long, v double, tag string"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q.processAllAvailable()
    second = [tuple(r) for r in spark.table(q.name).collect()]
    q.stop()
    return first, second


def test_streaming_first_seen(spark, tmp_path):
    def build(stream):
        out = streaming_first_seen(stream, "k", ["tag"])
        return (
            out.writeStream.format("memory")
            .queryName("first_seen_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .start()
        )

    first, second = _run_two_batches(spark, tmp_path, build)
    assert set(first) == {(1, "a"), (2, "c")}
    # second batch: key 1 already seen -> suppressed; key 3 is new
    assert set(second) == {(1, "a"), (2, "c"), (3, "e")}


def test_streaming_running_counts(spark, tmp_path):
    def build(stream):
        out = streaming_running_counts(stream, "k", "v")
        return (
            out.writeStream.format("memory")
            .queryName("run_counts_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )

    first, second = _run_two_batches(spark, tmp_path, build)
    assert set(first) == {(1, 2, 30.0), (2, 1, 5.0)}
    # update sink appends the per-batch updates; latest rows win
    latest = {}
    for k, c, s in second:
        latest[k] = max(latest.get(k, (0, 0.0)), (c, s))
    assert latest == {1: (3, 31.0), 2: (1, 5.0), 3: (1, 7.0)}
