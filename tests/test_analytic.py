"""As-of join and sessionization operator tests."""

from __future__ import annotations

import datetime as dt

from etl_consumer_spark.operators.analytic import asof_join, sessionize


def ts(minute):
    return dt.datetime(2024, 1, 1, 12, minute)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, ts(5), "e1"), (1, ts(15), "e2"), (1, ts(2), "e0"), (2, ts(10), "e3")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(4), 100), (1, ts(10), 200), (3, ts(1), 999)],
        "k long, rts timestamp, v int",
    )
    out = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    }
    assert out == {"e0": None, "e1": 100, "e2": 200, "e3": None}


def test_asof_join_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, ts(10), "x")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, ts(10), 7)], "k long, rts timestamp, v int")
    out = asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    assert out[0]["v"] == 7  # right_ts == left_ts counts (<= semantics)


def test_sessionize_gaps(spark):
    rows = [
        (1, ts(0)), (1, ts(10)), (1, ts(50)),   # gap 40min -> new session
        (2, ts(0)),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp")
    out = sessionize(df, "user", "ts", gap_minutes=30).collect()
    by = {(r["user"], r["ts"].minute): r["session_id"] for r in out}
    assert by[(1, 0)] == 1 and by[(1, 10)] == 1 and by[(1, 50)] == 2
    assert by[(2, 0)] == 1


def test_asof_join_forward_with_ties(spark):
    """Forward direction: earliest right payload at-or-after the left ts;
    an exact-timestamp right row counts (>=), later left rows get null."""
    from pyspark.sql import functions as F

    from etl_consumer_spark.operators.analytic import asof_join

    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 11), (1, 25), (2, 3)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 1, "z")], "k long, rts long, tag string"
    )
    out = {
        (r["k"], r["ts"]): r["tag"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            payload_cols=["tag"], direction="forward",
        ).collect()
    }
    assert out == {
        (1, 5): "a",    # next right at 10
        (1, 10): "a",   # tie: right at the same ts counts
        (1, 11): "b",
        (1, 25): None,  # nothing after
        (2, 3): None,   # right at 1 is before, not after
    }


def test_asof_join_bad_direction(spark):
    import pytest as _pytest

    from etl_consumer_spark.operators.analytic import asof_join

    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with _pytest.raises(ValueError):
        asof_join(df, df, key="k", left_ts="ts", right_ts="ts",
                  payload_cols=[], direction="sideways")


def test_range_join_bounds_and_negative_buckets(spark):
    """Exact interval semantics at the bucket boundary, including negative
    points (floor-division bucketing, not truncate-toward-zero)."""
    from etl_consumer_spark.operators.analytic import range_join

    left = spark.createDataFrame(
        [(1, -5), (1, 0), (1, 7), (2, 0)], "k long, lp long"
    )
    right = spark.createDataFrame(
        [(1, -8), (1, -3), (1, 0), (1, 2), (1, 9), (2, 3)], "k long, rp long"
    )
    out = {
        (r["k"], r["lp"], r["rp"])
        for r in range_join(
            left, right, key="k", left_point="lp", right_point="rp",
            lower=-2, upper=2, bucket_width=3,
        ).collect()
    }
    assert out == {(1, -5, -3), (1, 0, 0), (1, 0, 2), (1, 7, 9)}
