"""CDC apply semantics C1-C7 (reference main.go:348-380 + dup-skip 138-141)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_consumer_spark.operators import (
    apply_cdc,
    apply_cdc_full_row,
    apply_cdc_sequential,
    classify_op,
    last_writer_wins,
)

STATE_SCHEMA = "id long, province_id int, seq int"
EVENT_SCHEMA = (
    "before struct<id:long, province_id:int, seq:int>, "
    "after struct<id:long, province_id:int, seq:int>, "
    "pos long, ts_ms long"
)


def img(id_, prov, seq):
    return Row(id=id_, province_id=prov, seq=seq)


def ev(before, after, pos, ts=0):
    return Row(before=before, after=after, pos=pos, ts_ms=ts)


def state_df(spark, rows):
    return spark.createDataFrame(rows, STATE_SCHEMA)


def events_df(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def as_set(df):
    return {tuple(r) for r in df.collect()}


def test_classify_op(spark):
    df = events_df(
        spark,
        [
            ev(None, img(1, 10, 0), 1),
            ev(img(1, 10, 0), img(1, 11, 1), 2),
            ev(img(1, 11, 1), None, 3),
            ev(None, None, 4),
        ],
    ).select(classify_op(F.col("before"), F.col("after")).alias("op"))
    assert [r["op"] for r in df.collect()] == ["insert", "update", "delete", None]


def test_apply_cdc_matrix(spark):
    state = state_df(spark, [(1, 10, 0), (2, 20, 0), (3, 30, 0), (4, 40, 0)])
    events = events_df(
        spark,
        [
            ev(None, img(5, 50, 1), 100),            # insert new -> added
            ev(None, img(1, 99, 9), 101),            # insert existing -> dup skip (C6)
            ev(img(2, 20, 0), img(2, 21, 1), 102),   # update existing -> replaced
            ev(img(9, 90, 0), img(9, 91, 1), 103),   # update missing -> no-op
            ev(img(3, 30, 0), None, 104),            # delete existing -> gone
            ev(img(8, 80, 0), None, 105),            # delete missing -> no-op
        ],
    )
    out = as_set(apply_cdc(state, events, ["id"]))
    assert out == {(1, 10, 0), (2, 21, 1), (4, 40, 0), (5, 50, 1)}


def test_apply_cdc_last_writer_wins(spark):
    state = state_df(spark, [(1, 10, 0)])
    events = events_df(
        spark,
        [
            ev(img(1, 10, 0), img(1, 11, 1), 200, ts=5),
            ev(img(1, 11, 1), img(1, 12, 2), 300, ts=1),  # higher pos wins despite lower ts
            ev(img(1, 10, 0), img(1, 13, 3), 250, ts=9),
        ],
    )
    out = as_set(apply_cdc(state, events, ["id"]))
    assert out == {(1, 12, 2)}


def test_apply_cdc_replay_idempotent(spark):
    """Replaying the same batch over the resulting state is a no-op
    (at-least-once delivery tolerance, reference main.go:138-141)."""
    state = state_df(spark, [(1, 10, 0), (3, 30, 0)])
    events = events_df(
        spark,
        [
            ev(None, img(5, 50, 1), 100),
            ev(img(1, 10, 0), img(1, 11, 1), 101),
            ev(img(3, 30, 0), None, 102),
        ],
    )
    once = apply_cdc(state, events, ["id"]).cache()
    twice = apply_cdc(once, events, ["id"])
    # the delete and insert replay are no-ops; the update replays onto the
    # same after image -> fixed point
    assert as_set(once) == as_set(twice)


def test_apply_cdc_full_row_predicate(spark):
    """Full-row matching (main.go:372,376): an update whose before image
    does not exactly match the state row must NOT apply."""
    state = state_df(spark, [(1, 10, 0), (2, 20, 0)])
    events = events_df(
        spark,
        [
            ev(img(1, 10, 0), img(1, 11, 1), 100),   # exact match -> applies
            ev(img(2, 99, 0), img(2, 21, 1), 101),   # stale before image -> no-op
            ev(None, img(7, 70, 0), 102),            # insert new -> added
            ev(None, img(2, 20, 0), 103),            # exact duplicate of a state row -> C6 skip
        ],
    )
    out = as_set(apply_cdc_full_row(state, events))
    # id=2 unchanged (predicate mismatch); id=1 updated; insert id=7 added;
    # duplicate insert of (2,20,0) skipped (dup check is vs pre-batch state)
    assert out == {(1, 11, 1), (2, 20, 0), (7, 70, 0)}


def test_apply_cdc_sequential_chain(spark):
    """Exact sequential semantics: insert then update of the same key in one
    batch must survive as the updated row (the compacted path would drop it
    since the final update sees no pre-batch state)."""
    state = state_df(spark, [(1, 10, 0)])
    events = events_df(
        spark,
        [
            ev(None, img(6, 60, 0), 100),              # insert new key
            ev(img(6, 60, 0), img(6, 61, 1), 101),     # then update it
            ev(img(1, 10, 0), None, 102),              # delete existing
            ev(None, img(1, 88, 8), 103),              # re-insert same key after delete
        ],
    )
    out = as_set(apply_cdc_sequential(state, events, ["id"]))
    assert out == {(6, 61, 1), (1, 88, 8)}


def test_sequential_agrees_with_compacted_on_simple_batches(spark):
    state = state_df(spark, [(i, i * 10, 0) for i in range(1, 8)])
    events = events_df(
        spark,
        [
            ev(None, img(20, 1, 1), 1),
            ev(img(2, 20, 0), img(2, 22, 2), 2),
            ev(img(3, 30, 0), None, 3),
            ev(None, img(4, 44, 4), 4),  # dup-skip
        ],
    )
    a = as_set(apply_cdc(state, events, ["id"]))
    b = as_set(apply_cdc_sequential(state, events, ["id"]))
    assert a == b


def test_last_writer_wins_window(spark):
    df = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 200), (2, 5, 50)], "k long, v long, pos long"
    ).withColumn("ts_ms", F.lit(0))
    out = last_writer_wins(df, ["k"], "pos", "ts_ms")
    assert {(r["k"], r["v"]) for r in out.collect()} == {(1, 20), (2, 5)}
