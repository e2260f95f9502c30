"""Incremental SCD2 maintenance: cross-batch closing, replay idempotency,
and the bucket-pruned leading-key read it depends on."""

from __future__ import annotations

import pytest

from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore
from etl_consumer_spark.streaming.scd2 import SCD2StreamMaintainer


def _events(spark, rows):
    return spark.createDataFrame(rows, "k: long, ts: long, val: string")


def _maintainer(spark, tmp_path):
    store = PartitionedParquetStateStore(spark, str(tmp_path / "state"))
    m = SCD2StreamMaintainer(store, "hist", "k", "ts", ["val"], key_range_size=4)
    m.seed(_events(spark, []))
    return store, m


def _hist(store):
    return sorted(
        (r.k, r.valid_from, r.valid_to, r.is_current, r.val)
        for r in store.read("hist").collect()
    )


def test_cross_batch_closing(spark, tmp_path):
    store, m = _maintainer(spark, tmp_path)
    m.apply_batch(_events(spark, [(1, 10, "a"), (2, 10, "x")]), 0)
    m.apply_batch(_events(spark, [(1, 20, "b"), (1, 30, "c")]), 1)
    assert _hist(store) == [
        (1, 10, 20, False, "a"),   # closed by batch 2's earliest version
        (1, 20, 30, False, "b"),   # closed within batch 2
        (1, 30, None, True, "c"),
        (2, 10, None, True, "x"),  # untouched by batch 2
    ]


def test_replayed_batch_is_idempotent(spark, tmp_path):
    store, m = _maintainer(spark, tmp_path)
    m.apply_batch(_events(spark, [(1, 10, "a")]), 0)
    b2 = [(1, 20, "b")]
    m.apply_batch(_events(spark, b2), 1)
    after_once = _hist(store)
    m.apply_batch(_events(spark, b2), 1)  # crash-replay of the same batch
    assert _hist(store) == after_once == [
        (1, 10, 20, False, "a"),
        (1, 20, None, True, "b"),
    ]


def test_single_batch_equals_batch_operator(spark, tmp_path):
    from etl_consumer_spark.operators.scd import scd2_history

    rows = [(k, ts, f"v{k}_{ts}") for k in range(1, 6) for ts in (10, 20, 30)[: k % 3 + 1]]
    store, m = _maintainer(spark, tmp_path)
    m.apply_batch(_events(spark, rows), 0)
    batch = scd2_history(_events(spark, rows), ["k"], "ts").select(
        "k", "valid_from", "valid_to", "is_current", "val"
    )
    got = _hist(store)
    want = sorted(
        (r.k, r.valid_from, r.valid_to, r.is_current, r.val) for r in batch.collect()
    )
    assert got == want


def test_read_leading_range_prunes_and_filters(spark, tmp_path):
    store = PartitionedParquetStateStore(spark, str(tmp_path / "s2"))
    df = spark.createDataFrame(
        [(k, v, k * 10 + v) for k in range(20) for v in range(2)],
        "k: long, v: long, payload: long",
    )
    store.init(
        "t", df, ["k", "v"],
        layout={"bucket_mode": "range", "range_size": 4, "n_buckets": 64},
    )
    got = sorted(
        (r.k, r.v) for r in store.read_leading_range("t", [3, 17]).collect()
    )
    assert got == [(3, 0), (3, 1), (17, 0), (17, 1)]
    # DataFrame form: same result, keys never collected
    kdf = spark.createDataFrame([(3,), (17,)], "k: long")
    got_df = sorted((r.k, r.v) for r in store.read_leading_range("t", kdf).collect())
    assert got_df == got


def test_read_leading_range_rejects_hash_layout(spark, tmp_path):
    store = PartitionedParquetStateStore(spark, str(tmp_path / "s3"))
    df = spark.createDataFrame([(1, 2, 3)], "k: long, v: long, p: long")
    store.init("t", df, ["k", "v"], layout={"bucket_mode": "hash", "n_buckets": 8})
    with pytest.raises(ValueError, match="range layout"):
        store.read_leading_range("t", [1])
