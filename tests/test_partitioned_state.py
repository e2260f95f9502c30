"""Partitioned state store: partial rewrite correctness incl. the
empty-bucket deletion edge, and equivalence with the versioned store."""

from __future__ import annotations

import os

from pyspark.sql import Row

from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore


def ev_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "before struct<id:long,v:long>, after struct<id:long,v:long>, pos long, ts_ms long",
    )


def test_partitioned_upsert_matrix(spark, tmp_path):
    store = PartitionedParquetStateStore(spark, str(tmp_path), n_buckets=8)
    state = spark.createDataFrame([(i, i * 10) for i in range(1, 9)], "id long, v long")
    store.init("t", state, ["id"])
    events = ev_rows(
        spark,
        [
            (None, Row(id=100, v=1), 1, 0),              # insert
            (Row(id=2, v=20), Row(id=2, v=21), 2, 0),    # update
            (Row(id=3, v=30), None, 3, 0),               # delete
        ],
    )
    n = store.upsert("t", events, ["id"])
    assert 1 <= n <= 8
    got = {(r["id"], r["v"]) for r in store.read("t").collect()}
    expect = {(i, i * 10) for i in range(1, 9) if i not in (2, 3)} | {(2, 21), (100, 1)}
    assert got == expect


def test_partitioned_untouched_buckets_not_rewritten(spark, tmp_path):
    store = PartitionedParquetStateStore(spark, str(tmp_path), n_buckets=16)
    state = spark.createDataFrame([(i, i) for i in range(200)], "id long, v long")
    store.init("t", state, ["id"])
    mtimes_before = {
        d: os.path.getmtime(os.path.join(str(tmp_path), "t", d))
        for d in os.listdir(str(tmp_path / "t"))
        if d.startswith("_bucket=")
    }
    events = ev_rows(spark, [(Row(id=5, v=5), Row(id=5, v=99), 1, 0)])
    store.upsert("t", events, ["id"])
    mtimes_after = {
        d: os.path.getmtime(os.path.join(str(tmp_path), "t", d))
        for d in os.listdir(str(tmp_path / "t"))
        if d.startswith("_bucket=")
    }
    changed = [d for d in mtimes_before if mtimes_after.get(d) != mtimes_before[d]]
    assert len(changed) == 1  # only the bucket containing id=5
    assert {r["v"] for r in store.read("t").filter("id = 5").collect()} == {99}


def test_partitioned_delete_empties_bucket(spark, tmp_path):
    store = PartitionedParquetStateStore(spark, str(tmp_path), n_buckets=4)
    state = spark.createDataFrame([(1, 10)], "id long, v long")
    store.init("t", state, ["id"])
    events = ev_rows(spark, [(Row(id=1, v=10), None, 1, 0)])
    store.upsert("t", events, ["id"])
    assert store.read("t").count() == 0


def test_evolve_preserves_persisted_layout(spark, tmp_path):
    """evolve() must keep the table's persisted bucket layout even when the
    acting store instance was constructed with different settings."""
    import json

    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore

    writer = PartitionedParquetStateStore(
        spark, str(tmp_path), bucket_mode="range", range_size=10
    )
    writer.init("t", spark.createDataFrame([(15, "a")], "id long, v string"), ["id"])
    # a differently-configured instance evolves the same table
    other = PartitionedParquetStateStore(spark, str(tmp_path), n_buckets=4)
    other.evolve("t", "ALTER TABLE t ADD COLUMNS (extra INT)")
    with open(f"{tmp_path}/t/_layout.json") as fh:
        layout = json.loads(fh.read())
    assert layout["bucket_mode"] == "range" and layout["range_size"] == 10
    assert "extra" in other.read("t").columns
    # rows still live in their range bucket (15 div 10 = 1)
    import os

    assert os.path.isdir(str(tmp_path / "t" / "_bucket=1"))


def test_read_keys_pruned_lookup(spark, tmp_path):
    """read_keys returns exactly the requested rows and its plan prunes to
    the keys' bucket partitions."""
    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore

    store = PartitionedParquetStateStore(
        spark, str(tmp_path), bucket_mode="range", range_size=10
    )
    seed = spark.createDataFrame([(i, f"v{i}") for i in range(1, 101)], "id long, v string")
    store.init("t", seed, ["id"])
    out = store.read_keys("t", [15, 16, 55])
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {15: "v15", 16: "v16", 55: "v55"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert store.read_keys("t", []).count() == 0


def test_read_keys_composite_pk(spark, tmp_path):
    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore

    store = PartitionedParquetStateStore(spark, str(tmp_path), n_buckets=8)
    seed = spark.createDataFrame(
        [(i, j, i * 100 + j) for i in range(10) for j in range(5)],
        "a long, b long, v long",
    )
    store.init("t", seed, ["a", "b"])
    out = store.read_keys("t", [(3, 1), (7, 4)])
    assert {(r["a"], r["b"], r["v"]) for r in out.collect()} == {(3, 1, 301), (7, 4, 704)}
