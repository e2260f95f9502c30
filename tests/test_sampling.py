"""Deterministic sampling/splitting operator tests."""

from __future__ import annotations

import pytest

from etl_consumer_spark.extensions.sampling import (
    deterministic_sample,
    deterministic_split,
    per_group_quota,
)
from etl_consumer_spark.sources.tables import load_table


def test_split_stable_under_repartition(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = {(r["doc_id"], r["split"]) for r in deterministic_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in deterministic_split(docs.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).select("doc_id", "split").collect()}
    assert a == b
    by_split = {}
    for _, s in a:
        by_split[s] = by_split.get(s, 0) + 1
    assert by_split["train"] > by_split["val"] and by_split["train"] > by_split["test"]


def test_split_weights_validated(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError):
        deterministic_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_deterministic_sample_fraction(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    kept = deterministic_sample(docs, "doc_id", 0.3).count()
    assert 0.15 * n < kept < 0.45 * n
    # stability: same rows every time
    again = deterministic_sample(docs, "doc_id", 0.3).count()
    assert kept == again


def test_per_group_quota(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = per_group_quota(docs, "source", quota=5)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert all(v <= 5 for v in counts.values())
