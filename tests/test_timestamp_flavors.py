"""Environment-drift regression: timestamp parquet flavor robustness.

Round 3 broke when the driver regenerated /root/testdata as plain
(non-UTC-adjusted) parquet timestamps, which Spark 4.x with
``spark.sql.parquet.inferTimestampNTZ.enabled=true`` surfaces as
TIMESTAMP_NTZ — and ``unix_millis``, ``cast(long)``, and
``withWatermark`` all reject NTZ. ``load_table`` must normalize EVERY
flavor the environment can produce to plain TimestampType:

- ``timestamp[us]`` with isAdjustedToUTC=true (instant flavor)
- ``timestamp[us]`` without the flag (NTZ flavor — current testdata)
- ``timestamp[ns]`` (nanos; Spark can't read natively)

This test writes all three flavors of the same data and asserts
identical post-load values + that the previously-broken operations work.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from etl_consumer_spark.sources.tables import load_table

ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
    (2, dt.datetime(2024, 6, 15, 12, 34, 56, 789000)),
    (3, dt.datetime(2025, 12, 31, 23, 59, 59)),
]


def _write_flavor(base: str, flavor: str) -> str:
    ids = pa.array([r[0] for r in ROWS], pa.int64())
    if flavor == "utc_us":
        ts = pa.array([r[1] for r in ROWS], pa.timestamp("us", tz="UTC"))
    elif flavor == "ntz_us":
        ts = pa.array([r[1] for r in ROWS], pa.timestamp("us"))
    elif flavor == "ntz_ns":
        ts = pa.array([r[1] for r in ROWS], pa.timestamp("ns"))
    else:  # pragma: no cover
        raise ValueError(flavor)
    table = pa.table({"event_id": ids, "ts": ts})
    sf_dir = os.path.join(base, flavor)
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


FLAVORS = ("utc_us", "ntz_us", "ntz_ns")


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ts_flavors"))
    return {f: _write_flavor(base, f) for f in FLAVORS}


@pytest.mark.parametrize("flavor", FLAVORS)
def test_load_table_normalizes_to_timestamp(spark, flavor_dirs, flavor):
    df = load_table(spark, flavor_dirs[flavor], "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"{flavor}: expected TimestampType, got {df.schema['ts'].dataType}"
    )


@pytest.mark.parametrize("flavor", FLAVORS)
def test_unix_millis_and_long_cast_work(spark, flavor_dirs, flavor):
    """The two batch operations that threw AnalysisException on NTZ."""
    df = load_table(spark, flavor_dirs[flavor], "events")
    got = (
        df.select(
            "event_id",
            F.unix_millis("ts").alias("ms"),
            F.col("ts").cast("long").alias("es"),
        )
        .orderBy("event_id")
        .collect()
    )
    # session TZ pinned UTC by load_table → wall-clock == UTC instant
    expect_ms = [
        int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1000) for r in ROWS
    ]
    assert [r["ms"] for r in got] == expect_ms
    assert [r["es"] for r in got] == [m // 1000 for m in expect_ms]


def test_all_flavors_identical_values(spark, flavor_dirs):
    """Same logical rows regardless of physical flavor (ns truncates to us)."""
    seen = {}
    for flavor in FLAVORS:
        df = load_table(spark, flavor_dirs[flavor], "events")
        seen[flavor] = [
            (r["event_id"], r["ts"]) for r in df.orderBy("event_id").collect()
        ]
    assert seen["utc_us"] == seen["ntz_us"] == seen["ntz_ns"]


@pytest.mark.parametrize("flavor", ("utc_us", "ntz_us"))
def test_watermark_accepts_normalized_ts(spark, flavor_dirs, flavor, tmp_path):
    """withWatermark rejected NTZ event time; the streaming queries feed
    readStream.schema(ev.schema) from a post-load_table frame, so the
    normalized schema must be watermark-eligible."""
    import uuid

    ev = load_table(spark, flavor_dirs[flavor], "events")
    in_dir = str(tmp_path / f"in_{flavor}")
    ev.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(ev.schema).parquet(in_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    sink = f"flav_{flavor}_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{flavor}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table(sink).count() == len(ROWS)
