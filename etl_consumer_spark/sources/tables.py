"""Batch parquet table source for the driver's testdata tables.

Handles one physical quirk: some driver tables (``events.ts``) are written as
parquet TIMESTAMP(NANOS), which Spark cannot read natively
([PARQUET_TYPE_ILLEGAL]); we flip ``spark.sql.legacy.parquet.nanosAsLong``
and rebuild a proper TimestampType column (truncating ns → µs, which is also
what the DuckDB oracle sees after its µs conversion).

At 100 TB this stays scan-friendly: the conversion is a per-row projection on
top of the parquet scan — pushdown/pruning still reach the scan because the
cast happens after the columnar read, and we only touch the affected columns.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (footer-only read, cheap)."""
    probe = path
    if os.path.isdir(path):
        inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not inner:
            return []
        probe = os.path.join(path, inner[0])
    schema = pq.read_schema(probe)
    out = []
    for field in schema:
        t = field.type
        if str(t) == "timestamp[ns]":
            out.append(field.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing nanos timestamps to TimestampType.

    Pins the session timezone to UTC: the caller may hand us a vanilla
    session, and every oracle comparison (DuckDB is UTC-naive) plus the
    epoch decoders assume UTC semantics."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # Only rebuild columns Spark actually surfaced as nanos-longs. INT96
        # timestamps also probe as timestamp[ns] in the footer but Spark
        # reads them as proper timestamps already.
        if not isinstance(df.schema[c].dataType, LongType):
            continue
        # exact integer floor-division: `/` would round-trip through double and
        # lose precision for epoch-nanos > 2^53
        micros = F.expr(f"(`{c}` - pmod(`{c}`, 1000)) div 1000")
        df = df.withColumn(c, F.timestamp_micros(micros))
    # Spark 4.x with spark.sql.parquet.inferTimestampNTZ.enabled=true reads
    # plain (non-UTC-adjusted) parquet timestamps as TIMESTAMP_NTZ, which
    # rejects unix_millis(), cast(long), and withWatermark(). Normalize every
    # NTZ column to TimestampType: with the session TZ pinned UTC above, the
    # cast reinterprets the wall-clock as a UTC instant — identical values to
    # what the UTC-naive DuckDB oracle sees, and robust to either parquet
    # flavor the driver regenerates.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for spark.sql usage."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
