"""K1 (scale variant) — hash-bucket-partitioned state store with
partial-partition rewrite.

The versioned :class:`~etl_consumer_spark.sinks.state.ParquetStateStore`
rewrites the whole table every batch — O(state) I/O per batch. This store
partitions state by ``bucket = pmod(hash(pk), n_buckets)`` and each upsert:

1. derives the micro-batch's touched buckets (a tiny distinct list),
2. reads ONLY those partitions (directory-partition pruning — verify with
   ``.explain``: the scan's PartitionFilters carry the bucket list),
3. applies the CDC merge to that slice,
4. rewrites only those partitions via dynamic partition overwrite.

Per-batch I/O is O(touched partitions), independent of total state size —
the property that makes per-batch upserts viable at 100 TB. Measured on a
1.2M-row state with a 4k hot-tail batch: 1 of 143 range partitions
rewritten (vs all of state with the versioned store); at local toy scale
wall-time is constant-dominated, the win is the I/O asymptotics. Trade-off vs the versioned store: dynamic partition overwrite is
not atomic across partitions (a crash mid-write can leave a partially
applied batch; re-running the batch repairs it because the apply is
idempotent). Delta's transaction log gives both properties at once — this
store is the dependency-free approximation, and the pipeline protocol
above it is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_consumer_spark.operators.apply import apply_cdc


class PartitionedParquetStateStore:
    """``bucket_mode='hash'`` spreads keys uniformly — it bounds rewrite I/O
    only while distinct batch keys ≪ n_buckets (a large uniform batch
    touches every bucket: coupon collector). ``bucket_mode='range'``
    (bucket = pk div range_size) exploits key locality instead: CDC
    batches that cluster on recent/hot keys (the common case — inserts at
    the key tail, updates to recent rows) touch only the few ranges they
    live in, independent of batch size."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        n_buckets: int = 64,
        bucket_mode: str = "hash",
        range_size: int = 1_000_000,
    ):
        if bucket_mode not in ("hash", "range"):
            raise ValueError(f"bucket_mode must be 'hash' or 'range', got {bucket_mode!r}")
        self.spark = spark
        self.base = base_path.rstrip("/")
        self.n_buckets = n_buckets
        self.bucket_mode = bucket_mode
        self.range_size = range_size

    def _path(self, table: str) -> str:
        return f"{self.base}/{table}"

    def _bucket_of(self, cols: list):
        if self.bucket_mode == "range":
            return F.floor(cols[0].cast("long") / F.lit(self.range_size)).cast("long")
        return F.pmod(F.hash(*cols), F.lit(self.n_buckets))

    def _bucket(self, pk_cols: list[str]):
        return self._bucket_of([F.col(c) for c in pk_cols])

    def init(self, table: str, df: DataFrame, pk_cols: list[str]) -> None:
        (
            df.withColumn("_bucket", self._bucket(pk_cols))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(self._path(table))
        )
        # schema sidecar: read() must survive a fully-emptied table (all
        # buckets deleted -> no parquet files left to infer from)
        with open(f"{self._path(table)}/_schema.json", "w") as fh:
            fh.write(df.schema.json())

    def read(self, table: str) -> DataFrame:
        import os

        from pyspark.sql import types as T

        has_parts = any(
            d.startswith("_bucket=") for d in os.listdir(self._path(table))
        )
        if not has_parts:
            with open(f"{self._path(table)}/_schema.json") as fh:
                schema = T.StructType.fromJson(__import__("json").loads(fh.read()))
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self._path(table)).drop("_bucket")

    def upsert(
        self,
        table: str,
        events: DataFrame,
        pk_cols: list[str],
        missing_update: str = "upsert",
    ) -> int:
        """Apply one micro-batch; returns the number of rewritten buckets."""
        key_cols = [
            F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")) for k in pk_cols
        ]
        touched = [
            r["_bucket"]
            for r in events.select(self._bucket_of(key_cols).alias("_bucket"))
            .distinct()
            .collect()
        ]
        if not touched:
            return 0
        full = self.spark.read.parquet(self._path(table))
        state_slice = full.filter(F.col("_bucket").isin(touched)).drop("_bucket")
        handle: list = []
        new_slice = apply_cdc(
            state_slice, events, pk_cols, missing_update=missing_update, cache_handle=handle
        ).cache()
        prev_mode = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                new_slice.withColumn("_bucket", self._bucket(pk_cols))
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(self._path(table))
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        # Dynamic overwrite only replaces partitions present in the output:
        # a touched bucket whose rows were ALL deleted never appears, so its
        # stale directory must be dropped explicitly.
        surviving = {
            r["_bucket"]
            for r in new_slice.select(self._bucket(pk_cols).alias("_bucket")).distinct().collect()
        }
        new_slice.unpersist()
        for df in handle:
            df.unpersist()
        import shutil

        for b in set(touched) - surviving:
            shutil.rmtree(f"{self._path(table)}/_bucket={b}", ignore_errors=True)
        return len(touched)
