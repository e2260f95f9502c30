"""Incremental SCD Type-2 history maintenance over a CDC change stream.

`operators/scd.py:scd2_history` builds Type-2 validity intervals from a
COMPLETE event log in one batch pass. A live pipeline cannot do that — the
log never ends — so this module maintains the history table incrementally,
one micro-batch at a time, inside a Structured Streaming ``foreachBatch``:

per batch:
1. within-batch intervals: each key's new versions get ``valid_to`` from
   ``lead(ts)`` over the batch slice (the last one stays open/current);
2. cross-batch closing: each touched key's existing CURRENT row (written
   by an earlier batch) is closed at the batch's earliest new ``valid_from``
   for that key;
3. one idempotent upsert of (closed + new) rows keyed by
   (business_key, valid_from) through the staged-manifest store commit.

Exactly-once: the streaming checkpoint replays at most the last
uncommitted batch, and the upsert is idempotent — replayed new rows
rewrite identical values, and replayed closings find no remaining current
row (min-valid_from guard), so a crash between store commit and
checkpoint commit converges to the same history.

Scale shape: the history store is range-bucketed on the BUSINESS KEY
(single-size range layout), so step 2 reads each touched key's version
chain from exactly one bucket directory (``read_leading_range`` — bucket
list pruned, O(touched buckets) I/O, never a history scan), and the
staged upsert rewrites only touched buckets. Per-batch cost is
proportional to the batch, not the history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore


class SCD2StreamMaintainer:
    """Maintains a Type-2 history table from an after-image change stream.

    ``batch_df`` rows are (key_col, ts_col, *payload): one row per change
    event, ``ts_col`` strictly increasing per key (the CDC log order).
    History rows are (key, *payload, valid_from, valid_to, is_current)
    keyed by (key, valid_from).
    """

    def __init__(
        self,
        store: PartitionedParquetStateStore,
        table: str,
        key_col: str,
        ts_col: str,
        payload_cols: list[str],
        key_range_size: int = 1024,
    ):
        self.store = store
        self.table = table
        self.key = key_col
        self.ts = ts_col
        self.payload = payload_cols
        self.range_size = key_range_size

    @property
    def pk(self) -> list[str]:
        return [self.key, "valid_from"]

    def seed(self, template: DataFrame) -> None:
        """Initialize an empty history table from an event-batch template
        (schema only — no rows are written)."""
        hist = template.limit(0).select(
            self.key,
            *self.payload,
            F.col(self.ts).alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        self.store.init(
            self.table,
            hist,
            self.pk,
            layout={
                "bucket_mode": "range",
                "range_size": self.range_size,
                "n_buckets": 64,
            },
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(self.key).orderBy(self.ts)
        nxt = F.lead(self.ts).over(w)
        new_rows = batch_df.select(
            self.key,
            *self.payload,
            F.col(self.ts).alias("valid_from"),
            nxt.cast("long").alias("valid_to"),
            nxt.isNull().alias("is_current"),
        ).localCheckpoint(eager=True)  # two consumers below; batch-sized

        # touched keys stay DISTRIBUTED: only the distinct bucket ids (at
        # most n_buckets values) reach the driver inside read_leading_range
        cur = (
            self.store.read_leading_range(
                self.table, new_rows.select(self.key)
            ).filter(F.col("is_current"))
        )
        mins = new_rows.groupBy(self.key).agg(F.min("valid_from").alias("_new_from"))
        closing = (
            cur.join(F.broadcast(mins), self.key)
            # the guard makes replays idempotent: a re-run batch finds the
            # previously-closed rows no longer current (filter above) and
            # never re-opens or double-closes anything
            .filter(F.col("_new_from") > F.col("valid_from"))
            .select(
                self.key,
                *self.payload,
                "valid_from",
                F.col("_new_from").cast("long").alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
        )
        hist_updates = closing.unionByName(new_rows)
        img = F.struct(
            self.key, *self.payload, "valid_from", "valid_to", "is_current"
        )
        events = hist_updates.select(
            img.alias("before"),  # update-shaped: after-image always wins
            img.alias("after"),
            F.col("valid_from").alias("pos"),
            F.lit(int(batch_id)).cast("long").alias("ts_ms"),
        )
        self.store.upsert(self.table, events, self.pk, missing_update="upsert")

    def foreach_batch(self):
        return lambda df, bid: self.apply_batch(df, bid)
