"""Analytic operators beyond the reference's surface: as-of join and
sessionization (SURVEY §2.8 — the engine exposes the standard analytics
family; the reference computes none of these).

Both are implemented as compositions of built-in ops (no Python, no
per-key loops):

- **as-of join**: the classic union-and-carry-forward plan — tag right
  rows, union with left rows, and per key let each left row pick up the
  ``last`` right payload at-or-before its timestamp via an ordered window.
  One shuffle (the window partition), no range explosion, skew handled by
  AQE. This beats a windowed cross-join at scale because each row is
  touched once.
- **sessionization**: lag + cumulative-sum-of-gap-breaks, two stacked
  windows over the same partitioning (single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` for the same key (direction='backward'; the
    standard trades-vs-quotes semantics), or of the earliest right row with
    ``right_ts >= left_ts`` (direction='forward'; next-event attribution).

    Right rows must be unique per (key, right_ts) for deterministic output
    — pre-aggregate the right side if not.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r_tagged = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ats"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        )
        .withColumn("_side", F.lit(0))
    )
    # align columns for the union
    l_cols = left.columns
    l_u = l_tagged.select(
        F.col(key), "_ats", "_side",
        F.lit(None).cast(r_tagged.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols if c != key],
    )
    r_u = r_tagged.select(
        F.col(key), "_ats", "_side", "_payload",
        *[F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[c]).alias(f"_l_{c}")
          for c in l_cols if c != key],
    )
    unioned = l_u.unionByName(r_u)
    if direction == "backward":
        # right rows (side=0) sort before left rows at the same timestamp -> "<="
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("_ats").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    else:
        # forward: first right payload at-or-after; right rows sort AFTER the
        # left rows they tie with (side desc) so "=" stays in the frame
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("_ats").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.withColumn("_asof", F.first("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col(key),
        *[F.col(f"_l_{c}").alias(c) for c in l_cols if c != key],
        *[F.col("_asof")[c].alias(c) for c in payload_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_point: str,
    right_point: str,
    lower: int,
    upper: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Banded range join: pair rows with the same ``key`` where
    ``right_point ∈ [left_point + lower, left_point + upper]`` (points are
    integers — epoch days/seconds/millis).

    A naive theta-join degenerates to per-key cross products. This is the
    standard bucketed formulation: left rows replicate into the coarse
    buckets their interval overlaps (``ceil(span/width)+1`` copies — a
    constant), right rows land in exactly one bucket, and the join becomes
    an equi-join on (key, bucket) followed by the exact range filter.
    Shuffle keys are (key, bucket) — high-cardinality, AQE-skew-safe — and
    no row meets more than O(bucket occupancy) candidates, which is what
    keeps it viable at 100 TB. Same plan Databricks' range-join hint
    produces; here it's explicit and engine-independent."""
    span = upper - lower
    if span < 0:
        raise ValueError("upper must be >= lower")
    w = bucket_width or max(span, 1)

    def fdiv(c):
        # exact FLOOR division on longs at any magnitude: SQL `div`
        # truncates toward zero, so adjust when negative with a remainder
        # (float floor() would lose exactness past 2^53)
        c = c.cast("long")
        q = F.call_function("div", c, F.lit(w))
        return F.when((c % w != 0) & (c < 0), q - 1).otherwise(q)

    lo = F.col(left_point) + F.lit(lower)
    hi = F.col(left_point) + F.lit(upper)
    l_buck = left.withColumn("_bucket", F.explode(F.sequence(fdiv(lo), fdiv(hi))))
    r_buck = right.withColumn("_bucket", fdiv(F.col(right_point)))
    joined = l_buck.join(r_buck, [key, "_bucket"]).drop("_bucket")
    return joined.filter(
        (F.col(right_point) >= F.col(left_point) + F.lit(lower))
        & (F.col(right_point) <= F.col(left_point) + F.lit(upper))
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Adds ``session_id``
    (1-based per key) — lag + running sum of break flags."""
    w_order = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(w_order)
    gap_break = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_minutes * 60),
        1,
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(gap_break).over(w_run))
