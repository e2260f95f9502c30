"""Incremental rollup maintenance (continuous-aggregate pattern).

A materialized rollup whose aggregates are all MERGEABLE (count, sum, min,
max — the algebraic class) can be maintained incrementally: aggregate only
the new micro-batch, then merge partials with the stored rollup — never
rescan history. This is the timescale/druid continuous-aggregate shape and
the 100 TB answer to "keep a dashboard table fresh": per-batch cost is
O(batch + touched groups), not O(history).

avg/stddev ride along as (sum, count) / (sum, sum², count) pairs finalized
at read time; true holistic aggregates (exact median) need the raw data —
use sketches (see extensions.sketches) for mergeable approximations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# merge function per partial-aggregate kind: how two partials combine
_MERGE = {
    "sum": F.sum,
    "count": F.sum,   # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def merge_partial_rollups(
    frames: list[DataFrame],
    key_cols: list[str],
    agg_cols: dict[str, str],
) -> DataFrame:
    """Merge rollup partials (e.g. the stored rollup plus a new batch's
    rollup): union, then re-aggregate each column with its merge function.
    ``agg_cols`` maps column name -> kind ('sum' | 'count' | 'min' | 'max').
    """
    unknown = {k for k in agg_cols.values() if k not in _MERGE}
    if unknown:
        raise ValueError(f"unmergeable aggregate kinds: {sorted(unknown)}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.groupBy(*key_cols).agg(
        *[_MERGE[kind](c).alias(c) for c, kind in agg_cols.items()]
    )
