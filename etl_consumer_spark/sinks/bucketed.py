"""Bucketed-table support: co-located, shuffle-free joins.

At 100 TB the dominant cost of repeated state⋈batch / fact⋈fact joins is
the shuffle. Writing both sides bucketed by the join key
(``bucketBy(n, key) .sortBy(key)``) pins co-partitioning into the table
layout, so later equi-joins on that key run with ZERO Exchange — verified
by the test asserting the join plan has no shuffle.

Bucketed writes require the session catalog (``saveAsTable``); bucket
count should be sized so each bucket ≈ one task's worth of data at the
target scale and must match on both join sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with no Exchange on either
    side (bucket pruning + per-bucket task alignment)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (broadcast
    exchanges don't count — they move the small side, not the data)."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return re.search(r"(?<!Broadcast)Exchange", buf.getvalue()) is not None
