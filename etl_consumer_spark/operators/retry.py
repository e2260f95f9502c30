"""Retry / republish operators E1-E3 (SURVEY §2.5).

Reference flow (main.go:98-115,149-167): on exec failure, read the ``loop``
Kafka header (default count 1, else header+1), and republish the raw message
with the incremented header while ``count < REPUBLISH_LIMIT`` (default 3).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def loop_count_from_headers(headers: ColumnOrName) -> Column:
    """E1 — extract the ``loop`` retry counter from a Kafka ``headers``
    column (``array<struct<key:string,value:binary>>``, as produced by the
    Kafka source with includeHeaders). Null when absent or non-numeric
    (reference: strconv.Atoi failure keeps the default, main.go:104-108)."""
    h = _col(headers)
    loop = F.filter(h, lambda x: x["key"] == F.lit("loop"))
    # try_element_at: ANSI-safe when no loop header is present
    raw = F.try_element_at(loop, F.lit(1))["value"].cast("string")
    return raw.try_cast("int")


def next_attempt(loop_count: ColumnOrName) -> Column:
    """E1 — attempt number for this failure: header+1 when the header was
    present and numeric, else 1 (reference: main.go:99-109)."""
    return F.coalesce(_col(loop_count) + 1, F.lit(1))


def republish_gate(loop_count: ColumnOrName, limit: int = 3) -> Column:
    """E2 — true when the failed message should be republished:
    ``count < limit`` (reference: main.go:111-114; limit default 3
    config/config.go:21)."""
    return next_attempt(loop_count) < F.lit(limit)


def with_retry_columns(df: DataFrame, limit: int = 3, headers_col: str = "headers") -> DataFrame:
    """Convenience: derive (loop_count, next_attempt, republish) from a
    Kafka-sourced DataFrame with headers."""
    lc = loop_count_from_headers(headers_col)
    return (
        df.withColumn("loop_count", lc)
        .withColumn("next_attempt", next_attempt(F.col("loop_count")))
        .withColumn("republish", republish_gate(F.col("loop_count"), limit))
    )


def republish_headers(attempt: ColumnOrName, delay_ms: int | None = None) -> Column:
    """E1/E3 write side — the ``headers`` column for the Kafka republish
    sink: one ``loop`` header carrying the attempt number (reference:
    main.go:183-187) and, when ``delay_ms`` is set, a ``not_before`` header
    (epoch millis) implementing the reference's pre-republish delay
    (main.go:180) without per-row sleeps: the consume side defers
    not-yet-due messages (see :func:`not_before_from_headers` /
    ``sinks.republish.split_due``)."""
    loop_h = F.struct(
        F.lit("loop").alias("key"),
        _col(attempt).cast("string").cast("binary").alias("value"),
    )
    if delay_ms is None:
        return F.array(loop_h)
    due = (F.unix_millis(F.current_timestamp()) + F.lit(delay_ms)).cast("string")
    return F.array(
        loop_h,
        F.struct(F.lit("not_before").alias("key"), due.cast("binary").alias("value")),
    )


def not_before_from_headers(headers: ColumnOrName) -> Column:
    """E3 read side — the ``not_before`` epoch-millis deadline, null when the
    header is absent/non-numeric (then the message is immediately due)."""
    h = _col(headers)
    nb = F.filter(h, lambda x: x["key"] == F.lit("not_before"))
    return F.try_element_at(nb, F.lit(1))["value"].cast("string").try_cast("long")
