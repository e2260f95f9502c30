"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference is stateless per message (state lives in MySQL, SURVEY §2.8);
these are the engine's *additive* streaming primitives for pipelines that
need cross-batch memory without an external store:

- :func:`streaming_first_seen` — cross-batch dedup: emit each key's first
  occurrence only (the streaming counterpart of exact_dedup; e.g. URL or
  doc-id dedup in a crawl ingest).
- :func:`streaming_running_counts` — per-key running counters (events seen,
  value sum) emitted per batch — the observability aggregate C-family as a
  live stream.

State is partitioned by key — Spark shuffles each micro-batch by the
grouping key and hands each Python worker its keys' state; scale comes from
key-hash parallelism, and state size is bounded by distinct keys (use a
TTL/timeout for unbounded keyspaces at 100 TB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    events: DataFrame,
    key_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Emit only the first row ever seen for each key (cross-batch).

    Output schema: key + payload columns of that first row."""
    out_fields = [events.schema[key_col]] + [events.schema[c] for c in payload_cols]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            return iter(())
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][[key_col, *payload_cols]]
        state.update((True,))
        if first is None:
            return iter(())
        return iter([first])

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def streaming_running_counts(
    events: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) across all batches so far; one output
    row per key per batch in which the key appeared."""
    key_field = events.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField("running_count", T.LongType()),
            T.StructField("running_sum", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("cnt", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "running_count": [cnt], "running_sum": [total]}
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
