"""Slowly-changing-dimension (Type 2) history builder over CDC change logs.

The reference applies CDC events destructively — the target table always
holds the latest image (main.go:348-380, the insert/update/delete switch).
Warehouses consuming the same Debezium stream usually ALSO want the history
form: one row per (key, version) with a validity interval, so point-in-time
joins ("what did this order look like on date X?") stay answerable after
the fact. This module derives that SCD Type-2 shape from the same event
stream the apply path consumes.

Semantics (Kimball Type 2):
- every change event opens a new version at its change timestamp;
- the previous version of the same key closes at exactly that timestamp
  (``valid_to`` = next ``valid_from``, half-open intervals — no gaps, no
  overlaps);
- the newest version per key has ``valid_to`` NULL and ``is_current`` true.

Scale design: one shuffle on the business key (the window partition), then
a single ``lead`` per row — the minimal distributed shape for interval
construction. No self-join: ``lead`` over a key-partitioned window is
exactly the sort-merge the naive "join next version" formulation would
shuffle twice for. Ties on the ordering column are broken by ``seq_cols``
so the interval chain is total and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    events: DataFrame,
    keys: list[str],
    order_col: str,
    seq_cols: list[str] | None = None,
) -> DataFrame:
    """Build Type-2 validity intervals from a change-event log.

    ``events`` holds one row per change (the after-image plus ``order_col``,
    typically the source commit timestamp). Returns the input columns plus
    ``valid_from`` / ``valid_to`` / ``is_current``; ``valid_to`` is the next
    version's ``valid_from`` (half-open) and NULL for the current version.
    """
    order = [F.col(order_col)] + [F.col(c) for c in (seq_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(order_col).over(w)
    return events.select(
        "*",
        F.col(order_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
