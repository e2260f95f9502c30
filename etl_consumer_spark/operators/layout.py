"""Data-layout operators: Z-order (Morton) keys for multi-dimensional
file clustering.

Parquet pruning is one-dimensional: sorting by column A gives tight
row-group min/max stats for A and useless ones for B. Interleaving the
bits of A and B into one Morton key and sorting by THAT gives each file a
small rectangle of the (A, B) space, so range predicates on EITHER column
prune most files — the technique behind Delta's OPTIMIZE ZORDER BY and
Iceberg's sort orders, here as a plain Column expression any writer can
use: ``df.repartitionByRange(F.col("zkey")).sortWithinPartitions("zkey")``
before the write.

Pure integer arithmetic (shifts/masks), identical in Spark and any SQL
engine — no UDF, no codegen break.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer columns
    into a single Z-order key (a's bit i → position 2i, b's → 2i+1).
    ``bits <= 31`` keeps the result inside a positive BIGINT."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return key
