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


def hilbert_key(a: Column, b: Column, bits: int = 15) -> Column:
    """Map two non-negative integer columns (low ``bits`` bits each) onto
    their Hilbert-curve index d in [0, 4^bits).

    The Hilbert curve preserves locality strictly better than the Morton
    curve: every unit step in d moves exactly one grid cell, so file
    ranges along d cover more compact (A, B) rectangles and range
    predicates prune tighter than with :func:`morton_key` (the reason
    newer table formats offer Hilbert clustering alongside Z-order).

    Implements the public iterative xy2d algorithm (per-level quadrant
    digit + reflect/swap rotation) as ONE ``aggregate`` fold over the
    ``bits`` levels with an (x, y, d) struct accumulator — pure integer
    arithmetic, no UDF, linear expression size. Coordinates are taken
    modulo 2^bits; ``bits <= 15`` keeps every intermediate (d plus the
    s*s quadrant term) inside a positive BIGINT with margin."""
    if not 1 <= bits <= 15:
        raise ValueError("bits must be in [1, 15]")
    n = 1 << bits
    x0 = (a.cast("long") % n).alias("x")
    y0 = (b.cast("long") % n).alias("y")
    # pyspark's shiftleft() only takes a literal int shift; the SQL form
    # accepts the lambda-bound level index
    levels = F.expr(f"transform(sequence(1, {bits}), i -> shiftleft(1L, {bits} - i))")
    init = F.struct(x0, y0, F.lit(0).cast("long").alias("d"))

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        # (3*rx) XOR ry for bits, as shared-safe arithmetic
        nd = acc["d"] + s * s * (3 * rx + ry * (1 - 2 * rx))
        refl_x = F.when(rx == 1, F.lit(n - 1) - acc["x"]).otherwise(acc["x"])
        refl_y = F.when(rx == 1, F.lit(n - 1) - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, refl_y).otherwise(acc["x"])
        ny = F.when(ry == 0, refl_x).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), nd.alias("d"))

    return F.aggregate(levels, init, step)["d"]


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
