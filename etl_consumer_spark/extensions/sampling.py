"""Deterministic sampling / splitting operators for training-data pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent and
differs across engines; these operators derive assignment from a content
hash instead, so splits are (a) reproducible run-to-run, (b) stable under
repartitioning and incremental re-runs (a document keeps its split when
the corpus grows), and (c) verifiable against any engine with md5.

All pure expressions; the only shuffle is the window in
:func:`per_group_quota`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0,1) value derived from md5(salt||key) — the portable
    substitute for rand(seed)."""
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10)
    return bucket.cast("double") / F.lit(float(16**8))


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by hashed
    key. Weights must sum to 1. Adds a ``split`` column."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    frac = hash_fraction(F.col(key_col), salt)
    expr = None
    cumulative = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cumulative += w
        cond = frac < F.lit(cumulative)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "sample") -> DataFrame:
    """Keep a stable ``fraction`` of rows by hashed key."""
    return df.filter(hash_fraction(F.col(key_col), salt) < F.lit(fraction))


def per_group_quota(
    df: DataFrame,
    group_col: str,
    quota: int,
    order_col: str | None = None,
    salt: str = "quota",
) -> DataFrame:
    """Cap rows per group (e.g. max N documents per source/domain — the
    anti-boilerplate guard in corpus curation). Ranking is deterministic:
    by ``order_col`` if given, else by hashed key (a stable 'random'
    subset). Ties broken by the group+order hash."""
    order = F.col(order_col) if order_col else hash_fraction(F.col(group_col), salt)
    w = Window.partitionBy(group_col).orderBy(order.asc())
    return df.withColumn("_qrank", F.row_number().over(w)).filter(F.col("_qrank") <= quota).drop("_qrank")
