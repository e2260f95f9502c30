"""Skew-handling utilities: salted aggregation and salted join.

AQE's skew-join handles most runtime skew automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in the engine session);
these explicit operators cover the two cases AQE can't fix:

- **salted two-phase aggregation**: a groupBy where one key holds a large
  fraction of all rows bottlenecks the single reducer that owns it. Phase
  1 aggregates (key, salt) partials across ``n_salts`` reducers; phase 2
  merges the partials per key. Works for any algebraic aggregate
  (sum/count/min/max — pass the merge fn for the second phase).
- **salted broadcast-side replication join**: a shuffle join where one
  left key dominates. The left side gets a random salt in [0, n); the
  right side is replicated n times (one row per salt) so the hot key's
  rows spread over n reducers. Right side must be the smaller one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[tuple[str, Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``aggs``: list of (output_name, phase1_agg_expr, phase2_merge_expr)
    where phase2 operates on the phase1 column, e.g.::

        salted_agg(df, ["k"], [("n", F.count("*"), F.sum("n")),
                               ("total", F.sum("v"), F.sum("total"))])

    The salt is deterministic (hash of all columns mod n) so results are
    reproducible; distribution quality matches random salting for
    non-degenerate rows.
    """
    salt = (F.hash(*[F.col(c) for c in df.columns]) % n_salts + n_salts) % n_salts
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[expr.alias(name) for name, expr, _ in aggs])
    )
    return phase1.groupBy(*key_cols).agg(
        *[merge.alias(name) for name, _, merge in aggs]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side and
    replicate the (small) right side across all salt values."""
    salt = (F.hash(*[F.col(c) for c in left.columns]) % n_salts + n_salts) % n_salts
    l_salted = left.withColumn("_salt", salt)
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_replicated, [*on, "_salt"], how).drop("_salt")
