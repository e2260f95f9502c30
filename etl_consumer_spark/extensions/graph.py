"""Graph algorithms over DataFrame edge lists: fixed-point PageRank.

Training-data pipelines weight web documents by link-graph centrality
(quality priors a la Common Crawl harmonic/pagerank scores). This module
gives the engine a PageRank whose results are EXACTLY reproducible across
engines: ranks are integers scaled by ``SCALE`` and every update uses only
integer multiply / floor-divide / sum —

    r0(v)      = SCALE div N
    base       = (15 * (SCALE div N)) div 100
    contrib(u) = r_i(u) div outdeg(u)
    r_{i+1}(v) = base + (85 * sum_{u->v} contrib(u)) div 100

(damping 0.85 as the 85/100 integer pair). Floating-point PageRank sums
doubles in nondeterministic order; the fixed-point form makes the
iteration order-insensitive (integer addition is associative), so a SQL
oracle can replay it with unrolled CTE stages and hash-match bit-for-bit.

Scale design: each iteration is one join (edges x ranks, shuffled on the
join key) plus one groupBy(dst) — the textbook distributed PageRank shape.
Degrees are computed once and reused; the node set and N come from
DataFrames (N joins in via a broadcast 1-row aggregate, no driver count()).
Dangling-node mass is not redistributed (nodes without out-edges simply
leak rank), which is the standard simplification when the edge derivation
guarantees every node has an out-edge — callers must ensure that, and the
registry query's key-derived graph does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000


def pagerank_fixed_point(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """PageRank over a (src, dst) edge list; returns (node, pagerank).

    ``edges`` must be distinct directed pairs where every node appears as a
    src (no dangling nodes). ``pagerank`` is the integer fixed-point rank
    after ``iterations`` rounds at damping 0.85."""
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n1 = nodes.agg(F.count("*").alias("n"))
    # r = SCALE div N; base = (15 * (SCALE div N)) div 100 — all integer
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.expr(f"{SCALE} div n").alias("r")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("r div deg").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .join(incoming, nodes.node == incoming.dst, "left")
            .select(
                "node",
                (
                    F.expr(f"(15 * ({SCALE} div n)) div 100")
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").cast("long").alias("pagerank"))
