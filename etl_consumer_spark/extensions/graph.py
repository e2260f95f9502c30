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


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge list.

    ``edges`` is any (src, dst) list; it is canonicalized to distinct
    undirected pairs first. Returns (node, n_triangles) for every node that
    participates in at least one triangle.

    Scale design — degree-ordered orientation (Suri & Vassilvitskii,
    WWW'11): each undirected edge is directed from its lower-(degree, id)
    endpoint to the higher one, so every node's out-degree is bounded by
    O(sqrt(m)) on any graph and the wedge join (the quadratic step) never
    explodes on high-degree hubs — the "curse of the last reducer" fix.
    Wedges are generated at each node from its out-neighbors only, then
    closed with one semi-join back to the oriented edges. Orientation
    changes intermediate sizes, never the answer, so a plain a<b<c SQL
    oracle validates it.
    """
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    und = edges.select(a, b).filter(F.col("a") != F.col("b")).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # carry (deg, id) ordering tuples on both endpoints, then orient
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    wd = und.join(da, "a").join(db, "b")
    ord_a = F.struct(F.col("deg_a").alias("d"), F.col("a").alias("n"))
    ord_b = F.struct(F.col("deg_b").alias("d"), F.col("b").alias("n"))
    # materialize once: three downstream branches (both wedge sides and the
    # closing join) would otherwise each recompute the scan+distinct+degree
    # chain — Spark does no cross-branch subplan CSE. O(m) rows, the same
    # thing a production run would persist.
    oriented = (
        wd.select(
            F.when(ord_a < ord_b, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(ord_a < ord_b, ord_b).otherwise(ord_a).alias("hi_ord"),
        )
        .select("lo", F.col("hi_ord.n").alias("hi"), "hi_ord")
        .localCheckpoint(eager=True)
    )
    # wedges at each lo node: unordered pairs of its out-neighbors, ordered
    # by the same (deg, id) tuple so each wedge appears exactly once
    e1 = oriented.select(
        F.col("lo").alias("ctr"), F.col("hi").alias("u"), F.col("hi_ord").alias("u_ord")
    )
    e2 = oriented.select(
        F.col("lo").alias("ctr"), F.col("hi").alias("v"), F.col("hi_ord").alias("v_ord")
    )
    wedges = e1.join(e2, "ctr").filter(F.col("u_ord") < F.col("v_ord"))
    # close the wedge: (u, v) must itself be an oriented edge (u = lower ord)
    closing = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    tri = wedges.join(closing, ["u", "v"]).select("ctr", "u", "v")
    members = (
        tri.select(F.col("ctr").alias("node"))
        .union(tri.select(F.col("u").alias("node")))
        .union(tri.select(F.col("v").alias("node")))
    )
    return members.groupBy("node").agg(F.count("*").cast("long").alias("n_triangles"))


def weighted_path_aggregate(
    edges: DataFrame, roots: DataFrame, max_depth: int
) -> DataFrame:
    """BOM explosion / weighted transitive closure: total requirement per
    node = sum over all root-to-node paths (length <= max_depth) of the
    product of edge quantities. ``edges`` is (parent, child, qty) on a DAG;
    ``roots`` is (node). Returns (node, total_qty). All-integer, exact.

    Scale design — level-wise aggregation, NOT path enumeration: because
    sum-of-products distributes over path concatenation
    (sum_paths(prod) at depth d+1 = sum_child(level_d(parent) * qty)),
    each round aggregates to at most |nodes| rows before the next join.
    Path counts grow combinatorially (a dense DAG has millions of paths at
    depth 3); the level table never exceeds the node set. The SQL oracle
    deliberately ENUMERATES paths with a recursive CTE — validating the
    algebraic collapse against the definition.
    """
    level = roots.select("node", F.lit(1).cast("long").alias("q"))
    acc = level
    for _ in range(max_depth):
        level = (
            level.join(edges, level.node == edges.parent)
            .select(edges.child.alias("node"), (level.q * edges.qty).alias("q"))
            .groupBy("node")
            .agg(F.sum("q").alias("q"))
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        acc = acc.unionByName(level)
    return acc.groupBy("node").agg(F.sum("q").cast("long").alias("total_qty"))


def bfs_hops(edges: DataFrame, sources: DataFrame, max_hops: int) -> DataFrame:
    """Multi-source BFS over a directed edge list; returns (node, dist).

    ``sources`` is a one-column (node) DataFrame of distance-0 seeds.
    Classic frontier iteration: each round expands only the newly-discovered
    frontier through one edges-join and one anti-join against the known set
    — per-round cost proportional to the frontier's out-edges, not the
    graph, and ``max_hops`` bounds the rounds. All-integer, so the unrolled
    result is value-exact against a recursive-CTE SQL oracle.
    """
    dist = sources.select(F.col("node"), F.lit(0).cast("long").alias("dist"))
    frontier = dist.select("node")
    for hop in range(1, max_hops + 1):
        reached = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = reached.join(dist, "node", "left_anti").select(
            "node", F.lit(hop).cast("long").alias("dist")
        )
        # localCheckpoint truncates the growing lineage so the plan does not
        # re-expand every prior frontier each round (linear, not quadratic)
        new = new.localCheckpoint(eager=True)
        dist = dist.unionByName(new)
        frontier = new.select("node")
    return dist


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


LPA_B = 1_000_000_000


def label_propagation(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Synchronous label propagation (Raghavan et al., Phys. Rev. E 2007)
    over an undirected edge list; returns (node, community) after
    ``rounds`` rounds.

    Deterministic variant: every node starts labeled with its own id; each
    round it adopts the most frequent label among its neighbors, ties
    broken by the SMALLEST label. The argmax-with-tiebreak is computed
    without any window: the pair (count, label) is packed into one integer
    key ``count * LPA_B - label`` (valid while labels < LPA_B and
    count * LPA_B < 2^63, i.e. degree < ~9.2e9), so ``max(key)`` is a
    map-side-combinable aggregate and the label unpacks exactly on any
    engine — ceil-div for the count, subtraction for the label. Each round
    is one join shuffled on the edge key + two combinable groupBys; the
    synchronous update makes the rounds order-insensitive, so a SQL oracle
    replays them as unrolled CTEs, value-exact."""
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    und = edges.select(a, b).filter(F.col("a") != F.col("b")).distinct()
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    lab = nodes.select("node", F.col("node").cast("long").alias("l"))
    for _ in range(rounds):
        cnt = (
            sym.join(lab.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"), "l")
            .agg(F.count("*").alias("c"))
        )
        pick = cnt.groupBy("node").agg(
            F.max(F.col("c") * LPA_B - F.col("l")).alias("k")
        )
        lab = pick.select(
            "node",
            (
                F.expr(f"((k + {LPA_B - 1}) div {LPA_B}) * {LPA_B}") - F.col("k")
            ).cast("long").alias("l"),
        )
    return lab.select("node", F.col("l").alias("community"))


HITS_SCALE = 1_000_000


def hits_fixed_point(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """HITS hubs & authorities (Kleinberg JACM'99) over a (src, dst) edge
    list; returns (node, hub_score, auth_score) for nodes holding either
    score after ``iterations`` rounds.

    Fixed-point integer arithmetic for cross-engine reproducibility: the
    classic L2 normalization is replaced by max-normalization back to
    ``HITS_SCALE`` using only integer multiply / floor-divide, so every
    update is order-insensitive and a SQL oracle can replay the unrolled
    rounds bit-for-bit (same device as :func:`pagerank_fixed_point`).

        a_{i+1}(v) = max-norm( sum_{u->v} h_i(u) )
        h_{i+1}(u) = max-norm( sum_{u->v} a_{i+1}(v) )

    Scale design: each half-step is one join shuffled on the edge key plus
    one map-side-combinable groupBy — the distributed PageRank shape, twice
    per round. The global max is a broadcast 1-row aggregate. Overflow
    bound: raw * HITS_SCALE must stay under 2^63, so max in-degree must be
    below 2^63 / HITS_SCALE^2 ~ 9.2e6 — comfortably above any real host
    graph's in-degree after the usual hub capping."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # same lineage discipline as pagerank_fixed_point: the edge list feeds
    # TWO joins per round and each half-step's score table feeds the next —
    # without per-round localCheckpoints the unrolled plan doubles per
    # consumer (measured r13: 1049 operators / 364 Exchanges / 184 scans at
    # iterations=2 — planning cost alone dominated the query)
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = nodes.select("node", F.lit(HITS_SCALE).cast("long").alias("score"))
    a = None
    for _ in range(iterations):
        a_raw = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("score").alias("raw"))
            .localCheckpoint(eager=True)  # consumed by the max AND the norm
        )
        amax = a_raw.agg(F.max("raw").alias("mx"))
        a = a_raw.crossJoin(F.broadcast(amax)).select(
            F.col("dst").alias("node"),
            F.expr(f"raw * {HITS_SCALE} div mx").cast("long").alias("score"),
        ).localCheckpoint(eager=True)
        h_raw = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("score").alias("raw"))
            .localCheckpoint(eager=True)
        )
        hmax = h_raw.agg(F.max("raw").alias("mx"))
        h = h_raw.crossJoin(F.broadcast(hmax)).select(
            F.col("src").alias("node"),
            F.expr(f"raw * {HITS_SCALE} div mx").cast("long").alias("score"),
        ).localCheckpoint(eager=True)
    hubs = h.select("node", F.col("score").alias("hub_score"))
    auths = a.select("node", F.col("score").alias("auth_score"))
    return (
        hubs.join(auths, "node", "full_outer")
        .select(
            "node",
            F.coalesce("hub_score", F.lit(0)).cast("long").alias("hub_score"),
            F.coalesce("auth_score", F.lit(0)).cast("long").alias("auth_score"),
        )
    )


def jaccard_link_prediction(
    edges: DataFrame,
    max_degree: int = 100,
    min_common: int = 2,
) -> DataFrame:
    """Common-neighbor / Jaccard link prediction (Liben-Nowell & Kleinberg,
    CIKM'03): score non-adjacent node pairs by the Jaccard similarity of
    their neighborhoods — the classic "people you may know" / related-page
    primitive. ``edges`` is (src, dst); self-loops dropped, direction and
    duplicates normalized away.

    Scale shape: common neighbors are counted by the WEDGE expansion (every
    center emits its neighbor pairs), whose cost is sum(degree^2) —
    quadratic on hubs. Hub nodes (degree > ``max_degree``) are therefore
    REMOVED from the graph before expansion (the capped-LSH discipline:
    bounded work, explicitly documented drop — a celebrity node's
    neighborhood says nothing about link formation anyway). All degrees and
    adjacency checks are computed on the SAME capped subgraph, so Jaccard
    denominators are consistent; the oracle replays the identical cap.

    Returns (node_a, node_b, n_common, jaccard) for non-adjacent pairs
    with >= ``min_common`` shared neighbors; node_a < node_b.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    adj = und.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
        und.select(F.col("b").alias("n"), F.col("a").alias("m"))
    )
    deg = adj.groupBy("n").agg(F.count("*").alias("deg"))
    keep = deg.filter(F.col("deg") <= max_degree).select("n")
    # capped subgraph: BOTH endpoints must survive, then recompute degrees
    # on what's left so the Jaccard denominator matches the numerator's world
    capped = (
        adj.join(keep, "n", "left_semi")
        .join(keep.select(F.col("n").alias("m")), "m", "left_semi")
    )
    cdeg = capped.groupBy("n").agg(F.count("*").alias("deg"))
    # wedge expansion through each center: one row per (neighbor1 < neighbor2)
    l = capped.select(F.col("n").alias("c"), F.col("m").alias("x"))
    r = capped.select(F.col("n").alias("c"), F.col("m").alias("y"))
    common = (
        l.join(r, "c")
        .filter(F.col("x") < F.col("y"))
        .groupBy(F.col("x").alias("node_a"), F.col("y").alias("node_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    # drop already-adjacent pairs: predict NEW links only
    cand = common.join(
        und.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    da = cdeg.select(F.col("n").alias("node_a"), F.col("deg").alias("deg_a"))
    db = cdeg.select(F.col("n").alias("node_b"), F.col("deg").alias("deg_b"))
    return (
        cand.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "n_common",
            (
                F.col("n_common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
