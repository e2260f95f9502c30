"""Triangle counting and BFS: property tests against brute-force references.

The registry oracles already value-check both queries against DuckDB on the
driver tables; these tests pin the ALGORITHMS on adversarial hand-built
graphs (hub-heavy, disconnected, cyclic) where the degree-ordered
orientation and the frontier iteration have to earn their keep.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from etl_consumer_spark.extensions.graph import bfs_hops, triangle_counts


def _brute_triangles(edges: set[tuple[int, int]]) -> dict[int, int]:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    counts: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_match_bruteforce_on_hub_graph(spark):
    # hub node 0 connected to everyone, plus a chain and one clique
    edges = [(0, i) for i in range(1, 10)]
    edges += [(1, 2), (2, 3), (3, 4)]          # chain: triangles with hub
    edges += [(5, 6), (6, 7), (5, 7)]          # clique among spokes
    edges += [(20, 21)]                        # isolated edge: no triangle
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(set(edges))


def test_triangle_counts_direction_and_duplicate_insensitive(spark):
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(b, a) for a, b in base] + base  # reversed + duplicated
    df = spark.createDataFrame(noisy, "src: long, dst: long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_bfs_hops_min_distance_and_unreachable(spark):
    #   0 -> 1 -> 2 -> 3 -> 4   and a shortcut 0 -> 3; 9 isolated target
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (8, 9)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    src = spark.createDataFrame([(0,)], "node: long")
    got = {r.node: r.dist for r in bfs_hops(e, src, max_hops=4).collect()}
    # shortcut wins: dist(3) = 1 not 3; 4 reached via the shortcut at 2
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}


def test_bfs_hops_bounded_by_max_hops(spark):
    edges = [(i, i + 1) for i in range(6)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    src = spark.createDataFrame([(0,)], "node: long")
    got = {r.node: r.dist for r in bfs_hops(e, src, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_multi_source_takes_nearest_seed(spark):
    edges = [(0, 1), (1, 2), (2, 3), (10, 3)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    src = spark.createDataFrame([(0,), (10,)], "node: long")
    got = {r.node: r.dist for r in bfs_hops(e, src, max_hops=4).collect()}
    assert got[3] == 1  # via seed 10, not 3 hops from seed 0


def test_weighted_path_aggregate_diamond_and_depth(spark):
    from etl_consumer_spark.extensions.graph import weighted_path_aggregate

    #      1 --2--> 2 --3--> 4
    #      1 --5--> 3 --7--> 4      (diamond: two paths into 4)
    #      4 --1--> 5 --1--> 6 --1--> 7   (7 is 4 hops from root: cut off)
    edges = spark.createDataFrame(
        [(1, 2, 2), (1, 3, 5), (2, 4, 3), (3, 4, 7), (4, 5, 1), (5, 6, 1), (6, 7, 1)],
        "parent: long, child: long, qty: long",
    )
    roots = spark.createDataFrame([(1,)], "node: long")
    got = {r.node: r.total_qty
           for r in weighted_path_aggregate(edges, roots, max_depth=3).collect()}
    # 4: 2*3 + 5*7 = 41; 5: 41*1 (depth 3); 6,7 beyond depth
    assert got == {1: 1, 2: 2, 3: 5, 4: 41, 5: 41}


def test_weighted_path_aggregate_multi_root_sums(spark):
    from etl_consumer_spark.extensions.graph import weighted_path_aggregate

    edges = spark.createDataFrame(
        [(1, 3, 2), (2, 3, 10)], "parent: long, child: long, qty: long"
    )
    roots = spark.createDataFrame([(1,), (2,)], "node: long")
    got = {r.node: r.total_qty
           for r in weighted_path_aggregate(edges, roots, max_depth=2).collect()}
    assert got == {1: 1, 2: 1, 3: 12}
