"""Greedy k-center coreset: brute-force differential + invariants."""

from __future__ import annotations

import numpy as np

from etl_consumer_spark.extensions.similarity import kcenter_greedy

SF_DIR = "/root/testdata/sf0.001"


def _kcenter_ref(vecs: dict[int, np.ndarray], k: int):
    """Pure-python farthest-point traversal with the same tie rules."""
    ids = sorted(vecs)
    sel = [ids[0]]
    out = [(0, ids[0], 0)]
    for rnd in range(1, k + 1):
        best = None
        for i in ids:
            d2 = min(int(((vecs[i] - vecs[s]) ** 2).sum()) for s in sel)
            # argmax d2, ties to the LOWEST id
            if best is None or d2 > best[0] or (d2 == best[0] and i < best[1]):
                best = (d2, i)
        out.append((rnd, best[1], best[0]))
        sel.append(best[1])
    return out


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )


def test_kcenter_matches_bruteforce_reference(spark):
    rng = np.random.RandomState(11)
    vecs = {i: rng.randint(-5000, 5000, 6).astype(np.int64) for i in range(30)}
    got = kcenter_greedy(_df(spark, {i: v / 1000.0 for i, v in vecs.items()}), k=5, scale=1000)
    assert got == _kcenter_ref(vecs, 5)


def test_kcenter_picks_the_far_outlier_first(spark):
    vecs = {i: np.zeros(4, dtype=np.int64) + i % 3 for i in range(10)}
    vecs[7] = np.full(4, 9000, dtype=np.int64)  # one far outlier
    got = kcenter_greedy(_df(spark, {i: v / 1000.0 for i, v in vecs.items()}), k=2, scale=1000)
    assert got[0][1] == 0          # seed = lowest id
    assert got[1][1] == 7          # round 1 = the outlier
    # coverage radius row: selection distances never increase
    d2s = [d2 for _, _, d2 in got[1:]]
    assert d2s == sorted(d2s, reverse=True)


def test_kcenter_coverage_row_is_true_radius(spark):
    rng = np.random.RandomState(2)
    vecs = {i: rng.randint(-3000, 3000, 5).astype(np.int64) for i in range(20)}
    k = 4
    got = kcenter_greedy(_df(spark, {i: v / 1000.0 for i, v in vecs.items()}), k=k, scale=1000)
    sel = [cid for _, cid, _ in got[:k]]
    radius = max(
        min(int(((vecs[i] - vecs[s]) ** 2).sum()) for s in sel) for i in vecs
    )
    assert got[k][2] == radius
