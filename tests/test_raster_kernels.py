"""Direct kernel tests for the two round-10 bounded Arrow kernels
(VERDICT r10 #4): `raster_quadrant_sums` and `raster_value_counts` were
previously exercised only through their queries' oracles; these tests
drive the kernels on HAND-BUILT PPM blobs — including the degenerate 1x1
and odd-dimension rasters the synthesized corpus never produces — and
assert the quadrant/histogram invariants directly."""

from __future__ import annotations

import numpy as np

from etl_consumer_spark.extensions.multimodal import (
    raster_quadrant_sums,
    raster_value_counts,
)


def ppm(w: int, h: int, raster: bytes) -> bytes:
    assert len(raster) == w * h * 3
    return f"P6\n{w} {h}\n255\n".encode() + raster


def media_df(spark, blobs):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)], "media_id long, blob binary"
    )


def quad_rows(spark, blobs):
    out = {}
    for r in raster_quadrant_sums(media_df(spark, blobs)).collect():
        out[(r["media_id"], r["quadrant"])] = (r["px_sum"], r["n_bytes"])
    return out


def test_quadrant_sums_even_dims_exact(spark):
    # 4x4 raster with per-pixel values = row*16 + col, each channel equal
    w = h = 4
    a = np.zeros((h, w, 3), dtype=np.uint8)
    for rr in range(h):
        for cc in range(w):
            a[rr, cc, :] = rr * 16 + cc
    out = quad_rows(spark, [ppm(w, h, a.tobytes())])
    # quadrant order: 0 = top-left, 1 = top-right, 2 = bottom-left, 3 = bottom-right
    expect = {
        0: a[:2, :2].astype(int).sum(),
        1: a[:2, 2:].astype(int).sum(),
        2: a[2:, :2].astype(int).sum(),
        3: a[2:, 2:].astype(int).sum(),
    }
    for q, s in expect.items():
        assert out[(0, q)] == (int(s), 12)  # 2x2 pixels x 3 channels
    # quadrant sums partition the total byte sum
    assert sum(s for s, _ in out.values()) == int(a.astype(int).sum())


def test_quadrant_sums_odd_width_gives_right_half_the_extra_column(spark):
    # 5x4: left quadrants take columns 0-1, right quadrants columns 2-4
    w, h = 5, 4
    a = np.arange(w * h * 3, dtype=np.int64) % 251
    blob = ppm(w, h, a.astype(np.uint8).tobytes())
    out = quad_rows(spark, [blob])
    g = a.reshape(h, w, 3)
    assert out[(0, 0)] == (int(g[:2, :2].sum()), 2 * 2 * 3)
    assert out[(0, 1)] == (int(g[:2, 2:].sum()), 2 * 3 * 3)
    assert out[(0, 2)] == (int(g[2:, :2].sum()), 2 * 2 * 3)
    assert out[(0, 3)] == (int(g[2:, 2:].sum()), 2 * 3 * 3)


def test_quadrant_sums_degenerate_1x1_still_emits_4_rows(spark):
    # 1x1: half-splits are empty except the bottom-right, which owns the pixel
    out = quad_rows(spark, [ppm(1, 1, bytes([7, 11, 13]))])
    assert out[(0, 0)] == (0, 0)
    assert out[(0, 1)] == (0, 0)
    assert out[(0, 2)] == (0, 0)
    assert out[(0, 3)] == (7 + 11 + 13, 3)
    assert len(out) == 4


def test_quadrant_sums_odd_height_3x3(spark):
    # 3x3: top half = row 0, bottom half = rows 1-2 (integer halving)
    w = h = 3
    a = np.full((h, w, 3), 10, dtype=np.uint8)
    a[2, 2, :] = 250  # hot corner lands in quadrant 3
    out = quad_rows(spark, [ppm(w, h, a.tobytes())])
    g = a.astype(int)
    assert out[(0, 0)] == (int(g[:1, :1].sum()), 3)
    assert out[(0, 1)] == (int(g[:1, 1:].sum()), 6)
    assert out[(0, 2)] == (int(g[1:, :1].sum()), 6)
    assert out[(0, 3)] == (int(g[1:, 1:].sum()), 12)
    # the hot corner shows up only in quadrant 3
    assert out[(0, 3)][0] > out[(0, 1)][0]


def test_value_counts_exact_histogram_and_bounds(spark):
    w, h = 4, 2
    raster = bytes([0] * 10 + [255] * 10 + [42] * 4)
    out = raster_value_counts(media_df(spark, [ppm(w, h, raster)])).collect()
    hist = {r["v"]: r["cnt"] for r in out}
    assert hist == {0: 10, 255: 10, 42: 4}
    assert sum(hist.values()) == w * h * 3
    assert all(0 <= v <= 255 for v in hist)


def test_value_counts_degenerate_1x1_and_uniform(spark):
    out = raster_value_counts(
        media_df(spark, [ppm(1, 1, bytes([9, 9, 9])), ppm(2, 2, bytes([5] * 12))])
    ).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], {})[r["v"]] = r["cnt"]
    assert by_media[0] == {9: 3}  # single pixel, one histogram row
    assert by_media[1] == {5: 12}  # uniform raster collapses to one level


def test_value_counts_feed_mediancut_palette_invariants(spark):
    """The histogram is the sole input of the median-cut palette query;
    replay the depth-1 cut on a crafted bimodal raster and check the
    palette invariants (lo mean <= cut < hi mean, sides partition mass)."""
    raster = bytes([10] * 30 + [200] * 18)  # n=48, median mass sits at v=10
    out = raster_value_counts(media_df(spark, [ppm(4, 4, raster)])).collect()
    hist = {r["v"]: r["cnt"] for r in out}
    n = sum(hist.values())
    c = 0
    cut = None
    for v in sorted(hist):
        c += hist[v]
        if 2 * c >= n:
            cut = v
            break
    assert cut == 10
    n_lo = sum(k for v, k in hist.items() if v <= cut)
    n_hi = n - n_lo
    assert (n_lo, n_hi) == (30, 18)
    pal_lo = sum(v * k for v, k in hist.items() if v <= cut) // n_lo
    pal_hi = sum(v * k for v, k in hist.items() if v > cut) // n_hi
    assert pal_lo <= cut < pal_hi
    assert (pal_lo, pal_hi) == (10, 200)


def test_run_lengths_exact_and_degenerate(spark):
    from etl_consumer_spark.extensions.multimodal import raster_run_lengths

    blobs = [
        ppm(2, 2, bytes([5] * 12)),                      # constant: 1 run of 12
        ppm(2, 2, bytes([1, 2] * 6)),                    # alternating: 12 runs of 1
        ppm(1, 1, bytes([9, 9, 13])),                    # 1x1 pixel: runs 2, max 2
        ppm(4, 1, bytes([7] * 5 + [8] * 3 + [7] * 4)),   # mixed: runs 3, max 5
    ]
    out = {
        r["media_id"]: (r["n_bytes"], r["n_runs"], r["max_run"])
        for r in raster_run_lengths(media_df(spark, blobs)).collect()
    }
    assert out[0] == (12, 1, 12)
    assert out[1] == (12, 12, 1)
    assert out[2] == (3, 2, 2)
    assert out[3] == (12, 3, 5)
    # invariant: run lengths partition the raster (max_run <= n_bytes,
    # n_runs in [1, n_bytes])
    for n_bytes, n_runs, max_run in out.values():
        assert 1 <= n_runs <= n_bytes and max_run <= n_bytes
