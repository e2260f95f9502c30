"""Session-4 additions: mergeable moments, perceptual aHash image dedup,
small-file compaction, CUBE grouping sets."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_consumer_spark.extensions import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# aHash
# ---------------------------------------------------------------------------

def _ahash_ref(gray: np.ndarray, grid: int = 8) -> str:
    """Independent pure-numpy reference of the kernel's contract."""
    h, w = gray.shape
    ys = (np.arange(grid) * h // grid).clip(0, h - 1)
    xs = (np.arange(grid) * w // grid).clip(0, w - 1)
    cells = gray[np.ix_(ys, xs)].astype(np.int64)
    total = int(cells.sum())
    return "".join("1" if v * grid * grid >= total else "0" for v in cells.reshape(-1))


def _media_df(spark, rasters):
    rows = []
    for i, ras in enumerate(rasters):
        rows.append((i, bytearray(M.encode_ppm(ras)), {"width": ras.shape[1], "height": ras.shape[0]}))
    return spark.createDataFrame(
        rows, "media_id long, blob binary, meta struct<width:int,height:int>"
    )


def test_ahash_constant_image_is_all_ones(spark):
    ras = np.full((4, 8, 3), 77, dtype=np.uint8)
    out = M.ahash_images(_media_df(spark, [ras])).collect()
    # every cell equals the mean, and >= includes equality
    assert out[0]["ahash"] == "1" * 64


def test_ahash_matches_numpy_reference_and_duplicates_collide(spark):
    rng = np.random.RandomState(7)
    rasters = [rng.randint(0, 256, size=(4, 8 + (i % 8), 3), dtype=np.uint8) for i in range(6)]
    rasters.append(rasters[0].copy())  # exact duplicate image
    out = {r["media_id"]: r["ahash"] for r in M.ahash_images(_media_df(spark, rasters)).collect()}
    for i, ras in enumerate(rasters):
        assert out[i] == _ahash_ref(ras[:, :, 0]), f"image {i}"
    assert out[6] == out[0]
    assert len(out[0]) == 64 and set(out[0]) <= {"0", "1"}


def test_ahash_distinguishes_light_dark_halves(spark):
    ras = np.zeros((4, 8, 3), dtype=np.uint8)
    ras[:, 4:, :] = 200  # right half bright
    got = M.ahash_images(_media_df(spark, [ras])).collect()[0]["ahash"]
    # row-major: each row of 8 bits is 0000 1111
    assert got == "00001111" * 8


# ---------------------------------------------------------------------------
# moments
# ---------------------------------------------------------------------------

def _moments_ref(xs: np.ndarray):
    n = len(xs)
    mean = xs.mean()
    m2 = ((xs - mean) ** 2).mean()
    m3 = ((xs - mean) ** 3).mean()
    m4 = ((xs - mean) ** 4).mean()
    return mean, m2, m3 / m2**1.5, m4 / m2**2


def test_sketch_moments_matches_central_moment_reference(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    out = {r["event_type"]: r for r in QUERIES["sketch_moments"].fn(spark, SF_DIR).collect()}
    import duckdb

    raw = duckdb.sql(
        f"SELECT event_type, CAST(floor(value) AS BIGINT) AS x FROM '{SF_DIR}/events.parquet'"
    ).fetchdf()
    for et, grp in raw.groupby("event_type"):
        xs = grp["x"].to_numpy(dtype=np.float64)
        mean, var, skew, kurt = _moments_ref(xs)
        row = out[et]
        assert row["n"] == len(xs)
        assert row["mean"] == pytest.approx(mean, rel=1e-9)
        assert row["variance"] == pytest.approx(var, rel=1e-9)
        assert row["skewness"] == pytest.approx(skew, rel=1e-6)
        assert row["kurtosis"] == pytest.approx(kurt, rel=1e-6)


def test_power_sums_merge_across_partitions(spark):
    """The mergeability claim: power sums of a union are the sums of the
    parts — moments from merged sums equal moments computed directly."""
    rng = np.random.RandomState(3)
    a, b = rng.randint(0, 400, 500), rng.randint(0, 400, 300)
    both = np.concatenate([a, b])

    def sums(xs):
        xs = xs.astype(object)  # exact python ints
        return np.array([len(xs), xs.sum(), (xs**2).sum(), (xs**3).sum(), (xs**4).sum()], dtype=object)

    merged = sums(a) + sums(b)
    assert (merged == sums(both)).all()


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------

def test_layout_compaction_counts_and_fingerprint(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(16).write.mode("overwrite").parquet(str(tmp_path / "small"))
    small_files = [f for f in os.listdir(tmp_path / "small") if f.endswith(".parquet")]
    assert len(small_files) == 16
    (
        spark.read.parquet(str(tmp_path / "small"))
        .repartition(2)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "compacted"))
    )
    comp_files = [f for f in os.listdir(tmp_path / "compacted") if f.endswith(".parquet")]
    assert len(comp_files) == 2

    def fp(df):
        h = F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 12), 16, 10).cast("long")
        return df.select(h.alias("fp")).agg(F.expr("bit_xor(fp)")).collect()[0][0]

    assert fp(spark.read.parquet(str(tmp_path / "compacted"))) == fp(docs)
    assert spark.read.parquet(str(tmp_path / "compacted")).count() == docs.count()


# ---------------------------------------------------------------------------
# grouping sets
# ---------------------------------------------------------------------------

def test_cube_gid_matches_manual_unions(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    cube = QUERIES["olap_cube_grouping_id"].fn(spark, SF_DIR).collect()
    by_gid = {}
    for r in cube:
        by_gid.setdefault(r["gid"], []).append(r)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # gid bit order: first cube column (status) is the most significant bit
    assert len(by_gid[0]) == orders.select("o_orderstatus", "o_orderpriority").distinct().count()
    assert len(by_gid[1]) == orders.select("o_orderstatus").distinct().count()
    assert len(by_gid[2]) == orders.select("o_orderpriority").distinct().count()
    assert len(by_gid[3]) == 1
    assert by_gid[3][0]["n_orders"] == orders.count()
    assert sum(r["n_orders"] for r in by_gid[0]) == orders.count()
    # every rollup row's total equals the sum of its full-lattice children
    full = {(r["o_orderstatus"], r["o_orderpriority"]): r["total_cents"] for r in by_gid[0]}
    for r in by_gid[1]:
        kids = [v for (s, _), v in full.items() if s == r["o_orderstatus"]]
        assert r["total_cents"] == sum(kids)
