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


# ---------------------------------------------------------------------------
# aHash robustness + corrupt-record CSV (session-4 wave 5)
# ---------------------------------------------------------------------------

def test_ahash_perturbation_robust_on_varied_sensitive_on_degenerate(spark):
    """±1 on one pixel leaves a VARIED image's hash (near-)unchanged — cells
    sit away from the mean threshold — while a CONSTANT image is the
    degenerate worst case: every cell sits exactly AT the threshold, so one
    nudge flips (almost) every bit. Both verified against the numpy
    reference, proving the Hamming machinery isn't trivially zero."""
    rng = np.random.RandomState(5)
    varied = rng.randint(0, 256, size=(4, 10, 3), dtype=np.uint8)
    pert = varied.copy(); pert[0, 0, 0] = np.uint8(int(pert[0, 0, 0]) + 1 & 0xFF)
    out = M.ahash_images(_media_df(spark, [varied, pert])).collect()
    h = {r["media_id"]: r["ahash"] for r in out}
    d_robust = sum(a != b for a, b in zip(h[0], h[1]))
    assert d_robust <= 2  # at most the perturbed pixel's own cells
    # degenerate case: constant image, all cells AT the threshold
    flat = np.full((4, 8, 3), 100, dtype=np.uint8)
    pert2 = flat.copy(); pert2[0, 0, 0] = 101
    out2 = M.ahash_images(_media_df(spark, [flat, pert2])).collect()
    h2 = {r["media_id"]: r["ahash"] for r in out2}
    d_sens = sum(a != b for a, b in zip(h2[0], h2[1]))
    assert d_sens >= 32  # threshold-straddling flips nearly everything
    for i, r in ((0, flat), (1, pert2)):
        assert h2[i] == _ahash_ref(r[:, :, 0])


def test_registry_ahash_robustness_shape(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    row = QUERIES["mm_ahash_robustness"].fn(spark, SF_DIR).collect()[0]
    # near-invariance: on varied (md5-derived) rasters, a ±1 pixel nudge
    # leaves (almost) every hash untouched — rare threshold-straddling
    # docs may flip bits, which is exactly what the distribution reports
    assert row["n_identical"] >= row["n_pairs"] - 2
    assert row["n_within_3"] >= row["n_identical"]
    assert row["n_pairs"] > 0


def test_csv_corrupt_records_quarantined_not_dropped(spark, tmp_path):
    from pyspark.sql import functions as F

    rows = [(i, "en", "web", 10 * i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, n_chars long")
    line = F.concat_ws(
        ",",
        F.col("doc_id").cast("string"), "lang", "source",
        F.when(F.col("doc_id") % 7 == 6, F.lit("oops")).otherwise(F.col("n_chars").cast("string")),
    )
    df.select(line.alias("value")).write.mode("overwrite").text(str(tmp_path / "in"))
    back = (
        spark.read.schema("doc_id long, lang string, source string, n_chars long, _c string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_c")
        .csv(str(tmp_path / "in"))
    )
    got = back.collect()
    bad = [r for r in got if r["_c"] is not None]
    good = [r for r in got if r["_c"] is None]
    # ids 0..19 with id % 7 == 6 -> exactly {6, 13}; nothing dropped
    assert len(got) == 20
    assert {r["doc_id"] for r in bad} == {6, 13}
    # quarantined rows keep the raw line; the unparseable field is NULL
    assert all(r["n_chars"] is None and "oops" in r["_c"] for r in bad)
    assert sum(r["n_chars"] for r in good) == sum(10 * i for i in range(20) if i % 7 != 6)
