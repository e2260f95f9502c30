"""Property-based tests (hypothesis) for the decoder family, batched: each
example generates a value list, runs ONE Spark job, and compares against
pure-Python reference implementations of the Go semantics."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_consumer_spark import functions as EF
from tests.test_decoders import py_encode


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=-(2**119), max_value=2**119 - 1), min_size=1, max_size=50))
def test_decimal_unscaled_property(spark, ns):
    df = spark.createDataFrame([(py_encode(n), str(n)) for n in ns], "b64 string, n string")
    out = df.select("n", EF.decimal_unscaled("b64").alias("u")).collect()
    for r in out:
        assert int(r["u"]) == int(r["n"])


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=86_399_999_999), min_size=1, max_size=50))
def test_micros_to_time_property(spark, micros):
    def go_format(m: int) -> str:
        # reference main.go:277-287: %d:%d:%d over h/m/s derived from seconds
        sec_total = m // 1_000_000
        return f"{sec_total // 3600}:{(sec_total // 60) % 60}:{sec_total % 60}"

    df = spark.createDataFrame([(m,) for m in micros], "m long")
    out = [r[0] for r in df.select(EF.micros_to_time("m")).collect()]
    assert out == [go_format(m) for m in micros]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=-100_000, max_value=100_000), min_size=1, max_size=50))
def test_epoch_day_property(spark, days):
    df = spark.createDataFrame([(d,) for d in days], "d int")
    out = [r[0] for r in df.select(EF.epoch_day_to_date("d")).collect()]
    epoch = dt.date(1970, 1, 1)
    assert out == [epoch + dt.timedelta(days=d) for d in days]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        # within the reference's (19|20)\d\d regex gate: years 1970..2099
        st.integers(min_value=0, max_value=4_070_908_700_000),
        min_size=1,
        max_size=50,
    )
)
def test_zoned_roundtrip_property(spark, ms_list):
    """ISO string built from each timestamp survives the gate+strip+parse
    path and lands exactly +7h later (reference main.go:289-297)."""
    iso = [
        (dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=(m // 1000) * 1000)).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        for m in ms_list
    ]
    df = spark.createDataFrame([(s,) for s in iso], "z string")
    out = [r[0] for r in df.select(EF.zoned_ts_normalize("z")).collect()]
    for s, got in zip(iso, out):
        parsed = dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
        assert got == parsed + dt.timedelta(hours=7)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_bmp_roundtrip_property(w, h, seed):
    """Any (w, h) raster survives encode→decode byte-exactly in BOTH
    codecs, including BMP's 4-byte row-padding edge cases (w % 4 != 0)."""
    import numpy as np

    from etl_consumer_spark.extensions.multimodal import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.RandomState(seed % (2**31))
    px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    for enc, dec in [(encode_ppm, decode_ppm), (encode_bmp, decode_bmp)]:
        w2, h2, out = dec(enc(px))
        assert (w2, h2) == (w, h)
        np.testing.assert_array_equal(out, px)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=60, unique=True))
def test_bloom_no_false_negatives_property(spark, keys):
    """Bloom membership: every inserted key tests positive regardless of
    key content or count (the no-false-negative invariant)."""
    from etl_consumer_spark.extensions.sketches import bloom_bits, bloom_might_contain

    df = spark.createDataFrame([(k,) for k in keys], "key string")
    bits = {r["word_idx"]: r["bits"] for r in bloom_bits(df).collect()}
    assert all(bloom_might_contain(bits, k) for k in keys)


# ---------------------------------------------------------------------------
# Round-4 codec properties (pure Python, no Spark job needed): WAV is
# lossless for arbitrary int16 signals; JPEG is exact for arbitrary
# constant-per-block rasters and bounded-error for arbitrary rasters.
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, sr):
    import numpy as np

    from etl_consumer_spark.extensions.audio import decode_wav, encode_wav

    v = np.array(samples, dtype=np.int16)
    sr2, out = decode_wav(encode_wav(v, sr))
    assert sr2 == sr
    assert out.tolist() == samples


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.data(),
)
def test_jpeg_constant_block_property(bh, bw, data):
    import numpy as np

    from etl_consumer_spark.extensions.jpeg import decode_jpeg, encode_jpeg

    blocks = np.array(
        [[data.draw(st.integers(0, 255)) for _ in range(bw)] for _ in range(bh)],
        dtype=np.uint8,
    )
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (bw * 8, bh * 8)
    assert (out == img).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40))
def test_jpeg_arbitrary_size_bounded_error(h, w):
    import numpy as np

    from etl_consumer_spark.extensions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(h * 41 + w)
    img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    w2, h2, out = decode_jpeg(encode_jpeg(img))
    assert (w2, h2) == (w, h)
    assert out.shape == (h, w)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 64
