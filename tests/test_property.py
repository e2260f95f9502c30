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
