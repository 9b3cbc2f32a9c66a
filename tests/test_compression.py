"""Gorilla XOR + delta-of-delta round-trip: property-based (hypothesis) and
through the Spark payload stage (FIXTURES.md §E)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from timeseries_harmonizer_spark.functions import compression as C

finite_or_weird = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.sampled_from([0.0, -0.0, 5e-324, -5e-324, 1e308, -1e308, float("nan")]),
)


@given(st.lists(finite_or_weird, max_size=300))
@settings(max_examples=150, deadline=None)
def test_float_roundtrip_bitexact(vals):
    v = np.array(vals, dtype=np.float64)
    back = C.decode_floats(C.encode_floats(v))
    assert v.view(np.uint64).tobytes() == back.view(np.uint64).tobytes()


@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), max_size=300
    )
)
@settings(max_examples=150, deadline=None)
def test_ts_roundtrip(ts):
    t = np.array(ts, dtype=np.int64)
    back = C.decode_timestamps(C.encode_timestamps(t))
    assert np.array_equal(t, back)


@given(
    st.lists(finite_or_weird, min_size=1, max_size=200),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_grouped_encoders_byte_identical(vals, data):
    """encode_*_grouped must produce EXACTLY the bytes of the per-group
    scalar encoders for any contiguous group split — the payload stage's
    batch vectorization can never change the storage format."""
    v = np.array(vals, dtype=np.float64)
    n = len(v)
    k = data.draw(st.integers(min_value=1, max_value=n))
    cuts = sorted(data.draw(
        st.lists(st.integers(min_value=1, max_value=max(n - 1, 1)),
                 max_size=k, unique=True)
    )) if n > 1 else []
    starts = np.array([0] + cuts, dtype=np.int64)
    ends = np.append(starts[1:], n)
    t = (np.arange(n, dtype=np.int64) * 3600 + 1704067200) + (
        v.view(np.int64) % 7
    )  # irregular but deterministic timestamps
    fg = C.encode_floats_grouped(v, starts, ends)
    tg = C.encode_timestamps_grouped(t, starts, ends)
    for i, (a, b) in enumerate(zip(starts, ends)):
        assert fg[i] == C.encode_floats(v[a:b])
        assert tg[i] == C.encode_timestamps(t[a:b])


def test_compression_is_effective():
    t = np.arange(0, 86400, 60, dtype=np.int64) + 1704067200
    v = np.round(np.cumsum(np.ones(len(t))) * 0.25, 5)
    assert len(C.encode_timestamps(t)) < 0.25 * 8 * len(t)
    assert len(C.encode_floats(v)) < 0.8 * 8 * len(v)


def test_spark_payload_roundtrip(spark):
    from timeseries_harmonizer_spark.operators.compress import (
        compress_points,
        decompress_points,
    )

    rng = np.random.default_rng(3)
    n = 3000
    pdf = pd.DataFrame(
        {
            "url": np.repeat([f"u{i}" for i in range(5)], n // 5),
            "start": pd.to_datetime(
                1704067200 + np.tile(np.arange(n // 5) * 60, 5), unit="s"
            ),
            "value": np.round(rng.normal(100, 5, n), 5),
        }
    )
    df = spark.createDataFrame(pdf)
    payloads = compress_points(df, "1m")
    pay_pdf = payloads.toPandas()
    assert (pay_pdf["n"] >= 1).all()
    back = decompress_points(payloads).toPandas()
    a = pdf.sort_values(["url", "start"]).reset_index(drop=True)
    b = back.sort_values(["url", "start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["value"].to_numpy() == b["value"].to_numpy()).all()
    assert (a["start"].to_numpy() == b["start"].to_numpy()).all()
    # blobs actually compress
    raw_bytes = 16 * len(pdf)
    blob_bytes = int(pay_pdf["ts_blob"].map(len).sum() + pay_pdf["val_blob"].map(len).sum())
    assert blob_bytes < 0.7 * raw_bytes
