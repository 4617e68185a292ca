from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseriescorrelation_spark.functions.gorilla import (
    _clz64,
    _ctz64,
    decode_chunk,
    encode_chunk,
    pack_bits,
)


def test_clz_ctz():
    xs = np.array(
        [0, 1, 2, 3, (1 << 63), (1 << 64) - 1, (1 << 62) - 1, 1 << 52,
         (1 << 53) + 1, 0x8000000000000001],
        dtype=np.uint64,
    )
    for x, lead, trail in zip(
        xs.tolist(), _clz64(xs).tolist(), _ctz64(xs).tolist()
    ):
        if x == 0:
            assert lead == 64 and trail == 64
        else:
            assert lead == 64 - int(x).bit_length(), hex(x)
            assert trail == (int(x) & -int(x)).bit_length() - 1, hex(x)


def test_pack_bits_roundtrip_manual():
    vals = np.array([0b101, 0b1, 0xFFFFFFFFFFFFFFFF, 0b0], dtype=np.uint64)
    lens = np.array([3, 1, 64, 2], dtype=np.int64)
    out = pack_bits(vals, lens)
    bitstr = "".join(f"{b:08b}" for b in out)
    expect = "101" + "1" + "1" * 64 + "00"
    assert bitstr[: len(expect)] == expect


def _roundtrip(ts, vs):
    blob = encode_chunk(np.array(ts, dtype=np.int64), np.array(vs, dtype=np.float64))
    dts, dvs = decode_chunk(blob)
    np.testing.assert_array_equal(dts, np.array(ts, dtype=np.int64))
    # bit-exact including NaN
    np.testing.assert_array_equal(
        dvs.view(np.uint64), np.array(vs, dtype=np.float64).view(np.uint64)
    )
    return blob


def test_roundtrip_basic():
    _roundtrip([0], [1.5])
    _roundtrip([], [])
    _roundtrip([0, 1_000_000, 2_000_000], [1.0, 1.0, 1.0])
    _roundtrip(
        [1735689600_000_000, 1735689660_000_000, 1735689660_000_000],
        [0.0, -0.0, float("nan")],
    )


def test_roundtrip_edge_values():
    vs = [0.0, 5e-324, -5e-324, float("inf"), float("-inf"), float("nan"),
          1.7976931348623157e308, -1.0, 1.0, 2.0, 4.0, 0.1, 0.2, 0.30000001]
    ts = np.cumsum([0] + [10**k for k in range(len(vs) - 1)]).tolist()
    _roundtrip(ts, vs)


def test_compression_on_regular_series():
    n = 10_000
    ts = 1735689600_000_000 + np.arange(n, dtype=np.int64) * 60_000_000
    vs = np.full(n, 42.5)
    blob = encode_chunk(ts, vs)
    raw = n * 16
    assert len(blob) < raw / 40  # ~2 bits/point on constant regular data


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_roundtrip_property(pairs):
    deltas = [p[0] for p in pairs]
    ts = np.cumsum(np.array(deltas, dtype=np.int64)) + 1_700_000_000_000_000
    vs = np.array([p[1] for p in pairs], dtype=np.float64)
    blob = encode_chunk(ts, vs)
    dts, dvs = decode_chunk(blob)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvs.view(np.uint64), vs.view(np.uint64))


def test_negative_dod_buckets():
    # decreasing deltas exercise every negative bucket boundary
    deltas = [10**6, 10**6 - 1, 10**6 - 64, 10**6 - 320, 10**6 - 2368,
              10**6 - 2**33, 10**6]
    ts = np.cumsum(np.array([0] + deltas, dtype=np.int64))
    vs = np.arange(len(ts), dtype=np.float64)
    _roundtrip(ts.tolist(), vs.tolist())


# VERDICT r02 #8: widen the property strategy to the float corners the
# uniform strategy almost never draws — denormals (the XOR leading/
# trailing-zero logic sees 52-bit-mantissa-only patterns), ±inf, NaN
# RUNS (consecutive identical bit patterns drive the zero-XOR fast
# path), and delta-of-deltas beyond 2^31 µs (the widest dod bucket).
_SPECIALS = [
    0.0, -0.0, float("inf"), float("-inf"), float("nan"),
    5e-324, -5e-324,                    # smallest denormals
    2.2250738585072014e-308,            # smallest normal
    1.1125369292536007e-308,            # mid-range denormal
    -4.9406564584124654e-310,           # negative denormal
    1.7976931348623157e308, -1.7976931348623157e308,
]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(
                st.integers(min_value=0, max_value=2**31 - 1),
                # > 2^31 µs (~36 min) up to 2^45 µs (~1 year) — the
                # dod raw-bucket path, int64-safe at 200 points
                st.integers(min_value=2**31, max_value=2**45),
            ),
            st.one_of(
                st.sampled_from(_SPECIALS),
                st.floats(allow_nan=True, allow_infinity=True,
                          allow_subnormal=True, width=64),
            ),
            st.integers(min_value=1, max_value=5),  # run length
        ),
        min_size=1,
        max_size=60,
    )
)
def test_roundtrip_property_specials_and_wide_deltas(triples):
    deltas, vs = [], []
    for d, v, run in triples:
        for i in range(run):
            deltas.append(d + i)  # near-identical deltas: small dods
            vs.append(v)          # value runs: zero-XOR fast path
    ts = np.cumsum(np.array(deltas, dtype=np.int64)) + 1_700_000_000_000_000
    vs = np.array(vs, dtype=np.float64)
    blob = encode_chunk(ts, vs)
    dts, dvs = decode_chunk(blob)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvs.view(np.uint64), vs.view(np.uint64))


def test_batch_encode_matches_per_chunk():
    """encode_chunks_batch must emit byte-identical blobs to
    encode_chunk on every group slice — the batched hot path and the
    per-chunk reference are the same format by construction."""
    import numpy as np

    from timeseriescorrelation_spark.functions.gorilla import (
        encode_chunk,
        encode_chunks_batch,
    )

    rng = np.random.default_rng(11)
    sizes = [1, 2, 55, 1, 300, 7, 1000, 55, 3, 1, 1]
    ts_l, vs_l = [], []
    for i, s in enumerate(sizes):
        if i % 3 == 0:  # regular grid, constant value (all-zero streams)
            t = (np.arange(s, dtype=np.int64) * 60_000_000
                 + int(rng.integers(0, 10**12)))
            v = np.full(s, 42.5)
        elif i % 3 == 1:  # random timestamps, rounded values
            t = np.sort(rng.integers(0, 10**12, s)).astype(np.int64)
            v = np.round(rng.normal(50.0, 10.0, s), 2)
        else:  # specials: inf/nan/denormal, huge deltas
            t = np.sort(
                rng.integers(-(10**15), 10**15, s)
            ).astype(np.int64)
            v = rng.normal(0.0, 1e300, s)
            if s >= 3:
                v[0], v[1], v[2] = np.inf, np.nan, 5e-324
        ts_l.append(t)
        vs_l.append(v)
    ts = np.concatenate(ts_l)
    vs = np.concatenate(vs_l)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    blobs = encode_chunks_batch(ts, vs, starts)
    assert len(blobs) == len(sizes)
    for i, (t, v, b) in enumerate(zip(ts_l, vs_l, blobs)):
        assert b == encode_chunk(t, v), f"group {i} diverged"


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(-(2**40), 2**40),
                st.floats(allow_nan=False, width=64),
            ),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=50, deadline=None)
def test_batch_encode_matches_per_chunk_property(groups):
    import numpy as np

    from timeseriescorrelation_spark.functions.gorilla import (
        encode_chunk,
        encode_chunks_batch,
    )

    ts_l = [np.sort(np.array([t for t, _ in g], dtype=np.int64))
            for g in groups]
    vs_l = [np.array([v for _, v in g], dtype=np.float64)
            for g in groups]
    sizes = [len(g) for g in groups]
    blobs = encode_chunks_batch(
        np.concatenate(ts_l),
        np.concatenate(vs_l),
        np.concatenate([[0], np.cumsum(sizes)]),
    )
    for t, v, b in zip(ts_l, vs_l, blobs):
        assert b == encode_chunk(t, v)
