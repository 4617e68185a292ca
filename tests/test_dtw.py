"""DTW daily-profile distance: identical shapes -> 0, phase shifts ->
small DTW but broken Pearson (the reason the operator exists), and the
Spark kernel matches a brute-force unbanded reference when the band
covers the warp."""

from __future__ import annotations

import datetime as dt

import numpy as np

from timeseriescorrelation_spark.operators.dtw import dtw_daily_pairs

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, "
    "turn_idx int, value double"
)


def _rows(metric, hourly_values):
    return [
        ("c", metric, T0 + dt.timedelta(hours=h), h, float(v))
        for h, v in enumerate(hourly_values)
        if v is not None
    ]


def _dtw_ref(x, y):
    n = len(x)
    d = np.full((n + 1, n + 1), np.inf)
    d[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            c = abs(x[i - 1] - y[j - 1])
            d[i, j] = c + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return d[n, n]


def test_identical_profiles_zero(spark):
    vals = [float((h * 7) % 13) for h in range(24)]
    df = spark.createDataFrame(
        _rows("a", vals) + _rows("b", vals), SCHEMA
    )
    got = dtw_daily_pairs(df, band=3).collect()
    assert len(got) == 1 and got[0].dtw == 0.0


def test_phase_shift_small_dtw(spark):
    # b = a shifted by one hour: DTW (band>=1) stays tiny while the
    # hour-aligned Pearson of the same profiles is badly broken
    base = [0, 0, 0, 1, 5, 9, 5, 1, 0, 0, 0, 0,
            0, 0, 1, 4, 8, 4, 1, 0, 0, 0, 0, 0]
    shifted = base[-1:] + base[:-1]
    df = spark.createDataFrame(
        _rows("a", [float(v) for v in base])
        + _rows("b", [float(v) for v in shifted]),
        SCHEMA,
    )
    d = dtw_daily_pairs(df, band=3, z_norm=False).collect()[0].dtw
    # unshifted vs itself would be 0; the 1h shift costs only the
    # boundary cells under warping — far below the rigid L1 distance
    rigid = sum(abs(a - b) for a, b in zip(base, shifted))
    assert d < rigid / 4


def test_matches_unbanded_reference_within_band(spark):
    rng = np.random.RandomState(5)
    va = rng.randint(0, 50, 24).astype(float)
    vb = rng.randint(0, 50, 24).astype(float)
    df = spark.createDataFrame(
        _rows("a", va.tolist()) + _rows("b", vb.tolist()), SCHEMA
    )
    # band=23 == unbanded on L=24
    got = dtw_daily_pairs(df, band=23, z_norm=False).collect()[0].dtw

    def zless(v):
        return v  # z_norm off: compare raw cents/scale values

    want = round(_dtw_ref(zless(va), zless(vb)), 6)
    assert got == want
