"""Haar wavelet variance (operators/wavelet): constant ⇒ 0 at every
level, linear trend ⇒ the closed form nu2_j = 2^{3j-4}, and a
hand-computed 8-hour fixture checked level by level."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.wavelet import haar_variance

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _counts(spark, counts, metric="m"):
    """counts[i] events inside hour i ⇒ dense hourly y == counts."""
    rows = []
    k = 0
    for i, c in enumerate(counts):
        for j in range(c):
            ts = T0 + dt.timedelta(hours=i, seconds=j + 1)
            rows.append(("c", metric, ts, k, 1.0))
            k += 1
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_constant_series_is_zero_everywhere(spark):
    out = haar_variance(_counts(spark, [1] * 64)).collect()
    assert {r.level for r in out} == {1, 2, 3, 4}
    assert all(r.nu2 == 0.0 for r in out)
    by_level = {r.level: r for r in out}
    assert by_level[1].n_blocks == 32
    assert by_level[4].n_blocks == 4
    assert by_level[4].scale_h == 16


def test_linear_trend_closed_form(spark):
    # y_t = t + 1: each block's halves differ by exactly 4^{j-1}
    # (intercept cancels), so nu2_j = (4^{j-1})^2 / 2^j = 2^{3j-4}.
    out = haar_variance(_counts(spark, [i + 1 for i in range(64)])).collect()
    got = {r.level: r.nu2 for r in out}
    assert got == {1: 0.5, 2: 4.0, 3: 32.0, 4: 256.0}


def test_hand_computed_eight_hours(spark):
    out = haar_variance(
        _counts(spark, [3, 1, 4, 1, 5, 9, 2, 6]), min_blocks=1
    ).collect()
    got = {r.level: (r.n_blocks, r.nu2) for r in out}
    # L1: D = 2,3,-4,-4 -> 45/8; L2: D = -1,6 -> 37/8; L3: D = -13 -> 169/8.
    assert got[1] == (4, 5.625)
    assert got[2] == (2, 4.625)
    assert got[3] == (1, 21.125)
    assert 4 not in got  # no complete 16-hour block in 8 hours
