"""Matrix profile (operators/matrixprofile): an exactly repeating
pattern ⇒ mp = 0 with the tie-broken nearest start; constant days
emit nothing (no z-normalizable window); generic days cover all 21
subsequence starts symmetrically."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.matrixprofile import (
    matrix_profile_daily,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _day_counts(spark, counts, metric="m"):
    assert len(counts) == 24
    rows, k = [], 0
    for i, c in enumerate(counts):
        for j in range(c):
            ts = T0 + dt.timedelta(hours=i, seconds=j + 1)
            rows.append(("c", metric, ts, k, 1.0))
            k += 1
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_repeating_pattern_mp_zero(spark):
    out = matrix_profile_daily(
        _day_counts(spark, [1, 5, 2, 7] * 6)
    ).collect()
    by_idx = {r.idx: r for r in out}
    assert len(by_idx) == 21
    # window at 0 repeats at 4, 8, ... -> exact z-space match
    assert by_idx[0].mp == 0.0 and by_idx[0].j_star == 4
    # window at 4 matches both 0 and 8: tie-break toward smaller j
    assert by_idx[4].mp == 0.0 and by_idx[4].j_star == 0
    # phase-1 starts repeat too
    assert by_idx[1].mp == 0.0 and by_idx[1].j_star == 5


def test_constant_day_emits_nothing(spark):
    out = matrix_profile_daily(_day_counts(spark, [3] * 24)).collect()
    assert out == []


def test_spike_is_the_discord(spark):
    counts = [1, 5, 2, 7] * 6
    counts[11] = 40  # one-hour anomaly
    out = matrix_profile_daily(_day_counts(spark, counts)).collect()
    by_idx = {r.idx: r.mp for r in out}
    # every window touching hour 11 is now far from everything else
    spike_min = min(by_idx[i] for i in range(8, 12))
    clean_max = max(by_idx[i] for i in list(range(0, 5)) + list(range(15, 21)))
    assert spike_min > clean_max
    assert by_idx[0] == 0.0  # clean repeats still match exactly
