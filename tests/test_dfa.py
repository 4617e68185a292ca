"""DFA-1 (operators/acf.dfa_fluctuation): constant ⇒ 0 everywhere;
agreement with a straightforward numpy reference implementation on
deterministic pseudo-noise; noise scaling exponent ≈ 0.5."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from timeseriescorrelation_spark.operators.acf import dfa_fluctuation

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _counts(spark, counts, metric="m"):
    rows, k = [], 0
    for i, c in enumerate(counts):
        for j in range(c):
            ts = T0 + dt.timedelta(hours=i, seconds=j + 1)
            rows.append(("c", metric, ts, k, 1.0))
            k += 1
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _noise(n):
    return [((i * 1103515245 + 12345) >> 8) % 7 + 1 for i in range(n)]


def _dfa_reference(y, scale):
    y = np.asarray(y, dtype=float)
    prof = np.cumsum(y - y.mean())
    nb = len(prof) // scale
    x = np.arange(scale)
    sse = 0.0
    for b in range(nb):
        seg = prof[b * scale:(b + 1) * scale]
        coef = np.polyfit(x, seg, 1)
        res = seg - np.polyval(coef, x)
        sse += float((res ** 2).sum())
    return math.sqrt(sse / (nb * scale))


def test_constant_is_zero(spark):
    out = dfa_fluctuation(_counts(spark, [5] * 256)).collect()
    assert {r.scale_h for r in out} == {8, 16, 32, 64}
    assert all(r.fluct == 0.0 for r in out)


def test_matches_numpy_reference(spark):
    counts = _noise(256)
    out = {r.scale_h: r.fluct for r in
           dfa_fluctuation(_counts(spark, counts)).collect()}
    for s in (8, 16, 32, 64):
        ref = _dfa_reference(counts, s)
        assert abs(out[s] - ref) < 1e-5 * max(ref, 1.0), (s, out[s], ref)


def test_noise_exponent_near_half(spark):
    counts = _noise(512)
    out = {r.scale_h: r.fluct for r in
           dfa_fluctuation(_counts(spark, counts)).collect()}
    alpha = math.log(out[64] / out[8]) / math.log(64 / 8)
    assert 0.3 < alpha < 0.75
