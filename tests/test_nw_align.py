"""Needleman–Wunsch daily alignment: brute-force replica + identity
and shift cases."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.align import nw_align_daily

T0 = dt.datetime(2024, 7, 1)
SCHEMA = "metric string, ts timestamp, value double"


def _rows(metric, hourly):
    return [
        (metric, T0 + dt.timedelta(hours=h), float(v))
        for h, v in enumerate(hourly)
        if v is not None
    ]


def _nw_ref(x, y):
    n = len(x)
    d = [[0] * (n + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = -i
        d[0][i] = -i
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            sub = 2 if x[i - 1] == y[j - 1] else -1
            d[i][j] = max(d[i - 1][j - 1] + sub,
                          d[i - 1][j] - 1, d[i][j - 1] - 1)
    return d[n][n]


def test_identical_profiles_perfect_score(spark):
    vals = [float(1 + (h % 3)) for h in range(24)]
    df = spark.createDataFrame(_rows("a", vals) + _rows("b", vals),
                               SCHEMA)
    r = nw_align_daily(df).collect()[0]
    assert r["score"] == 48 and r["sim"] == 1.0


def test_matches_bruteforce_replica(spark):
    # a: active every hour alternating low/high; b: active only when
    # h % 3 == 0, high.  Replicate symbols: median per metric over
    # its own observed hourly cents.
    va = [1.0 if h % 2 == 0 else 9.0 for h in range(24)]
    vb = [9.0 if h % 3 == 0 else None for h in range(24)]
    df = spark.createDataFrame(_rows("a", va) + _rows("b", vb), SCHEMA)
    r = nw_align_daily(df).collect()[0]
    # metric a: cents 100/900, med2 = 2*500=1000 -> 2y>1000 only for
    # 900 -> symbols alternate 1,2; metric b: all 900, med2=1800 ->
    # 2*900=1800 not > -> all observed hours symbol 1, missing 0
    sa = [1 if h % 2 == 0 else 2 for h in range(24)]
    sb = [1 if h % 3 == 0 else 0 for h in range(24)]
    want = _nw_ref(sa, sb)
    assert r["score"] == want
    assert abs(r["sim"] - round(want / 48.0, 6)) < 1e-9


def test_shift_beats_mismatch(spark):
    # b = a shifted one hour: alignment recovers most of the match
    # via one gap pair; a scrambled c does far worse
    base = [1.0, 9.0, 1.0, 1.0, 9.0, 9.0, 1.0, 9.0] * 3
    shifted = base[-1:] + base[:-1]
    df = spark.createDataFrame(
        _rows("a", base) + _rows("b", shifted), SCHEMA
    )
    r = nw_align_daily(df).collect()[0]
    assert r["score"] > 30  # near-perfect despite the shift


def test_sw_local_beats_global_on_partial_match(spark):
    from timeseriescorrelation_spark.operators.align import (
        sw_align_daily,
    )

    # hours 0-11 identical, 12-23 maximally divergent: SW finds the
    # 12-hour perfect block (score ~24); NW pays for the back half
    va = [1.0] * 12 + [9.0] * 12
    vb = [1.0] * 12 + [None] * 12
    df = spark.createDataFrame(_rows("a", va) + _rows("b", vb), SCHEMA)
    sw = sw_align_daily(df).collect()[0]
    nw = nw_align_daily(df).collect()[0]
    # replicate symbols: a: med over {100x12, 900x12} -> med2=1000,
    # symbols 1x12 then 2x12; b: all 100 -> med2=200, symbols 1x12
    # then 0x12.  Best local block: the twelve 1==1 matches.
    assert sw["score"] == 24
    assert nw["score"] < sw["score"]


def test_sw_matches_bruteforce(spark):
    from timeseriescorrelation_spark.operators.align import (
        sw_align_daily,
    )

    def _sw_ref(x, y):
        n = len(x)
        d = [[0] * (n + 1) for _ in range(n + 1)]
        best = 0
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                sub = 2 if x[i - 1] == y[j - 1] else -1
                d[i][j] = max(0, d[i - 1][j - 1] + sub,
                              d[i - 1][j] - 1, d[i][j - 1] - 1)
                best = max(best, d[i][j])
        return best

    va = [1.0 if h % 2 == 0 else 9.0 for h in range(24)]
    vb = [9.0 if h % 3 == 0 else None for h in range(24)]
    df = spark.createDataFrame(_rows("a", va) + _rows("b", vb), SCHEMA)
    r = sw_align_daily(df).collect()[0]
    sa = [1 if h % 2 == 0 else 2 for h in range(24)]
    sb = [1 if h % 3 == 0 else 0 for h in range(24)]
    assert r["score"] == _sw_ref(sa, sb)
