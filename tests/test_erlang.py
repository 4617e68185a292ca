"""Erlang-C staffing (operators/queueing.erlang_staffing): n=1
reduces to M/M/1 (P(wait) = a); hand-verified a=1 ⇒ n_req=3; silent
hours staff 1 agent with zero wait; operator matches an independent
python recursion."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.queueing import erlang_staffing

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _fixture(spark, days=10):
    rows, k = [], 0
    for d in range(days):
        per_hour = {0: 1, 9: 5, 23: 1}
        for hod, c in per_hour.items():
            for j in range(c):
                ts = T0 + dt.timedelta(days=d, hours=hod, seconds=j + 1)
                rows.append(("c", "m", ts, k, 1.0))
                k += 1
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _erlang_ref(a, tgt=0.2, nmax=64):
    b = 1.0
    for n in range(1, nmax + 1):
        b = a * b / (n + a * b)
        if n > a:
            c = n * b / (n - a * (1.0 - b))
            if c <= tgt:
                return n, c
    return None, None


def test_staffing_closed_forms(spark):
    out = {r.hod: r for r in erlang_staffing(_fixture(spark)).collect()}
    assert len(out) == 24
    # hod 0: a = 1 -> B2 = 0.2 fails (C2 = 1/3), n_req = 3
    assert out[0].lam == 1.0 and out[0].n_req == 3
    assert abs(out[0].p_wait - 0.1875 / 2.0625) < 1e-6
    # hod 9: lam = 5; must match the independent recursion
    n_ref, c_ref = _erlang_ref(5.0)
    assert out[9].n_req == n_ref
    assert abs(out[9].p_wait - c_ref) < 1e-6
    # silent hours: a = 0 -> one agent, never waits
    assert out[5].lam == 0.0 and out[5].n_req == 1 and out[5].p_wait == 0.0


def test_mm1_region(spark):
    # lam = 1 event / 10 days at hod 12 -> a = 0.1 <= 0.2: n_req = 1
    # and Erlang-C(1, a) = a (the M/M/1 identity)
    rows = [("c", "m", T0 + dt.timedelta(days=0, hours=h), h, 1.0)
            for h in (0, 23)]
    rows += [("c", "m", T0 + dt.timedelta(days=9, hours=23), 99, 1.0)]
    rows += [("c", "m", T0 + dt.timedelta(days=4, hours=12), 50, 1.0)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = {r.hod: r for r in erlang_staffing(df).collect()}
    assert out[12].n_req == 1
    assert abs(out[12].p_wait - out[12].lam) < 1e-9
