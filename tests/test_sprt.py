"""Wald SPRT readout."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.abtest import sprt_readout

BASE = dt.datetime(2026, 1, 1)


def _events(spark, days):
    """days: list of (n_events, n_purchases)."""
    rows = []
    for d, (n, x) in enumerate(days):
        for i in range(n):
            et = "purchase" if i < x else "view"
            rows.append(
                (BASE + dt.timedelta(days=d, minutes=i), et)
            )
    return spark.createDataFrame(rows, ["ts", "event_type"])


def test_sprt_high_rate_accepts_h1(spark):
    # 10% purchases >> p1=6%: LLR climbs, flips to accept_h1
    days = [(100, 10)] * 8
    rows = sorted(sprt_readout(_events(spark, days)).collect(),
                  key=lambda r: r["day_ts"])
    assert rows[-1]["decision"] == "accept_h1"
    # monotone climb for a constant super-p1 rate
    llrs = [r["llr"] for r in rows]
    assert all(b > a for a, b in zip(llrs, llrs[1:]))


def test_sprt_low_rate_accepts_h0(spark):
    days = [(100, 1)] * 8   # 1% << p0=4%
    rows = sorted(sprt_readout(_events(spark, days)).collect(),
                  key=lambda r: r["day_ts"])
    assert rows[-1]["decision"] == "accept_h0"


def test_sprt_llr_hand_value(spark):
    days = [(50, 3)]
    out = sprt_readout(_events(spark, days)).collect()[0]
    c1 = math.log(0.06 / 0.04)
    c0 = math.log(0.94 / 0.96)
    assert out["llr"] == pytest.approx(3 * c1 + 47 * c0, abs=1e-5)
    assert out["decision"] == "continue"
