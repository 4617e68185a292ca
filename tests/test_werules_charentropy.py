"""Western Electric rules + character entropy."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.spc import we_rules
from timeseriescorrelation_spark.operators.textstats import char_entropy

BASE = dt.datetime(2026, 1, 1)


def _series(spark, day_counts, metric="a"):
    rows = []
    for d, n in enumerate(day_counts):
        for i in range(n):
            rows.append((metric, BASE + dt.timedelta(days=d, minutes=i),
                         1.0))
    return spark.createDataFrame(rows, ["metric", "ts", "value"])


def test_we_rule4_sustained_drift(spark):
    # 8 days slightly above centerline then 8 below: no 3-sigma point,
    # but rule4 fires once a same-side run reaches 8
    counts = [30] * 8 + [10] * 8   # c_bar = 20, sigma ~ 4.47
    out = sorted(we_rules(_series(spark, counts)).collect(),
                 key=lambda r: r["day_ts"])
    assert out[7]["rule4"] == 1          # 8th high day completes a run
    assert all(r["rule4"] == 0 for r in out[:7])
    assert out[15]["rule4"] == 1         # 8th low day too
    assert out[7]["any_signal"] == 1


def test_we_rule2_two_of_three(spark):
    # c_bar ≈ 20; two days near 32 (beyond 2σ≈8.94 above) inside a
    # 3-day window trigger rule2
    counts = [20] * 6 + [32, 20, 32] + [20] * 6
    out = sorted(we_rules(_series(spark, counts)).collect(),
                 key=lambda r: r["day_ts"])
    assert out[8]["rule2"] == 1
    assert all(r["rule1"] == 0 for r in out)  # nothing beyond 3σ


def test_we_quiet_process_silent(spark):
    counts = [20, 21, 19, 20, 22, 18, 20, 21, 19, 20]
    out = we_rules(_series(spark, counts)).collect()
    assert all(r["any_signal"] == 0 for r in out)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_char_entropy_hand_values(spark):
    out = {
        r["doc_id"]: r
        for r in char_entropy(
            _docs(spark, [(1, "aaaa"), (2, "abab"), (3, "abcd")])
        ).collect()
    }
    assert out[1]["char_entropy"] == 0.0
    assert out[1]["entropy_norm"] is None
    assert out[2]["char_entropy"] == pytest.approx(1.0, abs=1e-6)
    assert out[3]["char_entropy"] == pytest.approx(2.0, abs=1e-6)
    assert out[3]["entropy_norm"] == pytest.approx(1.0, abs=1e-6)


def test_char_entropy_orders_text_kinds(spark):
    natural = "the quick brown fox jumps over the lazy dog and runs on"
    import hashlib

    noise = hashlib.sha256(b"x").hexdigest() * 3
    out = {
        r["doc_id"]: r["char_entropy"]
        for r in char_entropy(
            _docs(spark, [(1, "zzzzzzzz" * 8), (2, natural), (3, noise)])
        ).collect()
    }
    assert out[1] < out[2]
    assert 2.5 < out[2] < 4.6
