"""Log-rank weekend test + hapax share."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.survival import logrank_weekend
from timeseriescorrelation_spark.operators.textstats import hapax_share

SAT = dt.datetime(2026, 1, 3)   # Saturday
MON = dt.datetime(2026, 1, 5)   # Monday


def _series(spark, convs):
    """convs: (conv_id, start_dt, dur_minutes). Two events per conv
    (start + end); a far-future sentinel conv pushes the frontier out
    so nothing else is censored."""
    rows = []
    for cid, start, dur in convs:
        rows.append((str(cid), "m", start, 0, 1.0))
        rows.append((str(cid), "m", start + dt.timedelta(minutes=dur),
                     1, 1.0))
    rows.append(("zz", "m", MON + dt.timedelta(days=30), 0, 1.0))
    return spark.createDataFrame(
        rows, ["conv_id", "metric", "ts", "turn_idx", "value"]
    )


def test_logrank_identical_arms_zero(spark):
    durs = [10, 20, 30, 40]
    convs = [(f"we{i}", SAT, d) for i, d in enumerate(durs)]
    convs += [(f"wd{i}", MON, d) for i, d in enumerate(durs)]
    out = logrank_weekend(_series(spark, convs)).collect()[0]
    assert out["n_conv_wkend"] == 4 and out["n_conv_wkday"] == 5
    # identical duration sets: at every death time d(t)*n1/n sums to O1
    assert out["z"] == pytest.approx(0.0, abs=0.15)


def test_logrank_detects_shorter_weekend_lives(spark):
    convs = [(f"we{i}", SAT, 1 + i) for i in range(12)]        # short
    convs += [(f"wd{i}", MON, 100 + i) for i in range(12)]     # long
    out = logrank_weekend(_series(spark, convs)).collect()[0]
    # weekend conversations die first: observed deaths early exceed
    # expectation -> strongly positive z
    assert out["z"] is not None and abs(out["z"]) > 2.0
    assert out["chi2"] == pytest.approx(out["z"] ** 2, abs=1e-4)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_hapax_hand_counts(spark):
    out = hapax_share(
        _docs(spark, [(1, "s", "a b b c c c"), (2, "s", "a d")])
    ).collect()[0]
    # tokens: a2 b2 c3 d1 -> n=8, vocab=4, hapax=1
    assert out["n_tokens"] == 8 and out["vocab"] == 4
    assert out["hapax"] == 1
    assert out["hapax_share"] == 0.25
    assert out["type_token_ratio"] == 0.5


def test_hapax_all_unique_is_one(spark):
    out = hapax_share(_docs(spark, [(1, "s", "w x y z")])).collect()[0]
    assert out["hapax_share"] == 1.0 and out["type_token_ratio"] == 1.0


def test_hapax_template_text_is_zero(spark):
    out = hapax_share(_docs(spark, [(1, "s", "ok ok ok ok")])).collect()[0]
    assert out["hapax_share"] == 0.0
