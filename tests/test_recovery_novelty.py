"""recovery_after_error and trigram_novelty: hand-computed cases."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.lm import trigram_novelty
from timeseriescorrelation_spark.operators.queueing import (
    recovery_after_error,
)

T0 = dt.datetime(2026, 3, 2, 10, 0, 0)
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def _events(spark, rows):
    """rows: (event_id, minute_offset, user, type)."""
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=m), u, t, 1.0)
            for i, m, u, t in rows
        ],
        EV_SCHEMA,
    )


def test_recovery_counts_and_mean_gap(spark):
    rows = [
        # user 1: error at t=0, click 2 min later -> recovered (120 s)
        (1, 0, 1, "error"), (2, 2, 1, "click"),
        # user 2: error at t=0, next event 10 min later -> NOT recovered
        (3, 0, 2, "error"), (4, 10, 2, "view"),
        # user 3: error is the last event -> NOT recovered
        (5, 0, 3, "click"), (6, 5, 3, "error"),
        # user 4: error then error 1 min later: first recovers (the
        # follow-up type does not matter), second is last -> not
        (7, 0, 4, "error"), (8, 1, 4, "error"),
    ]
    out = recovery_after_error(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_errors"] == 5
    assert r["n_recovered"] == 2
    assert abs(r["recovery_rate"] - 0.4) < 1e-9
    # gaps: 120 s and 60 s -> mean 90 s
    assert abs(r["mean_gap_s"] - 90.0) < 1e-9


def test_recovery_no_recovered_null_gap(spark):
    rows = [(1, 0, 1, "error"), (2, 30, 1, "click")]
    r = recovery_after_error(_events(spark, rows)).collect()[0]
    assert r["n_recovered"] == 0 and r["mean_gap_s"] is None


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trigram_novelty_ordering(spark):
    docs = _docs(spark, [
        (1, "a b c d"),          # trigrams {a b c, b c d} -- all novel
        (2, "a b c d"),          # exact restatement -> novelty 0
        (3, "b c d e f"),        # {b c d, c d e, d e f}: 2 of 3 novel
        (4, "x y"),              # < 3 tokens -> dropped
    ])
    got = {r["doc_id"]: r for r in trigram_novelty(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_trigrams"] == 2 and got[1]["novelty"] == 1.0
    assert got[2]["n_trigrams"] == 2 and got[2]["novelty"] == 0.0
    assert got[3]["n_trigrams"] == 3
    assert abs(got[3]["novelty"] - round(2 / 3, 6)) < 1e-9


def test_trigram_novelty_repeated_ngram_in_doc_counts_once(spark):
    # "a b c a b c a b c" -> distinct trigrams {a b c, b c a, c a b}
    docs = _docs(spark, [(1, "a b c a b c a b c")])
    r = trigram_novelty(docs).collect()[0]
    assert r["n_trigrams"] == 3 and r["novelty"] == 1.0


def test_time_to_nth_activation(spark):
    from timeseriescorrelation_spark.operators.retention import (
        time_to_nth,
    )

    rows = []
    # user 1: 5 events, first->5th spans 4 hours; user 2: only 3
    # events (never activates); user 3: 5 events in 8 hours
    for i in range(5):
        rows.append((i, T0 + dt.timedelta(hours=i), 1, "click", 1.0))
    for i in range(3):
        rows.append((10 + i, T0 + dt.timedelta(hours=i), 2, "view", 1.0))
    for i in range(5):
        rows.append((20 + i, T0 + dt.timedelta(hours=2 * i), 3, "click",
                     1.0))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = time_to_nth(df, n=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_users"] == 3 and r["n_activated"] == 2
    assert abs(r["activation_rate"] - round(2 / 3, 6)) < 1e-9
    # gaps: 4 h and 8 h -> p50 = 6 h (interpolated midpoint)
    assert abs(r["p50_hours"] - 6.0) < 1e-9
