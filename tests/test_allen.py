"""Allen interval-relation census: eight engineered hours, one per
relation, must classify exactly once each under the documented
precedence."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.intervals import allen_census

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)

# per hour: (a_span_minutes, b_span_minutes) -> expected relation
CASES = [
    ((0, 10), (0, 10), "equals"),
    ((0, 5), (10, 20), "before"),
    ((30, 40), (0, 10), "after"),
    ((0, 10), (10, 20), "meets"),
    ((0, 5), (0, 20), "starts"),
    ((5, 20), (0, 20), "finishes"),
    ((5, 10), (0, 20), "during"),
    ((0, 10), (5, 20), "overlaps"),
]


def test_allen_one_hour_per_relation(spark):
    rows = []
    for h, (a_span, b_span, _rel) in enumerate(CASES):
        base = T0 + dt.timedelta(hours=h)
        for metric, (lo, hi) in (("a", a_span), ("b", b_span)):
            rows.append(
                ("c", metric, base + dt.timedelta(minutes=lo), 0, 1.0)
            )
            if hi != lo:
                rows.append(
                    ("c", metric, base + dt.timedelta(minutes=hi), 1, 1.0)
                )
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = allen_census(df, min_hours=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r.metric_a == "a" and r.metric_b == "b" and r.n_hours == 8
    for _, _, rel in CASES:
        assert getattr(r, f"n_{rel}") == 1, (rel, r)


def test_allen_point_at_start_is_meets(spark):
    # degenerate single-event span at the other's start: the documented
    # precedence puts meets ahead of starts
    rows = [
        ("c", "a", T0, 0, 1.0),  # point span [0, 0]
        ("c", "b", T0, 0, 1.0),
        ("c", "b", T0 + dt.timedelta(minutes=30), 1, 1.0),  # [0, 30]
    ]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = allen_census(df, min_hours=1).collect()[0]
    assert r.n_meets == 1 and r.n_starts == 0
