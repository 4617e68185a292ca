"""CDC snapshot (operators/scd.cdc_snapshot): last-wins by (ts, seq),
delete tombstones remove keys, same-µs ties break on seq, and the
idempotent-upsert invariant snapshot(A ∪ B) == apply(snapshot(A), B)."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.scd import cdc_snapshot

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

CH_SCHEMA = (
    "user_id long, ts timestamp, event_id long, op string, v double"
)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


def _snap(df):
    return {
        r.user_id: (r.op, r.v, r.n_changes) for r in df.collect()
    }


def test_last_wins_and_tombstones(spark):
    ch = spark.createDataFrame(
        [
            (1, _t(0), 10, "I", 1.0),
            (1, _t(5), 11, "U", 2.0),   # winner
            (2, _t(0), 20, "I", 9.0),
            (2, _t(9), 21, "D", 0.0),   # tombstone -> key 2 gone
            (3, _t(3), 30, "U", 7.0),
        ],
        CH_SCHEMA,
    )
    out = _snap(cdc_snapshot(ch))
    assert out == {1: ("U", 2.0, 2), 3: ("U", 7.0, 1)}


def test_same_microsecond_tie_breaks_on_seq(spark):
    ch = spark.createDataFrame(
        [(1, _t(0), 100, "U", 1.0), (1, _t(0), 101, "U", 2.0)],
        CH_SCHEMA,
    )
    out = _snap(cdc_snapshot(ch))
    assert out[1][1] == 2.0


def test_idempotent_upsert_invariant(spark):
    a = [
        (1, _t(0), 1, "I", 1.0),
        (2, _t(1), 2, "I", 2.0),
        (3, _t(2), 3, "I", 3.0),
    ]
    b = [
        (1, _t(10), 4, "D", 0.0),   # delete key 1
        (2, _t(11), 5, "U", 9.0),   # update key 2
        (4, _t(12), 6, "I", 4.0),   # new key 4
    ]
    df_a = spark.createDataFrame(a, CH_SCHEMA)
    df_b = spark.createDataFrame(b, CH_SCHEMA)
    df_ab = spark.createDataFrame(a + b, CH_SCHEMA)

    full = cdc_snapshot(df_ab)
    # incremental: snapshot(A) rows re-enter as synthetic changes
    # (their last state, original ts/seq), then apply B.
    snap_a = cdc_snapshot(df_a).select(
        "user_id", "last_ts", "event_id", "op", "v"
    )
    incr = cdc_snapshot(
        snap_a.withColumnRenamed("last_ts", "ts").unionByName(df_b)
    )
    got_full = {r.user_id: (r.op, r.v) for r in full.collect()}
    got_incr = {r.user_id: (r.op, r.v) for r in incr.collect()}
    assert got_full == got_incr == {
        2: ("U", 9.0), 3: ("I", 3.0), 4: ("I", 4.0),
    }
