from __future__ import annotations

from pyspark.sql import functions as F

from timeseriescorrelation_spark.functions import pandas_oracle as po
from timeseriescorrelation_spark.operators.rollup import (
    rollup_cascade,
    rollup_raw,
    rollup_tier,
    tier_summary,
)
from tests.helpers import assert_frames_equal

FLOATS = ("sum", "min", "max", "first", "last")
KEYS = ("conv_id", "metric", "bucket_ts")


def test_rollup_1m_exact(tiny_series):
    got = rollup_raw(tiny_series, "1m")
    want = po.rollup_raw(tiny_series.toPandas(), "1m")
    assert_frames_equal(got, want, KEYS, FLOATS)


def test_cascade_exact(tiny_series):
    pdf = tiny_series.toPandas()
    tiers = rollup_cascade(tiny_series)
    want_1m = po.rollup_raw(pdf, "1m")
    want_1h = po.rollup_tier(want_1m, "1h")
    want_1d = po.rollup_tier(want_1h, "1d")
    assert_frames_equal(tiers["1m"], want_1m, KEYS, FLOATS)
    assert_frames_equal(tiers["1h"], want_1h, KEYS, FLOATS)
    assert_frames_equal(tiers["1d"], want_1d, KEYS, FLOATS)


def test_tier_from_lower_equals_tier_from_raw(tiny_series):
    """Cascading from the lower tier must equal truncating raw directly
    (cnt/sum/min/max/first/last are all decomposable)."""
    t1m = rollup_raw(tiny_series, "1m")
    via_cascade = rollup_tier(t1m, "1h")
    direct = rollup_raw(tiny_series, "1h")
    assert_frames_equal(
        via_cascade, direct.toPandas(), KEYS, FLOATS, rtol=1e-9
    )


def test_summary_rollup(tiny_series):
    t1d = rollup_cascade(tiny_series)["1d"]
    s = tier_summary(t1d).collect()
    # grand total row (metric null) + one per metric
    assert s[0]["metric"] is None
    per_metric = {r["metric"]: r["points"] for r in s[1:]}
    assert set(per_metric) == {"token_len", "tool_calls", "turn_rate"}
    assert s[0]["points"] == sum(per_metric.values())


def test_duplicate_ts_last_wins(tiny_series):
    """Fixture has ~1% duplicate ts; last/first must break ties on
    turn_idx, deterministically across partitionings."""
    import numpy as np

    a = rollup_raw(tiny_series, "1m").toPandas()
    b = rollup_raw(tiny_series.repartition(7), "1m").toPandas()
    a = a.sort_values(list(KEYS)).reset_index(drop=True)
    b = b.sort_values(list(KEYS)).reset_index(drop=True)
    # min/max/first/last/cnt are bit-deterministic under any partitioning;
    # float sum may differ in addition order only
    for c in ("conv_id", "metric", "bucket_ts", "cnt", "min", "max",
              "first", "last"):
        assert a[c].equals(b[c]), c
    np.testing.assert_allclose(a["sum"], b["sum"], rtol=1e-12)


def test_tier_merge_equals_direct(tiny_series):
    """merge(rollup(A), rollup(B)) == rollup(A ∪ B) for an arbitrary
    split — including first/last (the packed fkey/lkey merge), and
    chained three-way merges (associativity)."""
    import numpy as np
    from pyspark.sql import functions as F

    from timeseriescorrelation_spark.operators.rollup import (
        rollup_raw,
        rollup_raw_upsertable,
        tier_merge,
    )

    parts = [
        tiny_series.where(F.col("turn_idx") % 3 == k) for k in range(3)
    ]
    merged = tier_merge(
        tier_merge(
            rollup_raw_upsertable(parts[0], "1h"),
            rollup_raw_upsertable(parts[1], "1h"),
        ),
        rollup_raw_upsertable(parts[2], "1h"),
    )
    got = (
        merged.drop("fkey", "lkey")
        .toPandas()
        .sort_values(["conv_id", "metric", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = (
        rollup_raw(tiny_series, "1h")
        .toPandas()
        .sort_values(["conv_id", "metric", "bucket_ts"])
        .reset_index(drop=True)
    )
    for c in ("conv_id", "metric", "bucket_ts", "cnt", "min", "max",
              "first", "last"):
        assert got[c].equals(want[c]), c
    np.testing.assert_allclose(got["sum"], want["sum"], rtol=1e-12)
