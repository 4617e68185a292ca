"""Sliding/rolling window statistics over EVENT TIME (SURVEY §2.5 W5,
frame specs W6): per-row aggregates over a trailing time range, e.g.
"count/min/max/sum/avg of this user's values in the last hour".

This is the `rangeBetween` frame — a true event-time range, not a row
count: a user with 3 events in the last hour gets a 3-row frame no
matter how their rows interleave with other hours.  The order key is
integer epoch microseconds (TIMESTAMP_NTZ-safe via timeutil.epoch_us;
rangeBetween requires a numeric orderBy), so the frame boundary is
exact at full timestamp precision and DuckDB's
``ORDER BY epoch_us(ts) RANGE BETWEEN n PRECEDING AND CURRENT ROW``
replicates it bit-for-bit.  Rows with equal (key, ts) are frame peers
in both engines.

Scale notes: one shuffle on the partition keys, then a single ordered
pass per partition — Spark's bounded-preceding range frame keeps a
sliding buffer of at most the rows inside the range, O(rows_in_range)
memory per partition, no self-join (the naive equivalent is a range
self-join that explodes quadratically on dense series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriescorrelation_spark.functions.timeutil import epoch_us


def rolling_stats(df: DataFrame, keys: list[str], range_seconds: int,
                  ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """Append trailing-range aggregates to every input row.

    Output = input columns + (roll_cnt, roll_min, roll_max, roll_sum,
    roll_avg) over the frame [ts - range_seconds, ts] (both ends
    inclusive, matching SQL RANGE ... PRECEDING AND CURRENT ROW).
    Sum/avg are rounded to 6dp — frame summation order differs between
    engines in the last ulps."""
    range_us = int(range_seconds) * 1_000_000
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch_us(F.col(ts_col)))
        .rangeBetween(-range_us, 0)
    )
    v = F.col(value_col)
    return df.select(
        "*",
        F.count(v).over(w).alias("roll_cnt"),
        F.min(v).over(w).alias("roll_min"),
        F.max(v).over(w).alias("roll_max"),
        F.round(F.sum(v).over(w), 6).alias("roll_sum"),
        F.round(F.avg(v).over(w), 6).alias("roll_avg"),
    )
