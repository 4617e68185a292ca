"""Gap-fill: dense grid + LOCF + linear interpolation (SURVEY W1/W2/J4).

Pipeline per (conv_id, metric):

1. **last-wins collapse** — many observations inside one grid step
   collapse to the one with the largest (ts, turn_idx) (SURVEY A2);
2. **grid** — `sequence(date_trunc(step,min), date_trunc(step,max),
   step)` + explode generates the dense timeline (no Python);
3. **fill** — grid ∪ collapsed-observations, one window pass:
   LOCF = `last(value, ignoreNulls)` over unbounded-preceding rows;
   linear = prev/next observation (value, ts) via
   `last(..., ignoreNulls)` / `first(..., ignoreNulls)` frames and
   straight-line arithmetic.

The union formulation shuffles once on (conv_id, metric) for the window
instead of join-shuffling grid AND observations on (key, bucket) — at
10^12-turn scale the grid side is the dominant row count, so saving its
extra shuffle matters.

An `applyInPandas` variant (`fill_interpolate_pandas`) implements the
same linear semantics with `pandas.Series.interpolate` per the
vectorized-UDF mandate (BASELINE.json:6,15); tests assert the native and
pandas paths match exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STEP_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
STEP_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}

_KEY = ["conv_id", "metric"]


def collapse_last_wins(series: DataFrame, step: str = "1m") -> DataFrame:
    """Collapse raw points to one value per grid bucket (last by
    (ts, turn_idx), packed into one int64 so the agg stays
    HashAggregate — see rollup.packed_order_key)."""
    from timeseriescorrelation_spark.operators.rollup import packed_order_key

    return series.groupBy(
        *_KEY, F.date_trunc(STEP_TRUNC[step], "ts").alias("grid_ts")
    ).agg(
        F.max_by("value", packed_order_key(STEP_TRUNC[step])).alias("value")
    )


def make_grid(series: DataFrame, step: str = "1m") -> DataFrame:
    """Dense per-key timeline from min(ts) to max(ts), one row per step."""
    trunc = STEP_TRUNC[step]
    secs = STEP_SECONDS[step]
    spans = series.groupBy(*_KEY).agg(
        F.date_trunc(trunc, F.min("ts")).alias("lo"),
        F.date_trunc(trunc, F.max("ts")).alias("hi"),
    )
    return spans.select(
        *_KEY,
        F.explode(
            F.sequence(
                F.col("lo"), F.col("hi"), F.expr(f"interval {secs} seconds")
            )
        ).alias("grid_ts"),
    )


def fill_locf(series: DataFrame, step: str = "1m") -> DataFrame:
    """Dense grid with last-observation-carried-forward values.

    Output: (conv_id, metric, grid_ts, value, filled) — `filled` is true
    where the bucket had no observation and the value was carried.
    """
    obs = collapse_last_wins(series, step).withColumn("is_grid", F.lit(0))
    grid = make_grid(series, step).select(
        *_KEY,
        "grid_ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    u = grid.unionByName(obs.select(*_KEY, "grid_ts", "value", "is_grid"))
    # obs row (is_grid=0) sorts before the grid row at the same grid_ts,
    # so the grid row's LOCF sees it.
    w = (
        Window.partitionBy(*_KEY)
        .orderBy("grid_ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    locf = F.last("value", ignorenulls=True).over(w)
    has_obs = F.max(F.when(F.col("is_grid") == 0, 1).otherwise(0)).over(
        Window.partitionBy(*_KEY, "grid_ts")
    )
    return (
        u.withColumn("locf", locf)
        .withColumn("filled", has_obs == 0)
        .where(F.col("is_grid") == 1)
        .select(*_KEY, "grid_ts", F.col("locf").alias("value"), "filled")
    )


def fill_interpolate(series: DataFrame, step: str = "1m") -> DataFrame:
    """Dense grid with linear interpolation between neighboring
    observations (LOCF at the trailing edge, next-obs backfill has no
    effect before the first obs since the grid starts at it).

    Pure native-window formulation: prev/next (value, ts) per grid row
    via ignoreNulls last/first over preceding/following frames.
    """
    obs = collapse_last_wins(series, step).withColumn("is_grid", F.lit(0))
    grid = make_grid(series, step).select(
        *_KEY,
        "grid_ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    u = grid.unionByName(obs.select(*_KEY, "grid_ts", "value", "is_grid"))

    base = Window.partitionBy(*_KEY).orderBy("grid_ts", "is_grid")
    wprev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wnext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    obs_ts = F.when(F.col("is_grid") == 0, F.col("grid_ts"))
    prev_v = F.last("value", ignorenulls=True).over(wprev)
    prev_t = F.last(obs_ts, ignorenulls=True).over(wprev)
    next_v = F.first("value", ignorenulls=True).over(wnext)
    next_t = F.first(obs_ts, ignorenulls=True).over(wnext)

    from timeseriescorrelation_spark.functions.timeutil import epoch_us

    t = epoch_us(F.col("grid_ts")).cast("double")
    pt = epoch_us(prev_t).cast("double")
    nt = epoch_us(next_t).cast("double")
    interp = F.when(
        next_v.isNull() | prev_v.isNull() | (nt == pt), F.coalesce(prev_v, next_v)
    ).otherwise(prev_v + (next_v - prev_v) * (t - pt) / (nt - pt))

    has_obs = F.max(F.when(F.col("is_grid") == 0, 1).otherwise(0)).over(
        Window.partitionBy(*_KEY, "grid_ts")
    )
    return (
        u.withColumn("ival", interp)
        .withColumn("filled", has_obs == 0)
        .where(F.col("is_grid") == 1)
        .select(*_KEY, "grid_ts", F.col("ival").alias("value"), "filled")
    )


def fill_interpolate_pandas(series: DataFrame, step: str = "1m") -> DataFrame:
    """Same semantics as `fill_interpolate`, via grouped-map pandas UDF
    (`pandas.Series.interpolate(method='time')` per whole series —
    grouping the full (conv_id, metric) per UDF call avoids
    partition-edge artifacts, SURVEY §7 hard parts)."""
    secs = STEP_SECONDS[step]
    obs = collapse_last_wins(series, step)

    out_schema = (
        "conv_id string, metric string, grid_ts timestamp, "
        "value double, filled boolean"
    )

    def _fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("grid_ts")
        idx = pd.date_range(
            pdf["grid_ts"].iloc[0], pdf["grid_ts"].iloc[-1], freq=f"{secs}s"
        )
        s = pdf.set_index("grid_ts")["value"].reindex(idx)
        filled = s.isna()
        s = s.interpolate(method="time", limit_direction="forward").ffill().bfill()
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "metric": pdf["metric"].iloc[0],
                "grid_ts": idx,
                "value": s.to_numpy(),
                "filled": filled.to_numpy(),
            }
        )

    return obs.groupBy(*_KEY).applyInPandas(_fill, out_schema)
