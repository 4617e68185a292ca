"""Additive seasonal decomposition (STL-lite): hourly series →
trend + seasonal + residual, the classical decomposition every
time-series monitoring stack wants before alerting on "residual
anomalies" (seasonal_mad judges points against their slot; this
SUBTRACTS the slot structure and hands downstream detectors a
stationary residual).

    trend_t    = centered ±84h moving mean
    seasonal_s = mean of detrended values per (dow, hour-of-day) slot
    resid_t    = value_t − trend_t − seasonal_s

Exactness discipline (everything gate-oracle-able):
- the hourly mean and the moving trend are INTEGER-cent window sums
  divided once (windowed sums of ints are exact in any accumulation
  order — a windowed avg of doubles is NOT: Spark's sliding
  add/subtract and DuckDB's recompute disagree in the last ulp);
- detrended values are snapped to integer micro-units BEFORE the
  seasonal group mean (the lm.py recipe), so the group sum is exact;
- resid is a fixed per-row expression over already-rounded terms.

Scale notes (100 TB): the raw scan collapses to |metrics|·|hours|
rows in one hash-agg; the trend is ONE range-frame window per metric
over that reduced table; the seasonal profile is |metrics|·168 rows
joined back broadcast.  Nothing touches raw rows twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriescorrelation_spark.functions.timeutil import epoch_us

M = 1_000_000.0
_H = 3_600_000_000  # one hour in µs


def stl_lite(series: DataFrame, half_window_h: int = 84,
             keys: list[str] | None = None) -> DataFrame:
    """(keys..., bucket_ts, mean_v, trend, seasonal, resid) at hour
    grain.  ``half_window_h`` is the trend half-width (84 ⇒ a 169-hour
    centered window, one full week)."""
    keys = keys or ["metric"]
    hourly = (
        series.select(
            *keys,
            F.date_trunc("hour", "ts").alias("bucket_ts"),
            F.round(F.col("value") * 100).cast("long").alias("_vc"),
        )
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.sum("_vc").alias("_cs"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch_us(F.col("bucket_ts")))
        .rangeBetween(-int(half_window_h) * _H, int(half_window_h) * _H)
    )
    t = hourly.select(
        *keys, "bucket_ts", "_cs", "_n",
        F.sum("_cs").over(w).alias("_csw"),
        F.sum("_n").over(w).alias("_nw"),
    ).select(
        *keys, "bucket_ts",
        (F.col("_cs").cast("double") / F.col("_n").cast("double") / 100.0
         ).alias("_mean"),
        (F.col("_csw").cast("double") / F.col("_nw").cast("double") / 100.0
         ).alias("_trend"),
    )
    det = t.select(
        *keys, "bucket_ts", "_mean", "_trend",
        F.dayofweek("bucket_ts").alias("_dow"),
        F.hour("bucket_ts").alias("_hod"),
        F.round((F.col("_mean") - F.col("_trend")) * F.lit(M))
        .cast("long").alias("_du"),
    )
    # seasonal floors to integer micro-units: its value then has
    # EXACTLY six decimals, so the 6dp output rounding has no half-way
    # boundary to disagree on (a raw sum/count ratio flipped the gate
    # by 1e-6 exactly there); resid likewise derives from the
    # already-quantized terms
    prof = det.groupBy(*keys, "_dow", "_hod").agg(
        F.floor(
            F.sum("_du").cast("double") / F.count(F.lit(1)).cast("double")
        ).cast("long").alias("_su")
    )
    out = det.join(F.broadcast(prof), [*keys, "_dow", "_hod"])
    mean_r = F.round("_mean", 6)
    trend_r = F.round("_trend", 6)
    seas = F.col("_su").cast("double") / F.lit(M)
    return out.select(
        *keys, "bucket_ts",
        mean_r.alias("mean_v"),
        trend_r.alias("trend"),
        F.round(seas, 6).alias("seasonal"),
        F.round(mean_r - trend_r - seas, 6).alias("resid"),
    )
