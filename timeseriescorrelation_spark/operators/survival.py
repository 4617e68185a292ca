"""Kaplan-Meier survival estimation over conversation lifetimes —
"what fraction of conversations are still alive after t?" with the
estimator that handles the part naive histograms get wrong: RIGHT
CENSORING.  Conversations still active at the data frontier haven't
died — dropping them biases lifetimes short, counting them as deaths
biases the tail — KM keeps them in the risk set exactly as long as
they were observed.

    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

with d_i deaths (conversations whose last event is at t_i, frontier
distance > horizon) and n_i the at-risk count (observed duration
≥ t_i, censored or not).

Cross-engine exactness: each factor enters as
ln((n−d)/n) — ONE division of two exact integers — snapped to integer
micro-nats BEFORE the cumulative sum (the engine's fixed-point trick),
so `logsurv_u` is an exact integer in both engines; the human-facing
`surv` is exp of that integer, 6-dp rounded (same contract as
hll_est's ln).  When n_i = d_i the curve hits exactly zero: that row
reports surv = 0 and a NULL logsurv_u (−∞ has no fixed-point form),
and it is necessarily the last event row (no one remains at risk).

Scale notes (100 TB): the raw scan collapses map-side to one row per
(key, conv) — the same first aggregation every lifetime query pays;
everything after operates on distinct DURATIONS per key (≤ |convs|,
usually far fewer): one descending-range window for risk counts + one
ascending running sum, both partitioned by key.  No grids, no joins
beyond the 1-row-per-key frontier broadcast shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriescorrelation_spark.functions.timeutil import epoch_us

M_U = 1_000_000.0


def km_survival(series: DataFrame, keys: list[str] | None = None,
                conv_col: str = "conv_id", ts_col: str = "ts",
                censor_horizon_s: int = 3600) -> DataFrame:
    """(keys..., t_us, n_risk, d_events, logsurv_u, surv): the KM curve
    evaluated at every uncensored event time (duration since the
    conversation's first event, exact µs).  A conversation whose last
    event lies within `censor_horizon_s` of its key's frontier is
    censored (still alive when observation ended)."""
    keys = keys or ["metric"]
    horizon_us = int(censor_horizon_s) * 1_000_000
    ev = series.groupBy(*keys, conv_col).agg(
        F.min(epoch_us(F.col(ts_col))).alias("t0"),
        F.max(epoch_us(F.col(ts_col))).alias("t1"),
    )
    fr = ev.groupBy(*keys).agg(F.max("t1").alias("fmax"))
    d = ev.join(F.broadcast(fr), keys).select(
        *keys,
        (F.col("t1") - F.col("t0")).alias("dur"),
        ((F.col("fmax") - F.col("t1")) < horizon_us).alias("censored"),
    )
    g = d.groupBy(*keys, "dur", "censored").agg(
        F.count(F.lit(1)).alias("c")
    )
    # at-risk at duration t = everyone observed (censored or not) for
    # >= t: a DESC range frame sums counts over dur >= current dur
    w_risk = (
        Window.partitionBy(*keys)
        .orderBy(F.col("dur").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = g.select(
        *keys, "dur", "censored", "c",
        F.sum("c").over(w_risk).alias("n_risk"),
    )
    events = r.where(~F.col("censored")).select(
        *keys, "dur", F.col("c").alias("d"), "n_risk"
    )
    lnu = F.when(
        F.col("n_risk") > F.col("d"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(M_U)
        ).cast("long"),
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = events.select(
        *keys, "dur", "d", "n_risk", lnu.alias("lnu")
    ).select(
        *keys, "dur", "d", "n_risk", "lnu",
        F.sum("lnu").over(w_cum).alias("cum"),
    )
    return out.select(
        *keys,
        F.col("dur").alias("t_us"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.when(F.col("n_risk") > F.col("d"), F.col("cum"))
        .alias("logsurv_u"),
        F.when(F.col("n_risk") == F.col("d"), F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("cum").cast("double") / F.lit(M_U)), 6)
        )
        .alias("surv"),
    )
