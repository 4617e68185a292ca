"""Directional / long-run co-movement screens over the hourly grid:
Engle-Granger cointegration (the spurious-correlation guard) and
binned transfer entropy (the nonparametric directional-influence
companion to the linear crossmetric.granger_gain).

Both follow the aggregate-first discipline: one hash-agg to the
|metrics|·|hours| grid, pair space |metrics|² over aggregates, never
over raw rows — the same property that makes corr_matrix_daily
100-TB-safe.

Exactness:
- engle_granger keeps the OLS residual EXACT up to one shared double
  expression: with centered moments Sxx_c = nΣx²−(Σx)² and
  Sxy_c = nΣxy−ΣxΣy (decimal38 integers), the residual scales to the
  integer numerator  NUM_t = Sxx_c·(n·y_t − Σy) − Sxy_c·(n·x_t − Σx)
  and one divide by n·Sxx_c turns it into value units.  Each residual
  is then snapped to integer micro-units (both engines compute the
  SAME double from the SAME integers, so the snap agrees), and the
  lag-1 products/squares accumulate exactly in decimal38 again —
  summation order can't bend the statistic.
- transfer_entropy is pure counting: quartile bins via ntile over a
  deterministic (mean, hour) order (the mutual_info recipe), every ln
  over one exact integer ratio, each term snapped to integer
  micro-nats before the sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.crossmetric import (
    DEC,
    _hourly_cents,
)


def _dbl(c):
    return c.cast("double")


def engle_granger(series: DataFrame, key: str = "metric",
                  value_decimals: int = 2,
                  min_hours: int = 48) -> DataFrame:
    """(metric_x, metric_y, n_hours, beta, rho_res, df_stat): the
    Engle-Granger cointegration screen for every ordered metric pair —
    "is this high correlation a real long-run link, or two trending
    series passing in the night?".  Step 1 regresses y's hourly cents
    on x's over co-occurring hours (exact closed-form OLS); step 2
    asks whether the residual is mean-reverting via its lag-1
    autoregression:

        rho_res = Σ e_t·e_{t−1} / Σ e_{t−1}²,   df_stat = n·(rho−1)

    Strongly negative df_stat → residual snaps back → cointegrated;
    rho_res ≈ 1 → unit-root residual → the correlation is spurious.
    (Engle & Granger 1987; critical values are the user's lookup —
    the engine reports the statistic.)

    Residual sequence follows the SEQUENCE convention (observed hours
    ordered by hour_ts; gaps splice).  Degenerate pairs (constant x,
    zero residual variance, n < min_hours) drop out.

    Scale: pair grid join (|metrics|²·|hours| aggregate rows), one
    broadcast-sized moment join back, one per-pair lag window over
    aggregates, one hash-agg.  Residual micro-snap keeps every
    cross-engine sum over exact integers.
    """
    scale = 10 ** int(value_decimals)
    h = _hourly_cents(series, [key], value_decimals)
    x = h.select(F.col(key).alias("mx"), "hour_ts", F.col("y").alias("vx"))
    y = h.select(F.col(key).alias("my"), "hour_ts", F.col("y").alias("vy"))
    pairs = x.join(y, "hour_ts").where(F.col("mx") != F.col("my"))
    # single pass: pair moments as partition-wide window aggregates
    # over the (aggregate-sized) pair partition, so the raw scan and
    # the grid join run ONCE — a groupBy+join-back lineage would
    # recompute both for the residual branch
    wp = Window.partitionBy("mx", "my")
    m = pairs.select(
        "mx", "my", "hour_ts", "vx", "vy",
        F.count(F.lit(1)).over(wp).cast(DEC).alias("n"),
        F.sum(F.col("vx").cast(DEC)).over(wp).alias("sx"),
        F.sum(F.col("vy").cast(DEC)).over(wp).alias("sy"),
        F.sum((F.col("vx") * F.col("vx")).cast(DEC)).over(wp)
        .alias("sxx"),
        F.sum((F.col("vx") * F.col("vy")).cast(DEC)).over(wp)
        .alias("sxy"),
    ).where(F.col("n") >= min_hours)
    j = m.select(
        "mx", "my", "hour_ts", "vx", "vy", "n", "sx", "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .alias("sxxc"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .alias("sxyc"),
    ).where(F.col("sxxc") > 0)
    num = (
        F.col("sxxc") * (F.col("n") * F.col("vy") - F.col("sy"))
        - F.col("sxyc") * (F.col("n") * F.col("vx") - F.col("sx"))
    )
    e_val = _dbl(num) / (
        _dbl(F.col("n") * F.col("sxxc")) * F.lit(float(scale))
    )
    e_u = F.round(e_val * F.lit(1e6)).cast("long")
    wlag = Window.partitionBy("mx", "my").orderBy("hour_ts")
    r = j.select(
        "mx", "my", "hour_ts", "n", "sxxc", "sxyc",
        e_u.alias("eu"),
        F.lag(e_u, 1).over(wlag).alias("ep"),
    )
    g = r.groupBy("mx", "my").agg(
        F.max("n").alias("n"),
        F.max("sxxc").alias("sxxc"),
        F.max("sxyc").alias("sxyc"),
        F.count("ep").cast("long").alias("n_lag"),
        # residual micro-units can reach ~1e10; promote to decimal38
        # BEFORE the product so the cross/square terms cannot wrap
        F.sum(F.col("eu").cast(DEC) * F.col("ep")).alias("s01"),
        F.sum(F.col("ep").cast(DEC) * F.col("ep")).alias("s11"),
    ).where(F.col("s11") > 0)
    rho = _dbl(F.col("s01")) / _dbl(F.col("s11"))
    return g.select(
        F.col("mx").alias("metric_x"), F.col("my").alias("metric_y"),
        F.col("n").cast("long").alias("n_hours"),
        F.round(_dbl(F.col("sxyc")) / _dbl(F.col("sxxc")), 6)
        .alias("beta"),
        F.round(rho, 6).alias("rho_res"),
        F.round(
            _dbl(F.col("n_lag")) * (rho - F.lit(1.0)), 6
        ).alias("df_stat"),
    )


def transfer_entropy(series: DataFrame, key_col: str = "metric",
                     ts_col: str = "ts", value_col: str = "value",
                     n_bins: int = 4, value_decimals: int = 2,
                     min_triples: int = 24) -> DataFrame:
    """(metric_x, metric_y, n_triples, te_u, te_nats): binned transfer
    entropy TE(X→Y) over the hourly grid — does knowing x at hour t−1
    reduce uncertainty about y at hour t beyond y's own past?

        TE = Σ p(y', y, x) · ln[ c(y',y,x)·c(y) / (c(y,x)·c(y',y)) ]

    over quartile bins of each metric's hourly mean (ntile over the
    deterministic (mean, hour) order — the mutual_info recipe, so bins
    match across engines with no float threshold).  Every ln is over
    ONE ratio of exact integer counts; each term is snapped to integer
    micro-nats before summation, making the sum order-free.  Unlike
    granger_gain (linear, variance-based) this catches non-monotone
    influence; unlike mutual_info it is DIRECTIONAL: TE(X→Y) ≠
    TE(Y→X).

    Triples pair consecutive OBSERVED hours (h−1, h) via an equi-join
    on the grid — a gap contributes no triple.

    Scale: grid hash-agg, ntile per metric over |hours| rows, two
    grid equi-joins for the (y', y, x) alignment, then counting —
    everything sized by |metrics|²·|hours| aggregates.
    """
    scale = 10 ** int(value_decimals)
    hourly = series.groupBy(
        F.col(key_col).alias("m"),
        F.date_trunc("hour", F.col(ts_col)).alias("h"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col(value_col) * scale).cast("long")).alias("sc"),
    ).select(
        "m", "h",
        (F.col("sc").cast("double") / F.col("n").cast("double"))
        .alias("mean_v"),
    )
    w = Window.partitionBy("m").orderBy("mean_v", "h")
    binned = hourly.select(
        "m", "h", F.ntile(int(n_bins)).over(w).alias("b")
    )
    yc = binned.select(
        F.col("m").alias("my"), "h", F.col("b").alias("by1")
    )
    yp = binned.select(
        F.col("m").alias("my"),
        (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("h"),
        F.col("b").alias("by0"),
    )
    xp = binned.select(
        F.col("m").alias("mx"),
        (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("h"),
        F.col("b").alias("bx0"),
    )
    trip = (
        yc.join(yp, ["my", "h"])
        .join(xp, "h")
        .where(F.col("mx") != F.col("my"))
    )
    c_xyz = trip.groupBy("mx", "my", "by1", "by0", "bx0").agg(
        F.count(F.lit(1)).alias("cxyz")
    )
    c_yz = trip.groupBy("mx", "my", "by0", "bx0").agg(
        F.count(F.lit(1)).alias("cyz")
    )
    c_yy = trip.groupBy("mx", "my", "by1", "by0").agg(
        F.count(F.lit(1)).alias("cyy")
    )
    c_y = trip.groupBy("mx", "my", "by0").agg(
        F.count(F.lit(1)).alias("cy")
    )
    tot = trip.groupBy("mx", "my").agg(F.count(F.lit(1)).alias("nn"))
    jt = (
        c_xyz.join(c_yz, ["mx", "my", "by0", "bx0"])
        .join(c_yy, ["mx", "my", "by1", "by0"])
        .join(c_y, ["mx", "my", "by0"])
        .join(tot, ["mx", "my"])
    )
    lnr = F.log(
        (F.col("cxyz") * F.col("cy")).cast("double")
        / (F.col("cyz") * F.col("cyy")).cast("double")
    )
    term_u = F.round(
        F.col("cxyz").cast("double") / F.col("nn").cast("double")
        * lnr * 1e6
    ).cast("long")
    return (
        jt.select("mx", "my", "nn", term_u.alias("_t"))
        .groupBy(
            F.col("mx").alias("metric_x"), F.col("my").alias("metric_y")
        )
        .agg(
            F.max("nn").cast("long").alias("n_triples"),
            F.sum("_t").alias("te_u"),
        )
        .where(F.col("n_triples") >= min_triples)
        .select(
            "metric_x", "metric_y", "n_triples",
            F.col("te_u").cast("long").alias("te_u"),
            F.round(_dbl(F.col("te_u")) / F.lit(1e6), 6)
            .alias("te_nats"),
        )
    )
