"""Augmented Dickey-Fuller (tsdiag.adf_augmented): statsmodels-style
hand replica (numpy lstsq on the same cent-integer design) must agree
with the Cramer-on-exact-moments plan, for p=1 and p=2, on both a
unit-root walk and a strongly mean-reverting series."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from timeseriescorrelation_spark.operators.tsdiag import adf_augmented

T0 = dt.datetime(2026, 3, 1)


def _series_df(spark, name_to_vals):
    rows = []
    for name, vals in name_to_vals.items():
        for i, v in enumerate(vals):
            rows.append(("c1", name, T0 + dt.timedelta(hours=i), i,
                         float(v)))
    return spark.createDataFrame(
        rows,
        "conv_id string, metric string, ts timestamp, turn_idx int,"
        " value double",
    )


def _replica(vals, p):
    """OLS of dy_t on [1, y_{t-1}, dy_{t-1}..dy_{t-p}] over the cent
    integers, t_gamma from the unscaled (X'X)^-1."""
    y = np.round(np.asarray(vals, dtype=np.float64) * 100.0)
    dy = np.diff(y)
    # usable t: needs y_{t-1} and p lagged diffs
    rows = []
    for t in range(p + 1, len(dy) + 1):  # dy index t-1 is the target
        rows.append(
            [1.0, y[t - 1]] + [dy[t - 1 - i] for i in range(1, p + 1)]
            + [dy[t - 1]]
        )
    a = np.array(rows)
    X, z = a[:, :-1], a[:, -1]
    beta, *_ = np.linalg.lstsq(X, z, rcond=None)
    resid = z - X @ beta
    dof = len(z) - X.shape[1]
    s2 = float(resid @ resid) / dof
    xtx_inv = np.linalg.inv(X.T @ X)
    se = np.sqrt(s2 * xtx_inv[1, 1])
    return len(z), float(beta[1]), float(beta[1] / se)


@pytest.mark.parametrize("p", [1, 2])
def test_adf_matches_lstsq_replica(spark, p):
    rng = np.random.RandomState(5)
    n = 120
    walk = np.cumsum(rng.randn(n)) + 50.0          # unit root
    revert = np.zeros(n)                            # AR(1), phi=0.3
    for i in range(1, n):
        revert[i] = 0.3 * revert[i - 1] + rng.randn()
    revert += 20.0
    df = _series_df(spark, {"walk": walk, "revert": revert})
    got = {r.metric: r for r in adf_augmented(df, p=p).collect()}
    for name, vals in (("walk", walk), ("revert", revert)):
        m, gamma, t = _replica(vals, p)
        r = got[name]
        assert r.n_obs == m
        assert abs(r.gamma - gamma) < 5e-6, (name, r.gamma, gamma)
        assert abs(r.t_stat - t) < 1e-4, (name, r.t_stat, t)
    # the econometrics must come out right on this geometry
    assert got["walk"].has_unit_root is True
    assert got["revert"].has_unit_root is False


def test_adf_degenerate_series_drop(spark):
    # constant series: every centered moment is 0 -> det <= 0 -> no row
    df = _series_df(spark, {"flat": [5.0] * 80})
    assert adf_augmented(df, p=1).count() == 0
    with pytest.raises(ValueError):
        adf_augmented(df, p=3)
