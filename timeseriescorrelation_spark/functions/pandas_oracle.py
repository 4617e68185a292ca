"""Independent pandas implementation of the engine's tier/gap-fill
semantics — the "reference rolled-up outputs" stand-in for exact-match
tests (SURVEY §5.2 item 3; /root/reference is empty in this sandbox).

Deliberately written against pandas groupby/resample-style primitives,
NOT by calling any engine code, so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TRUNC = {"1m": "min", "1h": "h", "1d": "D"}


def rollup_raw(series: pd.DataFrame, tier: str = "1m") -> pd.DataFrame:
    """series columns: conv_id, metric, ts, turn_idx, value."""
    df = series.copy()
    df["bucket_ts"] = df["ts"].dt.floor(_TRUNC[tier])
    df = df.sort_values(["conv_id", "metric", "bucket_ts", "ts", "turn_idx"])
    g = df.groupby(["conv_id", "metric", "bucket_ts"], sort=True)["value"]
    out = g.agg(
        cnt="count", sum="sum", min="min", max="max", first="first", last="last"
    ).reset_index()
    out["cnt"] = out["cnt"].astype("int64")
    return out


def rollup_tier(lower: pd.DataFrame, to_tier: str) -> pd.DataFrame:
    df = lower.copy()
    df["up_ts"] = df["bucket_ts"].dt.floor(_TRUNC[to_tier])
    df = df.sort_values(["conv_id", "metric", "up_ts", "bucket_ts"])
    g = df.groupby(["conv_id", "metric", "up_ts"], sort=True)
    out = g.agg(
        cnt=("cnt", "sum"),
        sum=("sum", "sum"),
        min=("min", "min"),
        max=("max", "max"),
        first=("first", "first"),
        last=("last", "last"),
    ).reset_index()
    out = out.rename(columns={"up_ts": "bucket_ts"})
    out["cnt"] = out["cnt"].astype("int64")
    return out


def collapse_last_wins(series: pd.DataFrame, step: str = "1m") -> pd.DataFrame:
    df = series.copy()
    df["grid_ts"] = df["ts"].dt.floor(_TRUNC[step])
    df = df.sort_values(["conv_id", "metric", "grid_ts", "ts", "turn_idx"])
    return (
        df.groupby(["conv_id", "metric", "grid_ts"], sort=True)["value"]
        .last()
        .reset_index()
    )


def _grid_fill(series: pd.DataFrame, step: str, method: str) -> pd.DataFrame:
    obs = collapse_last_wins(series, step)
    freq = {"1m": "60s", "1h": "3600s", "1d": "86400s"}[step]
    frames = []
    for (cid, met), g in obs.groupby(["conv_id", "metric"], sort=True):
        idx = pd.date_range(g["grid_ts"].min(), g["grid_ts"].max(), freq=freq)
        s = g.set_index("grid_ts")["value"].reindex(idx)
        filled = s.isna()
        if method == "locf":
            v = s.ffill()
        else:
            v = s.interpolate(method="time").ffill().bfill()
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": cid,
                    "metric": met,
                    "grid_ts": idx,
                    "value": v.to_numpy(),
                    "filled": filled.to_numpy(),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def fill_locf(series: pd.DataFrame, step: str = "1m") -> pd.DataFrame:
    return _grid_fill(series, step, "locf")


def fill_interpolate(series: pd.DataFrame, step: str = "1m") -> pd.DataFrame:
    return _grid_fill(series, step, "interp")


def pearson_all_pairs(
    vectors: dict[str, np.ndarray], theta: float
) -> pd.DataFrame:
    """Naive all-pairs Pearson ρ ≥ θ (golden for pruning soundness)."""
    ids = sorted(vectors)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            x, y = vectors[a], vectors[b]
            if np.std(x) == 0 or np.std(y) == 0:
                continue
            rho = float(np.corrcoef(x, y)[0, 1])
            if rho >= theta:
                rows.append((a, b, rho))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "rho"])
