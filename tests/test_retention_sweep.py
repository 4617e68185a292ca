"""Tiered retention sweep (operators/refresh.retention_sweep): the
retention ladder drops exactly the day partitions past each tier's
TTL, never touches retained files, leaves coarser tiers intact, reads
stay correct afterwards, and a second sweep is a no-op."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.refresh import (
    retention_sweep,
    write_tier,
)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)

T0 = dt.datetime(2024, 3, 1)


def _series(spark, n_days=10):
    rows = []
    for d in range(n_days):
        for h in (0, 12):
            rows.append(
                ("c1", "m", T0 + dt.timedelta(days=d, hours=h), 0, 1.0)
            )
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _days_on_disk(path):
    return sorted(
        p.name.split("=", 1)[1]
        for p in Path(path).iterdir()
        if p.is_dir() and p.name.startswith("day_pt=")
    )


def test_ladder_drops_per_tier(spark, tmp_path):
    s = _series(spark)
    paths = {t: str(tmp_path / t) for t in ("1m", "1h", "1d")}
    for t, p in paths.items():
        write_tier(s, p, t)
    frontier = (T0 + dt.timedelta(days=9)).date().isoformat()
    kept_before = {t: _days_on_disk(p) for t, p in paths.items()}
    assert all(len(v) == 10 for v in kept_before.values())

    untouched = {
        str(p): p.stat().st_mtime_ns
        for p in Path(paths["1h"]).rglob("*.parquet")
        if "day_pt=2024-03-0" in str(p) and "03-01" not in str(p)
    }
    rep = {
        r["tier"]: r
        for r in retention_sweep(
            spark, paths, {"1m": 3, "1h": 6, "1d": None}, frontier
        )
    }
    # 1m keeps frontier-3.. = 03-07..03-10 (4 days on disk: 07,08,09,10)
    assert _days_on_disk(paths["1m"]) == [
        "2024-03-07", "2024-03-08", "2024-03-09", "2024-03-10"
    ]
    assert rep["1m"]["dropped"] == [
        "2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04",
        "2024-03-05", "2024-03-06",
    ]
    # 1h keeps 6 days: 03-04..03-10
    assert _days_on_disk(paths["1h"])[0] == "2024-03-04"
    # 1d keeps everything
    assert _days_on_disk(paths["1d"]) == kept_before["1d"]
    assert rep["1d"]["dropped"] == []
    # retained 1h files byte-untouched
    for p, mtime in untouched.items():
        if Path(p).exists():
            assert Path(p).stat().st_mtime_ns == mtime
    # reads stay correct: only retained days come back
    got = (
        spark.read.parquet(paths["1m"])
        .select(F.col("day_pt")).distinct().collect()
    )
    assert sorted(str(r.day_pt) for r in got) == _days_on_disk(
        paths["1m"]
    )


def test_idempotent(spark, tmp_path):
    s = _series(spark, n_days=5)
    paths = {"1h": str(tmp_path / "t")}
    write_tier(s, paths["1h"], "1h")
    frontier = (T0 + dt.timedelta(days=4)).date().isoformat()
    # ttl=2 keeps frontier-2..frontier = 03-03..03-05, drops 01,02
    r1 = retention_sweep(spark, paths, {"1h": 2}, frontier)
    assert len(r1[0]["dropped"]) == 2
    r2 = retention_sweep(spark, paths, {"1h": 2}, frontier)
    assert r2[0]["dropped"] == []
    assert r2[0]["n_partitions"] == 3


def test_dry_run(spark, tmp_path):
    s = _series(spark, n_days=4)
    paths = {"1h": str(tmp_path / "t")}
    write_tier(s, paths["1h"], "1h")
    frontier = (T0 + dt.timedelta(days=3)).date().isoformat()
    rep = retention_sweep(spark, paths, {"1h": 1}, frontier,
                          execute=False)
    assert len(rep[0]["dropped"]) == 2
    assert len(_days_on_disk(paths["1h"])) == 4  # nothing deleted
