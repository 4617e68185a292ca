"""Chaos test for the FULL four-stage streaming pipeline (r4 verdict
task #8): ingest-dedup → 1m → 1h → 1d with the pipeline KILLED at a
seeded random stage boundary after each input drop, every checkpoint
resumed, and the final 1h/1d tiers asserted byte-equal to one batch
rollup of everything.  The per-stage kill/resume tests already exist;
this drives the whole chain through arbitrary crash points, including
the ledger-idempotent 1h/1d folds catching up from lagging state.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.rollup import (
    rollup_raw_upsertable,
)
from timeseriescorrelation_spark.streaming.pipeline import (
    DEDUP_KEYS,
    SERIES_SCHEMA,
    run_full_pipeline_once,
)

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)
SENTINEL_CONV = "zz_watermark_sentinel"
STD = ["conv_id", "metric", "bucket_ts", "cnt", "sum", "min", "max",
       "first", "last"]


def _rows():
    """Two conversations over ~2 days with intra- and cross-drop
    replays, multi-hour gaps, and a day-2 refold target."""
    rows = []
    for i, m in enumerate(range(0, 2 * 24 * 60, 37)):  # every 37 min
        rows.append(
            ("c1", "m", T0 + dt.timedelta(minutes=m), i,
             float(1 + (m % 11)))
        )
        if m % 3 == 0:
            rows.append(
                ("c2", "m", T0 + dt.timedelta(minutes=m, seconds=30),
                 1000 + i, float(m % 7))
            )
    rows.append(rows[0])   # exact replay inside drop 1
    return rows


def _norm(df):
    return sorted(
        (r["conv_id"], r["metric"], r["bucket_ts"], r["cnt"],
         round(r["sum"], 6), r["min"], r["max"], r["first"], r["last"])
        for r in df.select(*STD).collect()
    )


def _chaos_run(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = _rows()
    # split on minute boundaries into 3 time-ordered drops so each 1m
    # bucket lives in exactly one drop (append-mode silver semantics)
    cut1 = T0 + dt.timedelta(minutes=700)
    cut2 = T0 + dt.timedelta(minutes=1900)
    drops = [
        [r for r in rows if r[2] < cut1],
        [r for r in rows if cut1 <= r[2] < cut2],
        [r for r in rows if r[2] >= cut2]
        + [(SENTINEL_CONV, "m", T0 + dt.timedelta(days=4), 0, 0.0)],
    ]
    src = tmp_path / f"src_{seed}"
    work = str(tmp_path / f"work_{seed}")
    for i, drop in enumerate(drops):
        spark.createDataFrame(drop, SERIES_SCHEMA).coalesce(
            1
        ).write.parquet(str(src / f"drop{i}"))
        if i < len(drops) - 1:
            # crash at a seeded stage boundary (1..3): later stages
            # lag and must catch up on resume
            kill_after = rng.randint(1, 3)
            run_full_pipeline_once(
                spark, f"{src}/drop*", work,
                stop_after_stage=kill_after,
            )
        else:
            # final drain runs to completion — and once more on top
            # (a full-pipeline replay with nothing new must be a noop)
            run_full_pipeline_once(spark, f"{src}/drop*", work)
            out = run_full_pipeline_once(spark, f"{src}/drop*", work)

    everything = spark.createDataFrame(
        [r for r in rows], SERIES_SCHEMA
    ).dropDuplicates(list(DEDUP_KEYS))
    want_1h = rollup_raw_upsertable(everything, "1h")
    want_1d = rollup_raw_upsertable(everything, "1d")
    got_1h = spark.read.parquet(out["gold_1h"]).where(
        F.col("conv_id") != SENTINEL_CONV
    )
    got_1d = spark.read.parquet(out["gold_1d"]).where(
        F.col("conv_id") != SENTINEL_CONV
    )
    assert _norm(got_1h) == _norm(
        want_1h.where(F.col("conv_id") != SENTINEL_CONV)
    ), f"1h tier diverged (seed {seed})"
    assert _norm(got_1d) == _norm(
        want_1d.where(F.col("conv_id") != SENTINEL_CONV)
    ), f"1d tier diverged (seed {seed})"


def test_full_pipeline_chaos_kill_points(spark, tmp_path):
    for seed in (11, 23, 47):   # >= 3 seeded kill sequences
        _chaos_run(spark, tmp_path, seed)
