"""Slowly-changing-dimension (type 2) history build from a change log —
the standard warehouse derivation: collapse each key's CONSECUTIVE runs
of equal attribute values into validity intervals

    (keys..., attrs..., valid_from, valid_to, is_current, n_rows)

with valid_to = the next version's valid_from (half-open intervals that
tile the key's timeline exactly) and NULL/is_current on the last one.

Shape: one shuffle keyed by the dimension key; two cumulative windows
on the SAME (keys, ts, tie) sort (change flag via lag, version id via
running sum) → one hash-agg per version → one lead window on the
collapsed table (|versions| rows, far smaller than the log).  No
self-joins, no driver round-trips.

Scale notes (100 TB): everything is partitioned by the dimension key —
group sizes are per-entity change counts.  NULL-safe change detection
(eqNullSafe) means NULL attribute values form runs like any other
value instead of splitting on every row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(log: DataFrame, keys: list[str], attr_cols: list[str],
                 ts_col: str = "ts",
                 tie_col: str | None = None) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    `tie_col` breaks timestamp ties deterministically (pass the event
    id / turn index); without a total order the run boundaries on tied
    timestamps would be engine-dependent."""
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    same_as_prev = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in attr_cols],
    )
    chg = F.when(
        (F.row_number().over(w) == 1) | ~same_as_prev, F.lit(1)
    ).otherwise(F.lit(0))
    versioned = log.select(
        *keys, *attr_cols, ts_col,
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_ver"),
    )
    runs = versioned.groupBy(*keys, "_ver", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    # order the collapsed table by the version id, not valid_from:
    # two consecutive versions can share a timestamp (state flipping
    # within one microsecond under the tie order), and _ver is the
    # true sequence
    w2 = Window.partitionBy(*keys).orderBy("_ver")
    return runs.select(
        *keys, *attr_cols, "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_rows",
    )
