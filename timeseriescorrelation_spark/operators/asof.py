"""As-of join (SURVEY §2.3 J4 family): for every left row, the most
recent right row with right.ts <= left.ts on the same key — the
kdb `aj` / pandas `merge_asof` / DuckDB `ASOF JOIN` shape, LEFT-join
semantics (left rows with no prior right row keep nulls).

Spark has no native as-of join; the naive formulation is a range
join (nested-loop) or a per-left-row subquery.  This implementation
uses the UNION + window trick: tag both sides, union them, and run ONE
`last(..., ignoreNulls)` window pass ordered by (ts, side) — right
rows sort before left rows at equal ts, so a same-timestamp right row
is visible to the left row, matching ASOF's `>=`.  Left rows then
filter back out carrying the last right payload.

Scale shape: a single shuffle on the key columns and one ordered pass —
O(|left| + |right|) rows moved, no join node at all, no row explosion.
Right rows with duplicate (key, ts) must be pre-collapsed by the caller
(e.g. max_by on a tiebreak column) or the carried value is
order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload: list[str] | None = None,
              suffix: str = "_asof",
              tolerance_seconds: int | None = None,
              direction: str = "backward") -> DataFrame:
    """Left as-of join: left columns + each right payload column as
    `<col><suffix>` (null when no right row at or before left's ts).

    ``tolerance_seconds`` bounds staleness (pandas merge_asof
    `tolerance`): a matched right row older than the bound is treated
    as no match (all payload columns null) — the carried struct keeps
    the right row's own ts, so the bound is exact integer µs.

    ``direction`` (pandas merge_asof): "backward" (default — latest
    right row at or before), "forward" (earliest right row at or
    after — the reversed window, same single shuffle), "nearest"
    (both passes, pick the smaller exact-µs distance; tie → the
    earlier/backward row).  All directions stay join-node-free: one
    exchange on the keys, one sorted pass per direction."""
    payload = payload or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    # The whole right payload is carried as ONE struct: the struct is
    # non-null for every right row even when its FIELDS are null, so
    # last(ignoreNulls) picks the latest right ROW atomically.  Carrying
    # columns independently would let a null field resurrect a stale
    # value from an older row — a torn result no real right row ever
    # had (and a divergence from SQL ASOF JOIN semantics).
    from timeseriescorrelation_spark.functions.timeutil import epoch_us

    r_payload = F.struct(
        *[F.col(c) for c in payload],
        epoch_us(F.col(right_ts)).alias("_rts_us"),
    )
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(
            right.select(r_payload.alias("_p")).schema["_p"].dataType
        ).alias("_p"),
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        r_payload.alias("_p"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    u = l_tag.unionByName(r_tag)
    # backward: ascending (ts, side) — a right row at equal ts sorts
    # before the left row, matching ASOF's >=.  forward: descending
    # ts with right rows still first at equal ts.
    w_b = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols = ["_is_left", "_row", "_ts"]
    if direction == "backward":
        carried = u.select(
            *cols, F.last("_p", ignorenulls=True).over(w_b).alias("_p")
        )
    elif direction == "forward":
        carried = u.select(
            *cols, F.last("_p", ignorenulls=True).over(w_f).alias("_p")
        )
    else:
        both = u.select(
            *cols,
            F.last("_p", ignorenulls=True).over(w_b).alias("_pb"),
            F.last("_p", ignorenulls=True).over(w_f).alias("_pf"),
        )
        lts = epoch_us(F.col("_ts"))
        db = lts - F.col("_pb._rts_us")
        df_ = F.col("_pf._rts_us") - lts
        carried = both.select(
            *cols,
            F.when(F.col("_pb").isNull(), F.col("_pf"))
            .when(F.col("_pf").isNull(), F.col("_pb"))
            .when(db <= df_, F.col("_pb"))
            .otherwise(F.col("_pf"))
            .alias("_p"),
        )
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds) * 1_000_000
        carried = carried.withColumn(
            "_p",
            F.when(
                F.abs(epoch_us(F.col("_ts")) - F.col("_p._rts_us"))
                <= F.lit(tol_us),
                F.col("_p"),
            ),
        )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    return carried.where(F.col("_is_left") == 1).select(
        *out_cols,
        *[F.col(f"_p.{c}").alias(f"{c}{suffix}") for c in payload],
    )
