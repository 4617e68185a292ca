"""Continuous-aggregate tier cascade raw→1m→1h→1d (SURVEY A2/A3).

Semantics (BASELINE.json:6): the 1m tier aggregates raw points; every
higher tier re-aggregates **from the tier below it**, never from raw:
``cnt=sum(cnt), sum=sum(sum), min=min(min), max=max(max),
first=min_by(first, bucket_ts), last=max_by(last, bucket_ts)``.

Determinism under parallelism: ``first``/``last`` at the raw level are
``min_by``/``max_by`` on the composite order (ts, turn_idx) — never the
order-dependent ``first()`` aggregate (SURVEY §7 "hard parts").  The
composite is packed into ONE int64 (bucket-relative microsecond offset
shifted left, plus turn_idx): a struct(ts, turn_idx) key would force
SortAggregate (struct agg buffers are not hash-aggregable), silently
turning every tier build into a per-partition sort; the packed long
keeps the whole cascade in HashAggregate + whole-stage codegen with
map-side partial aggregation.

Scale note: groupBy keys are (conv_id, metric, bucket_ts); partial
aggregation collapses each task's rows before the shuffle, so shuffle
volume ≈ |buckets|, not |points|.  Tier N+1 reuses tier N's output
(cheap: ~60x smaller each step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_UP = {"1m": "1h", "1h": "1d"}

# bits needed for the in-bucket microsecond offset per bucket width;
# turn_idx gets the remaining 63 (minute: 37 idx bits, day: 26).
_OFF_BITS = {"minute": 26, "hour": 32, "day": 37}


def packed_order_key(trunc: str):
    """(ts, turn_idx) composite order as ONE int64 — hash-aggregable.

    key = (µs since bucket start) << idx_bits | min(turn_idx, cap).
    Comparisons only ever happen within one bucket, so the
    bucket-relative offset preserves the (ts, turn_idx) order exactly.
    turn_idx is clamped to idx_bits (2^37 per minute-bucket, 2^26 per
    day-bucket) — beyond that two same-ts turns would tie, which needs
    >775 turns/sec sustained for a day in ONE conversation."""
    from timeseriescorrelation_spark.functions.timeutil import epoch_us

    idx_bits = 63 - _OFF_BITS[trunc]
    off = epoch_us(F.col("ts")) - epoch_us(F.date_trunc(trunc, "ts"))
    cap = (1 << idx_bits) - 1
    return off * F.lit(1 << idx_bits) + F.least(
        F.col("turn_idx").cast("long"), F.lit(cap)
    )


def rollup_raw(series: DataFrame, tier: str = "1m") -> DataFrame:
    """Raw series points → a tier of (cnt,sum,min,max,first,last)."""
    trunc = TIER_TRUNC[tier]
    order_key = packed_order_key(trunc)
    return (
        series.groupBy(
            "conv_id", "metric", F.date_trunc(trunc, "ts").alias("bucket_ts")
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.min_by("value", order_key).alias("first"),
            F.max_by("value", order_key).alias("last"),
        )
    )


def rollup_interval(series: DataFrame, interval: str = "5 minutes",
                    interval_seconds: int = 300) -> DataFrame:
    """Tier rollup at an arbitrary tumbling interval via window()
    (date_trunc only covers calendar units).  Same output schema as
    rollup_raw; epoch-aligned buckets match DuckDB's time_bucket.

    The order key packs the µs offset-in-bucket into the high bits:
    at 5m the offset needs 29 bits (300e6 µs), leaving idx_bits =
    63 − 29 = 34 bits for turn_idx (clamped, ties broken correctly up
    to 2^34 turns per bucket)."""
    from timeseriescorrelation_spark.functions.timeutil import epoch_us

    # tumbling windows are epoch-aligned, so offset-in-bucket is just
    # epoch µs mod the interval (avoids nesting window() inside aggs)
    ivl_us = interval_seconds * 1_000_000
    off = F.pmod(epoch_us(F.col("ts")), F.lit(ivl_us))
    idx_bits = 63 - (ivl_us - 1).bit_length()
    key = off * F.lit(1 << idx_bits) + F.least(
        F.col("turn_idx").cast("long"), F.lit((1 << idx_bits) - 1)
    )
    return (
        series.groupBy(
            "conv_id", "metric", F.window("ts", interval).alias("w")
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.min_by("value", key).alias("first"),
            F.max_by("value", key).alias("last"),
        )
        .select(
            "conv_id", "metric", F.col("w.start").alias("bucket_ts"),
            "cnt", "sum", "min", "max", "first", "last",
        )
    )


def rollup_tier(lower: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate tier N → tier N+1 from the lower tier only."""
    trunc = TIER_TRUNC[to_tier]
    lo = lower.withColumnRenamed("bucket_ts", "lo_ts")
    return (
        lo.groupBy(
            "conv_id",
            "metric",
            F.date_trunc(trunc, "lo_ts").alias("bucket_ts"),
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", F.col("lo_ts")).alias("first"),
            F.max_by("last", F.col("lo_ts")).alias("last"),
        )
    )


def rollup_raw_upsertable(series: DataFrame, tier: str = "1m") -> DataFrame:
    """Tier partials that can be EXACTLY merged later (late data /
    incremental refresh): standard tier columns plus `fkey`/`lkey`,
    the packed in-bucket order keys of the first/last point.

    Plain tier rows cannot merge exactly at the SAME granularity:
    combining a base partial and a late-delta partial of one bucket
    needs to know which side's first point came earlier, and
    `bucket_ts` ties by construction.  Carrying the packed key (µs
    offset in bucket << idx_bits | turn_idx — comparable across
    partials of the same bucket) makes first/last merge associative:
    first = min_by(first, fkey), fkey = min(fkey); sums/counts add;
    min/max fold.  This is the continuous-aggregate maintenance
    contract: `merge(rollup(A), rollup(B)) == rollup(A ∪ B)` for any
    partition of the input — the invariant that lets a 100 TB engine
    fold a late-arriving day of transcripts into a materialized tier
    without re-reading the other 99.9 TB (MERGE INTO-shaped at the
    storage layer; exactness oracle-verified by `tier_upsert_1h`)."""
    trunc = TIER_TRUNC[tier]
    key = packed_order_key(trunc)
    return (
        series.groupBy(
            "conv_id", "metric", F.date_trunc(trunc, "ts").alias("bucket_ts")
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.min_by("value", key).alias("first"),
            F.min(key).alias("fkey"),
            F.max_by("value", key).alias("last"),
            F.max(key).alias("lkey"),
        )
    )


def tier_merge(*parts: DataFrame) -> DataFrame:
    """Exact same-granularity merge of upsertable tier partials.

    One hash-agg over the unioned partials; shuffle volume is
    |buckets touched|, so merging a late delta costs O(delta), not
    O(history).  Output keeps fkey/lkey so merges chain."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        u.groupBy("conv_id", "metric", "bucket_ts")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", F.col("fkey")).alias("first"),
            F.min("fkey").alias("fkey"),
            F.max_by("last", F.col("lkey")).alias("last"),
            F.max("lkey").alias("lkey"),
        )
    )


def rollup_cascade(series: DataFrame) -> dict[str, DataFrame]:
    """Full cascade; returns {'1m': df, '1h': df, '1d': df}."""
    t1m = rollup_raw(series, "1m")
    t1h = rollup_tier(t1m, "1h")
    t1d = rollup_tier(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def rollup_cascade_fused(series: DataFrame,
                         n_parts: int | None = None) -> dict[str, DataFrame]:
    """Whole cascade with exactly ONE shuffle.

    An explicit repartition on conv_id up front makes every tier's
    grouping requirement already satisfied: hashpartitioning(conv_id)
    satisfies ClusteredDistribution(conv_id, metric, bucket_ts) (the
    partitioning expressions are a subset of the grouping keys), so
    Catalyst inserts NO further exchanges — 1m, 1h and 1d aggregate
    in place on the same partitioning.  This is the production shape
    for tier builds: per-stage paths that read unbucketed parquet pay
    one shuffle per tier instead (measured: the 1h re-agg stopped
    scaling at 8→32 cores because its shuffle dominated).

    tests/test_plans.py asserts the single-exchange property."""
    s = (
        series.repartition(n_parts, "conv_id")
        if n_parts
        else series.repartition("conv_id")
    )
    t1m = rollup_raw(s, "1m")
    t1h = rollup_tier(t1m, "1h")
    t1d = rollup_tier(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def tier_summary(tier_df: DataFrame) -> DataFrame:
    """Per-metric / grand-total report via ROLLUP grouping sets (SURVEY A7)."""
    return (
        tier_df.rollup("metric")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("cnt").alias("points"),
            F.sum("sum").alias("total"),
        )
        .orderBy(F.col("metric").asc_nulls_first())
    )


def tier_consistency_report(series: DataFrame, lo_tier: str = "1m",
                            hi_tier: str = "1h") -> DataFrame:
    """Cross-tier data-quality check: re-aggregate the low tier up to
    the high tier and diff it against a direct raw→high rollup,
    per (conv_id, metric, bucket) — the invariant every continuous
    aggregate must hold (``merge(rollup_1m) == rollup_1h``), reported
    instead of assumed.  A bucket "mismatches" when any of
    cnt / round(sum,6) / min / max / first / last disagree (sum is
    compared rounded: re-agg adds partials in a different order than
    the direct rollup, so the raw doubles may differ in the last ulp
    while both are correct).

    Output: one row per metric with buckets compared, buckets present
    on only one side, and per-column mismatch counts.  On consistent
    pipelines every count but n_buckets is 0 — the value of the query
    is that the zeros are *computed*, not asserted.

    Scale: both sides are ordinary tier builds (shuffle ≈ |buckets|);
    the diff is an equi-join on the bucket grain, then one small agg
    keyed on metric.  No extra pass over raw data beyond the two
    rollups, and the low tier is reused from the cascade in practice.
    """
    reagg = rollup_tier(rollup_raw(series, lo_tier), hi_tier)
    direct = rollup_raw(series, hi_tier)

    keys = ["conv_id", "metric", "bucket_ts"]
    a = reagg.select(
        *keys,
        *[F.col(c).alias(f"a_{c}")
          for c in ("cnt", "sum", "min", "max", "first", "last")],
    )
    b = direct.select(
        *keys,
        *[F.col(c).alias(f"b_{c}")
          for c in ("cnt", "sum", "min", "max", "first", "last")],
    )
    j = a.join(b, keys, "full_outer")

    both = F.col("a_cnt").isNotNull() & F.col("b_cnt").isNotNull()

    def _diff(col: str, rounded: bool = False):
        x, y = F.col(f"a_{col}"), F.col(f"b_{col}")
        if rounded:
            x, y = F.round(x, 6), F.round(y, 6)
        return F.sum((both & (x != y)).cast("long")).alias(f"n_{col}_diff")

    return (
        j.groupBy("metric")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.col("b_cnt").isNull().cast("long")).alias("n_only_reagg"),
            F.sum(F.col("a_cnt").isNull().cast("long")).alias("n_only_direct"),
            _diff("cnt"),
            _diff("sum", rounded=True),
            _diff("min"),
            _diff("max"),
            _diff("first"),
            _diff("last"),
        )
    )


# Auto-salt decision thresholds (µ-units): salt when any metric's
# per-conv_id row distribution has Gini above 0.60 OR one conversation
# holds more than 12% of a metric's rows.  Gini ~0.6 is where the
# synthetic skew harness (BENCH/BASELINE.md) measured the fused plan's
# straggler task dominating the stage; top1 share catches the
# single-monster-conversation case Gini dilutes at high key counts.
AUTO_SALT_GINI_U = 600_000
AUTO_SALT_TOP1_U = 120_000


def rollup_cascade_auto(series: DataFrame, n_parts: int | None = None,
                        buckets: int = 16,
                        stats: dict | None = None) -> dict[str, DataFrame]:
    """Cascade with the skew guard WIRED TO MEASUREMENT (VERDICT r02
    #6): run skew.key_skew_report over the input's (metric, conv_id)
    row counts — one map-side-collapsed agg, |metrics| output rows —
    and pick the plan:

    - even keys → rollup_cascade_fused (single raw shuffle on
      conv_id; every tier aggregates in place);
    - skewed keys (Gini or top-1 share over threshold) → salted raw
      shuffle on (conv_id, salt): a monster conversation's raw rows
      spread over `buckets` tasks, partial aggregation collapses each
      salt bucket map-side, and the tier groupBys merge the partials
      with bucket-grain exchanges (≈|buckets| rows — cheap; the raw
      scan was the skew risk, not the tier merges).

    The salted path's aggregates are all associative (cnt/sum/min/max
    + min_by/max_by on the packed order key), so both plans produce
    identical tiers — the pytest diffs them on skewed and even
    synthetics.  `stats`, when passed, records the measurement and
    the decision (`salted`, `gini_u`, `top1_share_u`).

    Scale: the detector is one extra aggregation over the raw scan
    (collapses map-side to |convs| rows, then |metrics|); at 100 TB
    that is the cheapest insurance in the pipeline — the alternative
    is discovering the straggler task on the cluster dashboard."""
    from timeseriescorrelation_spark.operators.skew import (
        key_skew_report,
        with_salt,
    )

    m = (
        key_skew_report(series)
        .agg(
            F.max("gini_u").alias("g"),
            F.max("top1_share_u").alias("t"),
        )
        .first()
    )
    gini_u = int(m["g"]) if m and m["g"] is not None else 0
    top1_u = int(m["t"]) if m and m["t"] is not None else 0
    salted = gini_u > AUTO_SALT_GINI_U or top1_u > AUTO_SALT_TOP1_U
    if stats is not None:
        stats.update(
            {"salted": salted, "gini_u": gini_u, "top1_share_u": top1_u}
        )
    if not salted:
        return rollup_cascade_fused(series, n_parts)
    s = with_salt(series, buckets)
    s = (
        s.repartition(n_parts, "conv_id", "salt")
        if n_parts
        else s.repartition("conv_id", "salt")
    ).drop("salt")
    t1m = rollup_raw(s, "1m")
    t1h = rollup_tier(t1m, "1h")
    t1d = rollup_tier(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}
