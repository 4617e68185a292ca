"""Mergeable HyperLogLog distinct-count sketches, cross-engine exact.

Exact `count(DISTINCT x)` per bucket does not compose across retention
tiers: daily distincts cannot be derived from hourly distinct COUNTS,
so every re-aggregation re-scans raw data — untenable at 10^12 turns.
HLL registers DO compose (union = element-wise max), which is how a
tiered engine serves "distinct conversations per hour/day/month" from
the same continuous-aggregate cascade as sums and maxes
(`rollup.rollup_tier`): sketch once at the finest tier, merge upward.

Unlike `approx_count_distinct` (whose HLL++ internals are opaque and
engine-specific), this implementation is DETERMINISTIC and replicable
bit-for-bit in ANSI SQL, so the DuckDB oracle gate can verify the
estimates exactly:

- hash: top 60 bits of md5 (same string bytes → same integer in any
  engine); top b=10 bits pick the register, the remaining 50 bits give
  rho = (#leading zeros) + 1 via string-length-of-bin (minimal binary
  representation in both Spark and DuckDB).
- registers live in LONG format (group keys, reg, rho) — plain
  groupBy/max built-ins, no arrays, no UDFs; absent registers mean
  rho=0 and are reconstructed arithmetically at estimate time.
- the harmonic sum is computed as INTEGER Σ 2^(51-rho) (≤ 2^61, exact
  BIGINT in both engines), so both engines divide identical numbers;
  the only libm call (ln in the small-range linear-counting branch)
  operates on identical doubles and is rounded to 6dp.

Standard-error ~ 1.04/sqrt(m) ≈ 3.25% at m=1024 registers; raise b
for tighter bounds (b ≤ 20 keeps the integer sum < 2^63: worst case
m·2^(61-b) = 2^61 at any b).

Scale notes (100 TB): the sketch is one hash-aggregation producing at
most m rows per group (map-side partial max on (keys, reg) — shuffle
volume is |groups|·m regardless of input rows); tier merges shuffle
only register rows.  At b=10 a group's sketch is ≤ 1024 (reg, rho)
pairs ≈ 10 KB — millions of groups fit one executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # top 15 hex chars of md5 — positive in int64


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_sketch(df: DataFrame, keys: list[str], item_col: str,
               b: int = 10) -> DataFrame:
    """Long-format HLL registers: (keys..., reg, rho = max over items).

    Items hash through md5 (portable across engines); rho is the
    1-indexed position of the first set bit in the low (60-b)-bit
    word, i.e. (60-b) - length(bin(w)) + 1, with the all-zeros word
    mapping to (60-b)+1.
    """
    wbits = _HASH_BITS - b
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *keys,
            F.shiftright(h, wbits).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Union sketches to a coarser grouping: element-wise register max.

    `keys` is the coarser key set (e.g. drop the hour column to merge
    hourly sketches into daily ones).
    """
    return regs.groupBy(*keys, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, keys: list[str],
                 b: int = 10) -> DataFrame:
    """Cardinality estimate per key group from long-format registers.

    Output: (keys..., hll_est).  Integer harmonic sum
    S = Σ_present 2^(51-rho) + (m - n_present)·2^51, then
    E = α·m²·2^51 / S with the standard small-range correction
    (E ≤ 2.5m and empty registers present → linear counting
    m·ln(m/V)).  All branch decisions happen on bit-identical
    numbers; only the final ln differs by ≤1 ulp across libms,
    absorbed by the 6dp rounding.
    """
    m = 1 << b
    wbits = _HASH_BITS - b
    top = wbits + 1  # max rho; 2^(top-rho) ≥ 1
    s_present = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {top} - rho)")
    ).cast("long")
    n_present = F.count("*")
    agg = regs.groupBy(*keys).agg(
        s_present.alias("_s"), n_present.alias("_n")
    )
    s_tot = (
        F.col("_s")
        + (F.lit(m).cast("long") - F.col("_n")) * F.lit(1 << top).cast("long")
    ).cast("double")
    v = F.lit(m).cast("long") - F.col("_n")  # empty registers
    e_raw = (
        F.lit(_alpha(m)) * F.lit(float(m * m)) * F.lit(float(1 << top))
        / s_tot
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*keys, F.round(est, 6).alias("hll_est"))


def _cms_bucket(item: Column, j: int, w: int) -> Column:
    """Row-j counter index: an independent 32-bit slice of md5(item)
    mod w.  md5's 32 hex chars give four independent 8-char slices —
    enough for d ≤ 4 rows — and the same expression is writable
    verbatim in DuckDB, so the oracle replicates every counter."""
    return (
        F.conv(F.substring(F.md5(item.cast("string")), 1 + j * 8, 8), 16, 10)
        .cast("long") % F.lit(w)
    )


def cms_sketch(df: DataFrame, item_col: str, d: int = 3,
               w: int = 4096) -> DataFrame:
    """Count-min sketch: (j, bucket, cnt) — d·w counters total.

    The exact heavy-hitter count (`token_topk`) shuffles one row per
    DISTINCT token; at 100 TB the long tail makes that shuffle huge.
    The CMS shuffles at most d·w rows no matter the vocabulary
    (map-side partial sums), and over-counts by at most ε·N with
    probability 1-δ (ε = e/w, δ = e^-d): estimates are always ≥ the
    true count, never below — safe for threshold cuts.

    Deterministic (md5 slices, integer sums) and replicable in ANSI
    SQL, unlike hashing-seeded sketch libraries.  d ≤ 4 (md5 slice
    budget); raise w for tighter ε.
    """
    if not 1 <= d <= 4:
        raise ValueError("cms_sketch: d must be in 1..4 (md5 slices)")
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                _cms_bucket(F.col(item_col), j, w).alias("bucket"),
            )
            for j in range(d)
        ])
    )
    return (
        df.select(rows.alias("r"))
        .select("r.j", "r.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_lookup(sketch: DataFrame, items: DataFrame, item_col: str,
               d: int = 3, w: int = 4096) -> DataFrame:
    """Append `cms_est` to `items`: min over the d counters the item
    hashes to.  The sketch side is d·w rows — broadcast it; absent
    buckets mean a count of 0."""
    probes = items.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    _cms_bucket(F.col(item_col), j, w).alias("bucket"),
                )
                for j in range(d)
            ])
        ).alias("r"),
    ).select("*", "r.j", "r.bucket").drop("r")
    joined = probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
    out_cols = [c for c in items.columns]
    return (
        joined.groupBy(*out_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
