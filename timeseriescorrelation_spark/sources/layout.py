"""Z-order clustered file layout (Morton curve) — multi-column data
skipping for the lake tables.

Partitioning prunes on ONE leading dimension; a 100 TB scan filtered
on BOTH conv_id and day (the resume/backfill shape: "re-read one
conversation's one day") still touches every file of that day's
partition.  Z-ordering interleaves the bits of several columns into
one Morton key and range-partitions + sorts the write by it, so rows
close in EVERY dimension land in the SAME few files; the parquet
row-group/file min-max stats then skip the rest of the scan.  This is
exactly what Delta's `OPTIMIZE ... ZORDER BY` and Iceberg's
`sort_order(z-order)` do on the production stack; this module is the
jar-free, plain-parquet equivalent the sandbox can execute and assert.

Bit budget: each column contributes its value's low `bits` bits
(columns must be pre-scaled to a small ordinal domain — e.g. day
number, bucketed id); interleave is LSB-first so the key preserves
locality at every prefix length.  The key is a plain int64 column
holding at most 63 bits total: 16 bits × up to 3 columns at the
default; 4 columns need bits ≤ 15 (zorder_key rejects
n_cols × bits > 63).

Scale notes (100 TB): the write costs ONE repartitionByRange shuffle
(range boundaries from Spark's reservoir sample of the key) +
in-partition sort — the same price as any sorted write; reads get
multi-dimension file pruning forever after.  The clustering assertion
in tests/test_layout.py measures it directly: a (conv, day) point
predicate touches 1 file z-ordered vs most files in arrival order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of each ordinal column
    into one int64 (LSB-first round-robin).  Columns are masked into
    [0, 2^bits) first — callers pass small ordinals (day numbers,
    modulo-bucketed ids), not raw hashes, so range predicates keep
    their locality."""
    n = len(cols)
    if not 1 <= n <= 4 or n * bits > 63:
        raise ValueError("zorder_key: need 1..4 columns, n*bits <= 63")
    mask = (1 << bits) - 1
    vals = [c.cast("long").bitwiseAND(F.lit(mask)) for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, v in enumerate(vals):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def write_zordered(df: DataFrame, path: str, cols: list[str | Column],
                   num_files: int = 16, bits: int = 16) -> None:
    """Write `df` as parquet clustered on the Morton key of `cols`.

    repartitionByRange gives contiguous, balanced key ranges per file
    (reservoir-sampled boundaries); sortWithinPartitions tightens each
    file's min-max stats to its own range."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    (
        df.withColumn("_zkey", zorder_key(cs, bits))
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
