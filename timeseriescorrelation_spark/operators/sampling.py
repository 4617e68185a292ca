"""Deterministic sampling / dataset-split assignment for training-data
pipelines: every decision is a pure function of a stable id hash, so
runs are reproducible across clusters, restarts, and engines (the
DuckDB oracle replicates the exact same md5-bucket arithmetic — unlike
`df.sample()`/`sampleBy()`, whose RNG is partition-layout dependent and
cannot be oracle-checked or safely resumed).

Bucket = first 16 bits of md5(id) -> uniform 0..65535.  md5 of the
decimal string form is engine-portable (Spark `md5` == DuckDB `md5`
on identical bytes).  Splitting on conv/doc id (not row id) keeps all
rows of one unit on one side — the leakage-safe split.

Scale notes: stateless per-row projection — no shuffle, no sampling
state, prunes straight down onto the scan; a 1% sample of 100 TB reads
as a filter, not a reservoir."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1 << 16


def hash_bucket(id_col: str) -> Column:
    """Stable uniform bucket 0..65535 from md5 of the id's string form."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")


def sample_fraction(df: DataFrame, frac: float,
                    id_col: str = "doc_id") -> DataFrame:
    """Keep ~frac of units, deterministically (bucket < frac * 2^16)."""
    return df.where(hash_bucket(id_col) < int(frac * N_BUCKETS))


def assign_split(df: DataFrame, id_col: str = "doc_id",
                 train: float = 0.8, val: float = 0.1) -> DataFrame:
    """Append a 'split' column: train / val / test by hash range.

    Boundaries are exact bucket counts (floor), so the same id lands in
    the same split forever regardless of corpus size or order."""
    b = hash_bucket(id_col)
    t_hi = int(train * N_BUCKETS)
    v_hi = int((train + val) * N_BUCKETS)
    split = (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)
