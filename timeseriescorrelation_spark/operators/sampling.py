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


def weighted_sample_topk(df: DataFrame, strata: list[str], weight_col,
                         k: int = 20,
                         id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum, fully
    deterministic: Efraimidis–Spirakis A-ES — each unit draws
    u ~ U(0,1) and the k largest u^(1/w) win, which provably samples
    with probability proportional to weight.  The uniform comes from
    the same md5-integer recipe as hash_bucket (top 15 hex chars →
    60-bit integer h; u = (h+1)/(2^60+1) ∈ (0,1)), so the draw is a
    pure function of the id: reproducible across clusters, restarts,
    and engines, and the DuckDB oracle replicates every key exactly.

    The selection key is ln(u)/w — the monotone log form of u^(1/w)
    (larger is better for both) — SNAPPED to integer nano-units before
    ranking (the lm.py fixed-point discipline): a ≤1-ulp libm
    difference in ln() can never flip the order of two snapped keys,
    so the selected set is deterministic cross-engine; snapped ties
    break by id.

    Scale notes (100 TB): one stateless projection + a PARTITIONED
    top-k window keyed by the stratum (row_number ≤ k, rank pushdown
    applies); never a global sort.  Weights must be > 0 — the caller
    clamps (a ≤ 0 weight has no u^(1/w) interpretation)."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    two60 = float((1 << 60) + 1)
    u = (h + F.lit(1)).cast("double") / F.lit(two60)
    wcol = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    key = F.round(
        F.log(u) / wcol.cast("double") * F.lit(1e9)
    ).cast("long")
    from pyspark.sql import Window

    win = Window.partitionBy(*strata).orderBy(
        F.desc("_es_key_n"), F.asc(id_col)
    )
    return (
        df.withColumn("_es_key_n", key)
        .withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= int(k))
        .select(
            *strata, id_col,
            F.col("_rk").cast("int").alias("draw_rank"),
            F.col("_es_key_n").alias("es_key_n"),
        )
    )


def source_mix_weights(docs: DataFrame, alpha: float = 0.5,
                       mass_col: str = "n_chars",
                       source_col: str = "source") -> DataFrame:
    """Temperature-based source mixing weights for training-data
    assembly (the alpha-sampling rule from the multilingual-LM
    literature: p_s = m_s^alpha / sum_t m_t^alpha, alpha < 1 upweights
    small sources; alpha=1 is proportional, alpha=0 uniform).  Returns
    one row per source: document count, exact token-mass total,
    its natural share, the alpha-tempered sampling weight, and the
    expected epochs over each source when one full corpus-mass budget
    is drawn under the tempered distribution (epochs_at_budget =
    p_s * M / m_s — >1 means that source repeats).

    Cross-engine exactness: m_s and M are exact BIGINT sums; m_s^alpha
    is micro-snapped (floor(pow * 1e6) as BIGINT) BEFORE the
    denominator sum, so the normalizing constant is an exact integer
    in both engines and every output is a single deterministic
    double divide rounded 6dp — a raw double sum over sources would
    inherit engine addition order.

    Scale notes (100 TB): one hash-agg down to |sources| rows, then a
    broadcast of the 1-row total back onto it; the corpus itself is
    touched exactly once."""
    per = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(mass_col).cast("long")).alias("mass"),
    ).withColumn(
        "_w",
        F.floor(F.pow(F.col("mass").cast("double"), F.lit(float(alpha)))
                * F.lit(1e6)).cast("long"),
    )
    tot = per.agg(
        F.sum("mass").alias("_m_tot"), F.sum("_w").alias("_w_tot")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("mass").cast("long").alias("mass"),
        F.round(F.col("mass").cast("double") / F.col("_m_tot"), 6)
        .alias("natural_share"),
        F.round(F.col("_w").cast("double") / F.col("_w_tot"), 6)
        .alias("mix_weight"),
        F.round(
            (F.col("_w").cast("double") / F.col("_w_tot"))
            * F.col("_m_tot").cast("double") / F.col("mass"),
            6,
        ).alias("epochs_at_budget"),
    )
