"""Deterministic seeded transcripts synthesizer (FIXTURES.md §1).

Everything is a pure function of (conv_idx, turn_idx, seed) computed with
JVM-side hash expressions — no Python row loops — so the same code that
makes a 1k-turn unit fixture makes the 10^7-turn scaling input without
leaving whole-stage codegen.  Schema is the binding transcripts schema
(BASELINE.json:15): (conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp).

Properties (per FIXTURES.md §1):
- skewed lengths: ~`skew_frac` of conversations get 50–500x base turns;
- ts: per-conv start + cumulative irregular gaps; ~5% of inter-turn
  deltas > 1h; ~1% duplicate ts (gap 0) for last-wins collapse tests;
- text: deterministic f(conv_id, turn_idx), 5–2000 chars;
- tool: null ~70% of turns, else one of {search,bash,edit,fetch}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_VOCAB = [
    "agent", "turn", "tool", "call", "plan", "step", "result", "query",
    "table", "join", "scan", "merge", "batch", "chunk", "series", "point",
    "value", "delta", "bucket", "window", "filter", "reduce", "stream",
    "shuffle", "partition", "rollup", "tier", "grid", "fill", "trace",
    "token", "reply",
]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "bash", "edit", "fetch"]

_EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z


def _u(h, salt: int):
    """Deterministic uniform in [0,1) derived from a hash column."""
    return F.pmod(F.xxhash64(h, F.lit(salt)), F.lit(1 << 30)) / F.lit(float(1 << 30))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    base_turns: int = 40,
    seed: int = 42,
    skew_frac: float = 0.01,
    skew_min_mult: int = 50,
    skew_max_mult: int = 500,
) -> DataFrame:
    """Return a deterministic transcripts DataFrame (binding schema)."""
    convs = spark.range(n_convs).withColumnRenamed("id", "conv_idx")
    hc = F.xxhash64(F.col("conv_idx"), F.lit(seed))

    u_n = _u(hc, 1)
    u_skew = _u(hc, 2)
    u_mult = _u(hc, 3)
    u_start = _u(hc, 4)

    n_base = 5 + F.floor(u_n * F.lit(2 * max(base_turns - 5, 1)))
    mult = F.lit(skew_min_mult) + F.floor(
        u_mult * F.lit(skew_max_mult - skew_min_mult)
    )
    n_turns = F.when(u_skew < F.lit(skew_frac), n_base * mult).otherwise(n_base)

    convs = convs.select(
        F.format_string("conv_%08d", F.col("conv_idx")).alias("conv_id"),
        F.col("conv_idx"),
        n_turns.cast("int").alias("n_turns"),
        (F.lit(_EPOCH_2025) + F.floor(u_start * F.lit(30 * 86400))).alias(
            "start_epoch"
        ),
    )

    turns = convs.select(
        "conv_id",
        "conv_idx",
        "start_epoch",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    ht = F.xxhash64(F.col("conv_idx"), F.col("turn_idx"), F.lit(seed))

    # role: cycle user/assistant/tool with ~10% seeded noise
    cycle_role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]), (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int")
    )
    rand_role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]), (F.pmod(F.xxhash64(ht, F.lit(11)), F.lit(3)) + 1).cast("int")
    )
    role = F.when(_u(ht, 10) < F.lit(0.10), rand_role).otherwise(cycle_role)

    # tool: null ~70%, else one of 4
    tool = F.when(
        _u(ht, 20) < F.lit(0.30),
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.xxhash64(ht, F.lit(21)), F.lit(4)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    # inter-turn gap seconds: ~1% duplicates (gap 0), ~5% long (>1h),
    # rest short irregular (quadratic ramp 0..300s)
    u_kind = _u(ht, 30)
    u_gap = _u(ht, 31)
    gap = (
        F.when(F.col("turn_idx") == 0, F.lit(0.0))
        .when(u_kind < F.lit(0.01), F.lit(0.0))
        .when(u_kind < F.lit(0.06), F.lit(3600.0) + u_gap * F.lit(10 * 3600.0))
        .otherwise(F.pow(u_gap, F.lit(2.0)) * F.lit(300.0))
    )

    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offset_us = F.sum((gap * F.lit(1e6)).cast("long")).over(w)
    ts = F.timestamp_micros(
        (F.col("start_epoch") * F.lit(1000000)).cast("long") + offset_us
    )

    # text: deterministic phrase repeated/cut to a 5..2000-char length
    words = F.array(*[F.lit(wd) for wd in _VOCAB])
    pick = lambda s: F.element_at(  # noqa: E731
        words, (F.pmod(F.xxhash64(ht, F.lit(s)), F.lit(len(_VOCAB))) + 1).cast("int")
    )
    phrase = F.concat_ws(
        " ",
        F.format_string("c%s.t%d", F.col("conv_id"), F.col("turn_idx")),
        pick(40), pick(41), pick(42), pick(43), pick(44), pick(45),
    )
    tlen = (F.lit(5) + F.pow(_u(ht, 50), F.lit(2.0)) * F.lit(1995)).cast("int")
    text = F.substring(
        F.repeat(F.concat(phrase, F.lit(" ")), (tlen / F.length(phrase) + 2).cast("int")),
        1,
        tlen,
    )

    return turns.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def write_transcripts(
    spark: SparkSession, path: str, n_partitions: int = 32, **kwargs
) -> None:
    """Materialize the synthetic transcripts table as parquet, hash-
    partitioned on conv_id (the engine's canonical layout)."""
    df = synth_transcripts(spark, **kwargs)
    df.repartition(n_partitions, "conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    ).write.mode("overwrite").parquet(path)
