from __future__ import annotations

from pyspark.sql import functions as F

from timeseriescorrelation_spark.synth import synth_transcripts


def test_schema_and_determinism(spark, tiny_transcripts):
    df = tiny_transcripts
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    # deterministic: same seed → identical rows, regardless of partitioning
    again = synth_transcripts(
        spark, n_convs=20, base_turns=50, seed=42,
        skew_frac=0.05, skew_min_mult=5, skew_max_mult=20,
    ).repartition(3)
    assert df.exceptAll(again).isEmpty() and again.exceptAll(df).isEmpty()


def test_turn_idx_dense_and_ts_monotone(tiny_transcripts):
    df = tiny_transcripts
    stats = (
        df.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.min("turn_idx").alias("lo"),
             F.max("turn_idx").alias("hi"))
        .where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    )
    assert stats.count() == 0

    from pyspark.sql import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = df.withColumn("prev", F.lag("ts").over(w)).where(
        F.col("prev").isNotNull() & (F.col("ts") < F.col("prev"))
    )
    assert bad.count() == 0


def test_properties(tiny_transcripts):
    df = tiny_transcripts
    roles = {r["role"] for r in df.select("role").distinct().collect()}
    assert roles == {"user", "assistant", "tool"}
    null_frac = df.where(F.col("tool").isNull()).count() / df.count()
    assert 0.55 < null_frac < 0.85
    lens = df.select(F.length("text").alias("l")).agg(
        F.min("l"), F.max("l")).first()
    assert lens[0] >= 5 and lens[1] <= 2000


def test_per_turn_text_equality_invariant(spark, tiny_transcripts, tmp_path):
    """BASELINE.json:15 binding invariant: after the canonical
    shuffle-bearing layout (hash repartition on conv_id + explicit
    sortWithinPartitions) and a storage round-trip, (conv_id, turn_idx)
    -> text is byte-identical to the input."""
    p = str(tmp_path / "layout")
    (
        tiny_transcripts.repartition(8, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite").parquet(p)
    )
    back = spark.read.parquet(p)
    a = tiny_transcripts.select("conv_id", "turn_idx", "text")
    b = back.select(
        "conv_id", "turn_idx", F.col("text").alias("text_b")
    )
    joined = a.join(b, ["conv_id", "turn_idx"], "full_outer")
    n_bad = joined.where(
        F.col("text").isNull()
        | F.col("text_b").isNull()
        | (F.col("text") != F.col("text_b"))
    ).count()
    assert n_bad == 0
    assert back.count() == tiny_transcripts.count()
