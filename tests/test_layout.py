"""Z-order layout: Morton key algebra + measured clustering benefit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.sources.layout import (
    write_zordered, zorder_key,
)


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_pure_python_morton(spark):
    rows = [(x, y) for x in range(9) for y in range(9)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton2(x, y)
    # locality sanity: (0,0) and (1,1) are closer in z than (0,0), (8,8)
    assert abs(got[(1, 1)] - got[(0, 0)]) < abs(got[(8, 8)] - got[(0, 0)])


def test_zorder_write_clusters_point_predicates(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (conv, (base + dt.timedelta(days=d, minutes=conv)), d,
         float(conv * d))
        for conv in range(64)
        for d in range(32)
    ]
    df = spark.createDataFrame(
        rows, "conv_ord int, ts timestamp, day_ord int, value double"
    )

    zpath = str(tmp_path / "z")
    apath = str(tmp_path / "arrival")
    write_zordered(df, zpath, ["conv_ord", "day_ord"], num_files=16)
    # arrival order: round-robin repartition scatters every (conv, day)
    df.repartition(16).write.mode("overwrite").parquet(apath)

    def files_touched(path: str) -> int:
        hit = (
            spark.read.parquet(path)
            .where((F.col("conv_ord") == 5) & (F.col("day_ord") == 7))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return hit

    z_hit, a_hit = files_touched(zpath), files_touched(apath)
    # the single matching row lives in exactly one z file; arrival
    # order scatters the same (conv, day) neighborhood everywhere, so
    # a RANGE predicate shows the real contrast
    assert z_hit == 1

    def files_touched_range(path: str) -> int:
        return (
            spark.read.parquet(path)
            .where(
                F.col("conv_ord").between(4, 7)
                & F.col("day_ord").between(4, 7)
            )
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_range, a_range = files_touched_range(zpath), files_touched_range(apath)
    assert z_range <= 4
    # 16 neighborhood rows round-robined across 16 files touch most of
    # them; z-order packs the same rows into a couple of key ranges
    assert a_range >= 2 * z_range
