"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full rollup cascade on sf0.001 events → 1h tier.
queries()    — one entry per implemented operator (SURVEY.md §2).
oracle_sql() — DuckDB-equivalent ANSI SQL per query key.

Events table is the stand-in transcript stream for the driver harness
(FIXTURES.md §5): user_id↔conv_id, event_type↔metric, value↔metric value,
event_id↔turn_idx (unique, so composite tie-breaks are exercised while
staying arg_min/arg_max-expressible in DuckDB).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseriescorrelation_spark.operators.gapfill import fill_locf  # noqa: E402
from timeseriescorrelation_spark.operators.rollup import (  # noqa: E402
    rollup_cascade,
    rollup_raw,
    rollup_tier,
    tier_summary,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _series_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical series shape (conv_id, metric, ts, turn_idx, value)."""
    return _events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_type").alias("metric"),
        F.col("ts"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("value"),
    )


def _tier_out():
    # built lazily: Column construction needs an active SparkContext
    return [
        "conv_id",
        "metric",
        "bucket_ts",
        "cnt",
        F.round("sum", 6).alias("sum_v"),
        F.col("min").alias("min_v"),
        F.col("max").alias("max_v"),
        F.col("first").alias("first_v"),
        F.col("last").alias("last_v"),
    ]

_TIER_ORACLE = """
SELECT cast(user_id AS varchar) AS conv_id,
       event_type AS metric,
       date_trunc('{trunc}', ts) AS bucket_ts,
       count(value) AS cnt,
       round(sum(value), 6) AS sum_v,
       min(value) AS min_v,
       max(value) AS max_v,
       arg_min(value, ts) AS first_v,
       arg_max(value, ts) AS last_v
FROM events
GROUP BY 1, 2, 3
"""


def q_rollup_1m(spark, sf_dir):
    return rollup_raw(_series_from_events(spark, sf_dir), "1m").select(*_tier_out())


def q_rollup_1h(spark, sf_dir):
    t1m = rollup_raw(_series_from_events(spark, sf_dir), "1m")
    return rollup_tier(t1m, "1h").select(*_tier_out())


def q_rollup_1d(spark, sf_dir):
    t = rollup_cascade(_series_from_events(spark, sf_dir))
    return t["1d"].select(*_tier_out())


def q_locf_1h(spark, sf_dir):
    s = _series_from_events(spark, sf_dir).withColumn("metric", F.lit("value"))
    return fill_locf(s, "1h").select("conv_id", "grid_ts", "value", "filled")


def q_stats_per_user(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("value").alias("cnt"),
            F.round(F.sum("value"), 6).alias("sum_v"),
            F.round(F.avg("value"), 6).alias("avg_v"),
            F.round(F.stddev_pop("value"), 6).alias("std_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


def q_lag_delta(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _events(spark, sf_dir)
    return e.select(
        "user_id",
        "event_id",
        F.round(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
            )
            / F.lit(1e6),
            6,
        ).alias("delta_s"),
    ).where(F.col("delta_s").isNotNull())


def q_topk_per_user(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


def q_filter_range(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.where(
        (F.col("event_type") == "click")
        & F.col("ts").between("2024-01-05 00:00:00", "2024-01-20 00:00:00")
        & (F.col("value") >= 10.0)
    ).select("event_id", "user_id", "ts", "value")


def q_distinct_users(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
    )


def q_rollup_summary_1d(spark, sf_dir):
    t1d = rollup_cascade(_series_from_events(spark, sf_dir))["1d"]
    return tier_summary(t1d).select(
        "metric", "n_buckets", "points", F.round("total", 4).alias("total")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tiers = rollup_cascade(_series_from_events(spark, "/root/testdata/sf0.001"))
    return tiers["1h"].select(*_tier_out())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m": q_rollup_1m,
        "rollup_1h": q_rollup_1h,
        "rollup_1d": q_rollup_1d,
        "locf_1h": q_locf_1h,
        "stats_per_user": q_stats_per_user,
        "lag_delta": q_lag_delta,
        "topk_per_user": q_topk_per_user,
        "filter_range": q_filter_range,
        "distinct_users": q_distinct_users,
        "rollup_summary_1d": q_rollup_summary_1d,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1m": _TIER_ORACLE.format(trunc="minute"),
        "rollup_1h": _TIER_ORACLE.format(trunc="hour"),
        "rollup_1d": _TIER_ORACLE.format(trunc="day"),
        "locf_1h": """
WITH obs AS (
  SELECT cast(user_id AS varchar) AS conv_id,
         date_trunc('hour', ts) AS g,
         arg_max(value, ts) AS v
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT conv_id, min(g) AS lo, max(g) AS hi FROM obs GROUP BY 1
), grid AS (
  SELECT conv_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g
  FROM spans
), j AS (
  SELECT grid.conv_id, grid.g, obs.v
  FROM grid LEFT JOIN obs ON grid.conv_id = obs.conv_id AND grid.g = obs.g
)
SELECT conv_id,
       g AS grid_ts,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY conv_id ORDER BY g
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       (v IS NULL) AS filled
FROM j
""",
        "stats_per_user": """
SELECT user_id,
       count(value) AS cnt,
       round(sum(value), 6) AS sum_v,
       round(avg(value), 6) AS avg_v,
       round(stddev_pop(value), 6) AS std_v,
       min(value) AS min_v,
       max(value) AS max_v
FROM events GROUP BY 1
""",
        "lag_delta": """
SELECT user_id, event_id, delta_s FROM (
  SELECT user_id, event_id,
         round((epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id))) / 1e6, 6) AS delta_s
  FROM events
) WHERE delta_s IS NOT NULL
""",
        "topk_per_user": """
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 3
""",
        "filter_range": """
SELECT event_id, user_id, ts, value
FROM events
WHERE event_type = 'click'
  AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
             AND TIMESTAMP '2024-01-20 00:00:00'
  AND value >= 10.0
""",
        "distinct_users": """
SELECT DISTINCT user_id, event_type FROM events
""",
        "rollup_summary_1d": """
WITH t1d AS (
  SELECT cast(user_id AS varchar) AS conv_id,
         event_type AS metric,
         date_trunc('day', ts) AS bucket_ts,
         count(value) AS cnt,
         sum(value) AS sum_v
  FROM events GROUP BY 1, 2, 3
)
SELECT metric,
       count(*) AS n_buckets,
       cast(sum(cnt) AS BIGINT) AS points,
       round(sum(sum_v), 4) AS total
FROM t1d
GROUP BY ROLLUP(metric)
""",
    }
