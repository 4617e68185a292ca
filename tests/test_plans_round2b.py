"""Physical-plan audits for the round-2b operators: the scale claims
in their docstrings must be visible in the executed plan."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as em  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tier_consistency_join_is_equi(spark):
    plan = _plan(em.queries()["tier_consistency"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bucket-grain diff is a full-outer equi join
    assert "FullOuter" in plan, plan


def test_mad_outliers_median_joins_broadcast(spark):
    df = em.queries()["mad_outliers"](spark, SF)
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    plan = _plan(df)
    # per-key median/MAD tables are tiny -> broadcast; the big series
    # side must never shuffle for the joins.  3 BHJ, not 2: the med
    # join's lineage is evaluated in both the MAD branch and the
    # output branch (inherent to the two-pass algorithm — med must
    # complete before deviations exist).
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan


def test_trend_daily_single_hash_agg(spark):
    plan = _plan(em.queries()["trend_daily"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "HashAggregate" in plan
    # decimal(38,0) moment sums must stay hash-aggregable
    assert "SortAggregate" not in plan, plan


def test_concurrency_no_global_point_window(spark):
    plan = _plan(em.queries()["concurrency_1h"](spark, SF))
    # exactly two windows: the sharded running sum (partitioned by
    # shard_ts) and the |days|-row carry prefix (the only
    # unpartitioned one)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert len(specs) >= 2, plan
    sharded = [s for s in specs if "shard_ts" in s.split(",")[0]]
    assert sharded, f"point window must partition by shard_ts: {specs}"
    # carry join is broadcast (a |days|-row table)
    assert "BroadcastHashJoin" in plan


def test_lttb_join_back_is_equi_and_hash_agg(spark):
    plan = _plan(em.queries()["lttb_1h"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortAggregate" not in plan, plan


def test_spearman_one_pair_exchange(spark):
    """Both rank windows AND the final moment aggregation run on ONE
    hash exchange keyed on the pair — the two sort orders re-sort in
    place and groupBy(ua, ub) reuses the distribution."""
    plan = _plan(em.queries()["spearman_pairs"](spark, SF))
    pair_exchanges = re.findall(
        r"Exchange hashpartitioning\(ua#\d+", plan
    )
    assert len(pair_exchanges) == 1, plan


def test_acf_pairs_join_is_equi(spark):
    plan = _plan(em.queries()["acf_hourly"](spark, SF))
    # the lag pairing must compile to an equi-join on
    # (metric, lag, hour) — never a per-(key,lag) cross of hours
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_km_survival_windows_are_partitioned(spark):
    plan = _plan(em.queries()["km_survival"](spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # every window (risk count + cumulative log) partitions by metric
    assert all(s.split(",")[0].strip().startswith("metric") for s in specs), specs


def test_seasonal_strength_two_exchanges_hash_agg(spark):
    plan = _plan(em.queries()["seasonal_strength"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "SortAggregate" not in plan, plan


def test_forecast_eval_calendar_join_is_equi(spark):
    plan = _plan(em.queries()["forecast_eval"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_jaccard_no_cartesian(spark):
    plan = _plan(em.queries()["dedup_prefix_jaccard"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
