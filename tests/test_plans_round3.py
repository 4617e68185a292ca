"""Physical-plan audits for the round-3 activity operators: the scale
claims in their docstrings must be visible in the executed plan."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as em  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_trailing_active_no_range_join_one_row_broadcast(spark):
    plan = _plan(em.queries()["trailing_active_24h"](spark, SF))
    # collapse-then-explode: NO join against an hour grid, only the
    # 1-row global-max side (broadcast nested loop on purpose)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Generate explode" in plan, plan
    # distinct tuples collapse BEFORE the explode: partial hash-agg
    # on (metric, actor, hour) feeds the generator
    assert plan.count("HashAggregate") >= 4, plan


def test_burstiness_one_partitioned_window_one_agg(spark):
    plan = _plan(em.queries()["burstiness_daily"](spark, SF))
    # the lag window partitions by the series key -- never global
    assert "windowspecdefinition(conv_id" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    # decimal(38,0) squared sums must stay hash-aggregable
    assert "SortAggregate" not in plan, plan


def test_weighted_median_pick_uses_window_group_limit(spark):
    plan = _plan(em.queries()["weighted_median"](spark, SF))
    # the first-hit pick is a rank-1 filter Spark rewrites into
    # WindowGroupLimit (top-1 per key without materializing ranks)
    assert "WindowGroupLimit" in plan, plan
    # all windows partition by metric -- no empty partition spec
    assert "windowspecdefinition(metric" in plan, plan


def test_sax_motifs_census_is_hash_agg_not_join(spark):
    plan = _plan(em.queries()["sax_motifs"](spark, SF))
    # census = GROUP BY word; no self-join of days anywhere
    assert "SortMergeJoin" not in plan.replace(
        "SortMergeJoin(keys=[metric", ""
    )
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan
