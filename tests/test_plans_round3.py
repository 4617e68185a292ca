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


def test_tpch_q5_broadcasts_all_dims(spark):
    plan = _plan(em.queries()["tpch_q5"](spark, SF))
    # every dimension side broadcasts; lineitem is the only big table
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan
    # revenue is summed as exact bigint cents, hash-aggregable
    assert "SortAggregate" not in plan, plan


def test_tpch_q6_pushes_filters_to_scan(spark):
    plan = _plan(em.queries()["tpch_q6"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    # column pruning: only the 4 referenced columns are read
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double" \
        in plan, plan
    assert "Join" not in plan


def test_attribution_is_window_not_self_join(spark):
    plan = _plan(em.queries()["attribution"](spark, SF))
    # the touch lookup is a per-user window, never an event self-join
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition(user_id" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_expanding_zscore_one_shuffle_one_sort(spark):
    plan = _plan(em.queries()["expanding_zscore"](spark, SF))
    # three running sums share ONE window sort on one hash exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort [") == 1, plan


def test_growth_accounting_churn_join_broadcasts(spark):
    plan = _plan(em.queries()["growth_accounting"](spark, SF))
    # the day-ledger self-join is |days| rows and must broadcast
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_drawdown_two_windows_share_one_exchange(spark):
    plan = _plan(em.queries()["drawdown_daily"](spark, SF))
    # cumsum + running-peak share the (metric, day) sort; final agg
    # groups on the same keys, so at most the window exchange + reuse
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert plan.count("Sort [") <= 2, plan


def test_tpch_q7_facts_shuffle_dims_broadcast(spark):
    plan = _plan(em.queries()["tpch_q7"](spark, SF))
    # lineitem-orders is the one fact-fact join; all four dim joins
    # (customer, supplier, nation x2) broadcast
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan
    assert "SortAggregate" not in plan, plan


def test_tpch_q15_max_filter_is_broadcast_not_sort(spark):
    plan = _plan(em.queries()["tpch_q15"](spark, SF))
    # the max-revenue cut is a 1-row broadcast back onto the
    # per-supplier aggregate (Catalyst even rewrites the crossJoin +
    # equality filter into a BroadcastHashJoin on rev_c), never a
    # global sort
    assert "BroadcastHashJoin [rev_c" in plan \
        or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "GlobalSort" not in plan and "Sort [rev_c" not in plan, plan


def test_tpch_q17_window_shares_one_exchange(spark):
    plan = _plan(em.queries()["tpch_q17"](spark, SF))
    # both per-part window stats ride ONE hashpartitioning exchange
    # over the broadcast part-filtered fact rows
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_fleet_coverage_single_shuffle(spark):
    plan = _plan(em.queries()["fleet_coverage"](spark, SF))
    # clip is in-partition (explode, no exchange before it); the
    # islands merge is the only hashpartitioning exchange chain keyed
    # by day: two cumulative windows on one sort + two hash-aggs
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_dsir_model_join_broadcasts(spark):
    plan = _plan(em.queries()["dsir_weights"](spark, SF))
    # both the 4096-row model probe and the vocab-id join broadcast;
    # the only wide shuffles are the count hash-aggs
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_emb_cov_is_one_selfjoin_one_hashagg(spark):
    plan = _plan(em.queries()["emb_cov"](spark, SF))
    # the i<=j restriction rides the rid equi-join as a residual;
    # moments are decimal hash-aggregable (never SortAggregate)
    assert "SortAggregate" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan, plan
