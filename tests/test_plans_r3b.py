"""Physical-plan audits for the round-3b operators: the scale claims
in their docstrings must be visible in the executed plan — the
pairtests family collapses to the grid before any join, the skyline
probe broadcasts its level table, the metrics-db pair never windows
over raw rows, and the novelty join is an equi-join on the shingle."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as em  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mcnemar_grid_before_join(spark):
    # the week-over-week pair join must join AGGREGATED grid rows on
    # (metric, week, slot) — equi-join, never cartesian/BNLJ
    plan = _plan(em.queries()["mcnemar_wow"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one scan of events feeding a hash aggregate each side
    assert plan.count("Scan parquet") <= 2, plan


def test_cvm_single_scan_no_join_on_raw(spark):
    # rank scaffold: one scan, windows over the day grid only
    plan = _plan(em.queries()["cvm_weekend"](spark, SF))
    assert plan.count("Scan parquet") == 1, plan
    assert "CartesianProduct" not in plan


def test_skyline_levels_broadcast(spark):
    # the dominance probe is a broadcast nested-loop against the
    # LEVEL table (theta condition — BNLJ is the intended physical
    # form; the bounded side is the broadcast one), never a shuffle
    plan = _plan(em.queries()["skyline_users"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_counter_rate_windows_over_grid_only(spark):
    # both windows run AFTER the hourly hash-agg: the raw scan feeds
    # exactly one HashAggregate before any Window
    plan = _plan(em.queries()["counter_rate"](spark, SF))
    scan_pos = plan.find("Scan parquet")
    win_pos = plan.find("Window")
    agg_positions = [m.start() for m in
                     re.finditer(r"HashAggregate", plan)]
    assert scan_pos >= 0 and win_pos >= 0
    # some aggregate sits between the window and the scan in the
    # operator tree (string order: deeper operators print LATER)
    assert any(win_pos < p < scan_pos + len(plan) for p in
               agg_positions), plan
    assert "CartesianProduct" not in plan


def test_histogram_p95_no_raw_window(spark):
    # bucket assignment is in-row; windows run over |buckets| cells
    plan = _plan(em.queries()["histogram_p95"](spark, SF))
    assert plan.count("Scan parquet") == 1, plan
    assert "CartesianProduct" not in plan


def test_trigram_novelty_equi_join_on_shingle(spark):
    plan = _plan(em.queries()["trigram_novelty"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(BroadcastHash|SortMerge|ShuffledHash)Join "
                     r"\[shingle#\d+", plan), plan


def test_corr_grain_audit_pair_joins_on_bucket(spark):
    plan = _plan(em.queries()["corr_grain_audit"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recovery_single_scan_single_window(spark):
    plan = _plan(em.queries()["recovery_after_error"](spark, SF))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Window") == 1, plan


def test_capture_recapture_equi_joins_only(spark):
    plan = _plan(em.queries()["capture_recapture"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dow_contrasts_broadcast_pooled_error(spark):
    # the 21-pair join and the MSW attach are aggregate-sized; the
    # MSW side must broadcast, and nothing may go cartesian
    plan = _plan(em.queries()["dow_contrasts"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_logit_fit_beta_rides_broadcast(spark):
    # the 1-row beta frames attach via broadcast nested-loop (the
    # intended physical form for a literal cross join); the corpus
    # must never shuffle for them
    plan = _plan(em.queries()["logit_fit"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_nw_align_pair_join_on_day(spark):
    plan = _plan(em.queries()["nw_align"](spark, SF))
    assert "CartesianProduct" not in plan
    # profile pair join keys on day_ts (equi) before the DP kernel
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan


def test_xcorr_prewhitened_broadcast_rho(spark):
    plan = _plan(em.queries()["xcorr_prewhitened"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_edge_jaccard_strategies_agree(spark):
    # the dense broadcast-adjacency path must produce the identical
    # integer table as the wedge join on the same graph
    from timeseriescorrelation_spark.operators.graphrank import (
        edge_jaccard,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (1, 4), (2, 2)],
        "src long, dst long",
    )
    def norm(df):
        return sorted(tuple(r) for r in df.collect())
    assert norm(edge_jaccard(edges, strategy="wedge")) == \
        norm(edge_jaccard(edges, strategy="dense"))


def test_edge_similarity_dense_no_wedge_shuffle(spark):
    # the headline query uses the dense path: adjacency arrays ride
    # broadcasts, so no shuffle scales with wedge count
    plan = _plan(em.queries()["edge_similarity"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_adamic_adar_strategies_agree(spark):
    from timeseriescorrelation_spark.operators.graphrank import (
        adamic_adar_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (1, 4), (2, 5)],
        "src long, dst long",
    )
    def norm(df):
        return sorted(tuple(r) for r in df.collect())
    w = adamic_adar_scores(edges, top_k=100, strategy="wedge")
    d = adamic_adar_scores(edges, top_k=100, strategy="dense")
    assert norm(w) == norm(d)
