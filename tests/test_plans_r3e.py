"""Physical-plan audits for the round-3e operators: the scale claims
in their docstrings must be visible in the executed plan — cdc has no
window sort, the KMV/streak/theta windows are key-partitioned (never
single-partition), the MMD/Mahalanobis stats joins broadcast, and
nothing compiles to a cartesian product."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as em  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cdc_snapshot_no_window_sort(spark):
    """cdc_snapshot's whole point: last-wins via packed-decimal max —
    two hash-aggs and an equi-join, never a row_number window."""
    plan = _plan(em.queries()["cdc_snapshot"](spark, SF))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_kmv_windows_are_key_partitioned(spark):
    """The per-seg top-k sorts must be PARTITIONED window sorts (seg /
    seg-pair keys), never an empty-partition global Window."""
    plan = _plan(em.queries()["kmv_overlap"](spark, SF))
    for m in re.finditer(r"Window \[.*?windowspecdefinition\(([^,]*),",
                         plan):
        assert "seg" in m.group(1), m.group(0)[:120]
    assert "CartesianProduct" not in plan


def test_emb_stats_joins_broadcast(spark):
    """emb_mahalanobis joins the metadata-sized (label, dim) moment
    table back to the exploded rows — must be a broadcast."""
    plan = _plan(em.queries()["emb_mahalanobis"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_emb_mmd_pair_stage_broadcasts(spark):
    plan = _plan(em.queries()["emb_mmd"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_modularity_no_cartesian(spark):
    plan = _plan(em.queries()["modularity_lpa"](spark, SF))
    assert "CartesianProduct" not in plan
    # 1-row total side rides a broadcast nested loop by construction
    assert plan.count("HashAggregate") >= 4


def test_boilerplate_single_shuffle_chain(spark):
    """tokenize/explode stay in one stage; the df table and the per-doc
    reduce are hash-aggs (no window, no sort)."""
    plan = _plan(em.queries()["boilerplate_ngrams"](spark, SF))
    assert "Window" not in plan
    assert "Sort " not in plan.replace("SortAggregate", ""), plan


def test_ipw_single_broadcast_total(spark):
    plan = _plan(em.queries()["ipw_strata"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_theta_windows_key_partitioned(spark):
    plan = _plan(em.queries()["theta_forecast"](spark, SF))
    for m in re.finditer(r"windowspecdefinition\(([^,]*),", plan):
        assert "metric" in m.group(1), m.group(0)[:120]
