"""Whole-surface scalability lint: every benched query's physical plan
must be free of CartesianProduct nodes and partition-less ordered
windows (single-partition sorts).  The per-query plan tests in
test_plans.py assert the POSITIVE shapes (pushdown, broadcast,
equi-join); this one mechanically forbids the two always-fatal
negatives across the entire headline surface, so a regression in any
future operator fails here instead of at 100 TB."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as em  # noqa: E402
import bench  # noqa: E402
from timeseriescorrelation_spark.plans.audit import (  # noqa: E402
    audit_plan,
    audit_plan_text,
)

SF = "/root/testdata/sf0.001"


def test_detector_flags_global_window(spark):
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("g")
    )
    flagged = audit_plan(
        df.select(F.row_number().over(Window.orderBy("id")).alias("r"))
    )
    assert any("global_window" in f for f in flagged)
    clean = audit_plan(
        df.select(
            F.row_number()
            .over(Window.partitionBy("g").orderBy("id"))
            .alias("r")
        )
    )
    assert clean == []
    # partition-only (unordered) frames are fine too
    clean2 = audit_plan(
        df.select(F.sum("id").over(Window.partitionBy("g")).alias("s"))
    )
    assert clean2 == []


def test_detector_flags_cartesian():
    assert any(
        "cartesian" in f
        for f in audit_plan_text("*(2) CartesianProduct\n:- Scan x\n")
    )
    assert audit_plan_text("*(2) BroadcastHashJoin [a], [b]\n") == []


def test_headline_surface_is_lint_clean(spark):
    """Build (don't run) the physical plan of every benched query at
    sf0.001 with the bench's scale overrides applied — the exact
    composition BENCH_rN measures — and assert zero findings."""
    qs = em.queries()
    qs.update(bench._scale_overrides())
    bad = {}
    for name in [*bench.HEADLINE, *bench.HEADLINE_R3,
                 *bench.HEADLINE_R4]:
        if name not in qs:
            continue
        findings = audit_plan(qs[name](spark, SF))
        if findings:
            bad[name] = findings
    assert bad == {}, bad
