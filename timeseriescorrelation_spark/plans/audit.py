"""Mechanical scalability lint over physical plans.

The repo's perf story rests on a few hard rules ("no cartesian
products", "no partition-less ordered windows outside oracle mode" —
SURVEY §4); until now they were enforced by hand-written per-query
plan tests and one-off audits.  This module turns the rules into a
function so the WHOLE headline surface is linted in one pytest and a
regression in any future operator fails CI instead of surfacing as a
100-TB incident.

Checks (plan-text level, no job execution):
- ``cartesian``: a CartesianProduct node — quadratic shuffle-free
  pairing; always wrong in this engine (equi-join or broadcast it).
- ``global_window``: a Window node whose spec has an ordering but NO
  partition columns — Spark moves the whole input to ONE partition
  (the WindowExec warning); fatal at scale.  Detected from the node's
  trailing bracket groups: ``Window [funcs], [part], [order]`` vs
  ``Window [funcs], [order]``.

BroadcastNestedLoopJoin is deliberately NOT flagged: every crossJoin
in the tree broadcasts a 1-row/aggregate side (VERDICT r02 audit), and
plan text cannot distinguish a 1-row broadcast from a big one — the
per-query tests own that judgement.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_ORDER_TAIL = re.compile(
    r"\], \[[^\[\]]*(?: ASC| DESC)[^\[\]]*\]\s*$"
)
_PARTITIONED_TAIL = re.compile(
    r"\], \[[^\[\]]+\], \[[^\[\]]*(?: ASC| DESC)[^\[\]]*\]\s*$"
)


def plan_text(df: DataFrame) -> str:
    """Executed-plan string (Catalyst + codegen decided, no job run)."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan_text(plan: str) -> list[str]:
    """Findings for one plan string; empty list = clean."""
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append("cartesian: CartesianProduct node in plan")
    for line in plan.splitlines():
        stripped = line.strip()
        if not re.match(r"^[+\-:*( ]*Window ", stripped):
            continue
        if _ORDER_TAIL.search(stripped) and not _PARTITIONED_TAIL.search(
            stripped
        ):
            findings.append(
                "global_window: partition-less ordered Window "
                f"(single-partition sort): {stripped[:120]}"
            )
    return findings


def audit_plan(df: DataFrame) -> list[str]:
    return audit_plan_text(plan_text(df))
