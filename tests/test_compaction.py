"""Compaction: the FFD planner's packing invariants, and
rewrite_data_files' contract — same rows, fewer files, big files
untouched on disk, old version still time-travel-readable."""

from __future__ import annotations

from timeseriescorrelation_spark.sources.compaction import (
    plan_compaction,
    rewrite_data_files,
)
from timeseriescorrelation_spark.sources.snapshots import (
    _fs,
    _manifest,
    snapshot_read,
    snapshot_write,
)


def test_plan_ffd_packs_and_keeps():
    sizes = [("a", 90), ("b", 60), ("c", 40), ("d", 30), ("e", 10)]
    plan = plan_compaction(sizes, target_bytes=100, small_ratio=0.5)
    # a (90) and b (60) are >= 50 -> kept; c+d+e pack into one bin
    assert plan["keep"] == ["a", "b"]
    assert plan["bins"] == [["c", "d", "e"]]
    assert plan["small_bytes"] == 80
    # every small file appears exactly once across bins
    flat = [p for b in plan["bins"] for p in b]
    assert sorted(flat) == ["c", "d", "e"]


def test_plan_respects_bin_capacity():
    sizes = [(f"f{i}", 40) for i in range(5)]
    plan = plan_compaction(sizes, target_bytes=100, small_ratio=1.1)
    assert all(
        sum(40 for _ in b) <= 100 for b in plan["bins"]
    )
    assert len(plan["bins"]) == 3  # 2+2+1


def test_rewrite_compacts_small_files_only(spark, tmp_path):
    t = str(tmp_path / "tier_1m")
    # one big commit (single larger file), then many 1-row commits
    snapshot_write(
        spark.range(5000).selectExpr("id AS v").coalesce(1), t, "append"
    )
    for i in range(6):
        snapshot_write(
            spark.range(10000 + i, 10001 + i).selectExpr("id AS v")
            .coalesce(1),
            t,
            "append",
        )
    before = snapshot_read(spark, t)
    before_rows = sorted(r.v for r in before.collect())
    jvm, fs, _ = _fs(spark, t)
    files_before = _manifest(jvm, fs, t, 7)["files"]

    # big file ~ tens of KB; 1-row files ~ hundreds of bytes
    r = rewrite_data_files(spark, t, target_bytes=16 * 1024,
                           small_ratio=0.5)
    assert r["version"] == 8
    assert r["rewrote"] == 6 and r["kept"] >= 1
    after_files = _manifest(jvm, fs, t, 8)["files"]
    assert len(after_files) < len(files_before)
    # kept (big) files are the SAME paths — never rewritten
    kept = set(files_before) & set(after_files)
    assert len(kept) == r["kept"]
    # rows identical
    after_rows = sorted(r_.v for r_ in snapshot_read(spark, t).collect())
    assert after_rows == before_rows
    # pre-compaction version still time-travels
    assert sorted(
        r_.v for r_ in snapshot_read(spark, t, version=7).collect()
    ) == before_rows


def test_rewrite_noop_when_nothing_small(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(100).selectExpr("id AS v").coalesce(1), t, "append"
    )
    r = rewrite_data_files(spark, t, target_bytes=128, small_ratio=0.5)
    assert r["rewrote"] == 0 and r["version"] == 1
