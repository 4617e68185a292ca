"""Schema evolution + partition-spec evolution on the snapshot store —
the two ALTER TABLE behaviors an Iceberg user exercises first
(BASELINE.json:15 names Iceberg as the table format; snapshots.py is
the jar-less executable spec of the contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriescorrelation_spark.sources.snapshots import (
    snapshot_diff,
    snapshot_merge,
    snapshot_read,
    snapshot_write,
)


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_add_column_on_append(spark, tmp_path):
    t = f"{tmp_path}/t"
    snapshot_write(_df(spark, [(1, "a"), (2, "b")], "id long, s string"), t)
    snapshot_write(
        _df(spark, [(3, "c", 9.5)], "id long, s string, score double"),
        t,
    )
    latest = snapshot_read(spark, t)
    assert latest.columns == ["id", "s", "score"]
    got = {r["id"]: r["score"] for r in latest.collect()}
    assert got == {1: None, 2: None, 3: 9.5}
    # time travel: v1 readers never see the new column
    assert snapshot_read(spark, t, version=1).columns == ["id", "s"]


def test_subset_append_keeps_union_schema(spark, tmp_path):
    t = f"{tmp_path}/t"
    snapshot_write(
        _df(spark, [(1, "a", 1.0)], "id long, s string, score double"), t
    )
    snapshot_write(_df(spark, [(2, "b")], "id long, s string"), t)
    latest = snapshot_read(spark, t)
    assert latest.columns == ["id", "s", "score"]
    got = {r["id"]: r["score"] for r in latest.collect()}
    assert got == {1: 1.0, 2: None}


def test_type_change_rejected(spark, tmp_path):
    t = f"{tmp_path}/t"
    snapshot_write(_df(spark, [(1, "a")], "id long, s string"), t)
    with pytest.raises(ValueError, match="additive only"):
        snapshot_write(_df(spark, [(2.5, "b")], "id double, s string"), t)


def test_overwrite_resets_schema(spark, tmp_path):
    t = f"{tmp_path}/t"
    snapshot_write(_df(spark, [(1, "a")], "id long, s string"), t)
    snapshot_write(
        _df(spark, [(7,)], "only long"), t, mode="overwrite"
    )
    assert snapshot_read(spark, t).columns == ["only"]


def test_partition_spec_evolution_reads_all_groups(spark, tmp_path):
    t = f"{tmp_path}/t"
    # v1 flat, v2 partitioned by day, v3 partitioned by (day, metric):
    # three specs coexist in one logical table, zero rewrites.
    snapshot_write(
        _df(spark, [("d1", "m1", 1)], "day string, metric string, v long"),
        t,
    )
    snapshot_write(
        _df(spark, [("d2", "m1", 2), ("d2", "m2", 3)],
            "day string, metric string, v long"),
        t, partition_by=["day"],
    )
    snapshot_write(
        _df(spark, [("d3", "m2", 4)], "day string, metric string, v long"),
        t, partition_by=["day", "metric"],
    )
    latest = snapshot_read(spark, t)
    assert latest.columns == ["day", "metric", "v"]
    got = sorted((r["day"], r["metric"], r["v"]) for r in latest.collect())
    assert got == [("d1", "m1", 1), ("d2", "m1", 2),
                   ("d2", "m2", 3), ("d3", "m2", 4)]
    # partition pruning reaches the partitioned groups' scans
    plan = latest.where(F.col("day") == "d2")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan


def test_partitioned_merge_rewrites_only_touched_partition(spark, tmp_path):
    t = f"{tmp_path}/t"
    snapshot_write(
        _df(spark, [("d1", 1, 10), ("d2", 2, 20), ("d2", 3, 30)],
            "day string, id long, v long"),
        t, partition_by=["day"],
    )
    res = snapshot_merge(
        _df(spark, [("d2", 2, 99)], "day string, id long, v long"),
        t, key_cols=["id"],
    )
    # only the d2 file containing id=2 rewrites; d1's file carries
    assert res["files_rewritten"] >= 1
    assert res["files_carried"] >= 1
    got = {r["id"]: (r["day"], r["v"])
           for r in snapshot_read(spark, t).collect()}
    assert got == {1: ("d1", 10), 2: ("d2", 99), 3: ("d2", 30)}


def test_diff_after_add_column_is_empty(spark, tmp_path):
    t = f"{tmp_path}/t"
    snapshot_write(_df(spark, [(1, "a")], "id long, s string"), t)
    # append zero rows with a wider schema: pure schema evolution
    snapshot_write(
        _df(spark, [], "id long, s string, score double"), t
    )
    d = snapshot_diff(spark, t, 1, 2)
    assert d.count() == 0


def test_compaction_preserves_partition_values(spark, tmp_path):
    from timeseriescorrelation_spark.sources.compaction import (
        rewrite_data_files,
    )

    t = f"{tmp_path}/t"
    snapshot_write(
        _df(spark, [("d1", 1), ("d2", 2)], "day string, v long").
        repartition(2), t, partition_by=["day"],
    )
    snapshot_write(
        _df(spark, [("d3", 3)], "day string, v long"), t,
        partition_by=["day"],
    )
    res = rewrite_data_files(spark, t, target_bytes=1 << 20)
    assert res["rewrote"] >= 2
    got = sorted((r["day"], r["v"])
                 for r in snapshot_read(spark, t).collect())
    assert got == [("d1", 1), ("d2", 2), ("d3", 3)]


def test_file_skipping_scan_prunes_by_footer_stats(spark, tmp_path):
    from timeseriescorrelation_spark.sources.snapshots import (
        scan_plan,
        snapshot_scan,
    )

    t = f"{tmp_path}/t"
    # three commits with disjoint day ranges, stats on 'day'
    for lo in (0, 10, 20):
        snapshot_write(
            _df(spark, [(lo + i, f"r{lo + i}") for i in range(5)],
                "day long, s string").coalesce(1),
            t, stat_cols=["day"],
        )
    plan = scan_plan(spark, t, {"day": (11, 13)})
    assert plan["total"] == 3 and plan["skipped"] == 2
    got = sorted(
        r["day"] for r in
        snapshot_scan(spark, t, {"day": (11, 13)})
        .where(F.col("day").between(11, 13)).collect()
    )
    assert got == [11, 12, 13]
    # open-ended bound: day >= 20 keeps only the last commit
    assert scan_plan(spark, t, {"day": (20, None)})["skipped"] == 2


def test_file_skipping_uses_partition_values(spark, tmp_path):
    from timeseriescorrelation_spark.sources.snapshots import scan_plan

    t = f"{tmp_path}/t"
    snapshot_write(
        _df(spark, [("d1", 1), ("d2", 2), ("d3", 3)],
            "day string, v long").repartition("day"),
        t, partition_by=["day"],
    )
    # no footer stats collected (partition col not in data files) --
    # the plan prunes from the partition-directory values instead
    plan = scan_plan(spark, t, {"day": ("d2", "d2")})
    assert plan["skipped"] >= 1
    assert any("day=d2" in f for f in plan["files"])
    assert not any("day=d1" in f for f in plan["files"])


def test_scan_without_stats_keeps_everything(spark, tmp_path):
    from timeseriescorrelation_spark.sources.snapshots import scan_plan

    t = f"{tmp_path}/t"
    snapshot_write(_df(spark, [(1, "a")], "day long, s string"), t)
    plan = scan_plan(spark, t, {"day": (99, 99)})
    assert plan["skipped"] == 0 and len(plan["files"]) == plan["total"]


def test_string_and_timestamp_stats_prune(spark, tmp_path):
    import datetime as dt

    from timeseriescorrelation_spark.sources.snapshots import scan_plan

    t = f"{tmp_path}/t"
    t0 = dt.datetime(2024, 1, 1)
    snapshot_write(
        _df(spark, [(t0, "apple")], "ts timestamp, s string")
        .coalesce(1), t, stat_cols=["ts", "s"],
    )
    snapshot_write(
        _df(spark, [(t0 + dt.timedelta(days=30), "zebra")],
            "ts timestamp, s string").coalesce(1), t,
        stat_cols=["ts", "s"],
    )
    assert scan_plan(
        spark, t, {"ts": (dt.datetime(2024, 1, 20), None)}
    )["skipped"] == 1
    assert scan_plan(spark, t, {"s": ("a", "m")})["skipped"] == 1


def test_wap_stage_audit_publish(spark, tmp_path):
    from timeseriescorrelation_spark.sources.snapshots import (
        publish_staged,
        snapshot_log,
        snapshot_read_staged,
    )

    t = f"{tmp_path}/t"
    snapshot_write(_df(spark, [(1, "ok")], "id long, s string"), t)
    h = snapshot_write(
        _df(spark, [(2, "pending")], "id long, s string"), t, staged=True
    )
    assert isinstance(h, str) and h.startswith("staged-")
    # audit: published readers see only v1; the staged read sees both
    assert snapshot_read(spark, t).count() == 1
    assert snapshot_read_staged(spark, t, h).count() == 2
    v = publish_staged(spark, t, h)
    assert v == 2
    assert snapshot_read(spark, t).count() == 2
    assert [e["operation"] for e in snapshot_log(spark, t)] \
        == ["append", "append"]


def test_wap_publish_refuses_stale_base(spark, tmp_path):
    from timeseriescorrelation_spark.sources.snapshots import (
        publish_staged,
    )

    t = f"{tmp_path}/t"
    snapshot_write(_df(spark, [(1, "a")], "id long, s string"), t)
    h = snapshot_write(
        _df(spark, [(2, "b")], "id long, s string"), t, staged=True
    )
    # head moves while the audit runs
    snapshot_write(_df(spark, [(3, "c")], "id long, s string"), t)
    with pytest.raises(ValueError, match="re-stage"):
        publish_staged(spark, t, h)
    # the interloper is visible; the stale staged rows never land
    assert snapshot_read(spark, t).count() == 2


def test_tags_resolve_and_pin_against_expiry(spark, tmp_path):
    from timeseriescorrelation_spark.sources.snapshots import (
        expire_snapshots,
        snapshot_tag,
    )

    t = f"{tmp_path}/t"
    for i in range(4):
        snapshot_write(
            _df(spark, [(i, f"r{i}")], "id long, s string"), t,
            mode="overwrite",
        )
    snapshot_tag(spark, t, "model-aug", version=2)
    assert {r["id"] for r in
            snapshot_read(spark, t, version="model-aug").collect()} == {1}
    res = expire_snapshots(spark, t, keep_last=1)
    # v2 is tagged: survives although keep_last=1; v1 and v3 reaped
    assert 2 not in res["expired_versions"]
    assert set(res["expired_versions"]) == {1, 3}
    assert snapshot_read(spark, t, version="model-aug").count() == 1


def test_metadata_tables(spark, tmp_path):
    from timeseriescorrelation_spark.sources.snapshots import (
        snapshot_files_table,
        snapshot_history_table,
    )

    t = f"{tmp_path}/t"
    snapshot_write(
        _df(spark, [(1, "a")], "id long, s string").coalesce(1), t,
        stat_cols=["id"],
    )
    snapshot_write(
        _df(spark, [("d1", 2, "b")], "day string, id long, s string")
        .coalesce(1), t, partition_by=["day"],
    )
    ft = snapshot_files_table(spark, t).collect()
    assert len(ft) == 2
    by_v = {r["committed_version"]: r for r in ft}
    assert by_v[1]["has_stats"] and by_v[1]["partition_spec"] == ""
    assert by_v[2]["partition_spec"] == "day"
    assert all(r["size_bytes"] > 0 for r in ft)
    ht = snapshot_history_table(spark, t).collect()
    assert [(r["version"], r["operation"]) for r in ht] \
        == [(1, "append"), (2, "append")]
