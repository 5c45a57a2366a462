"""Retention execution, small-file compaction, bounded work-unit pulls."""

import os

import pytest
from pyspark.sql import functions as F

from gobblin_spark import state
from gobblin_spark.operators import compaction, retention
from gobblin_spark.sources import files


def test_list_and_apply_retention(spark, tmp_path):
    base = tmp_path / "ds"
    for i, name in enumerate(["v1", "v2", "v3", "_staging-x"]):
        d = base / name
        d.mkdir(parents=True)
        (d / "part.txt").write_text(str(i))
        os.utime(d, (1000 + i, 1000 + i))

    versions = retention.list_dataset_versions(spark, str(base))
    names = {r.name for r in versions.collect()}
    assert names == {"v1", "v2", "v3"}  # _staging hidden

    deletable = retention.newest_k_deletable(versions, [], ["mtime", "name"], k=2)
    # dry run reports without deleting
    would = retention.apply_retention(spark, deletable, dry_run=True)
    assert [os.path.basename(p) for p in would] == ["v1"]
    assert (base / "v1").exists()
    # real run deletes the old version only
    deleted = retention.apply_retention(spark, deletable, dry_run=False)
    assert len(deleted) == 1
    assert not (base / "v1").exists() and (base / "v3").exists()


def test_compaction_time_range_verifier():
    import datetime as dt

    start = dt.datetime(2024, 6, 10, 12, 0)
    ok, _ = compaction.verify_compaction_time_range(
        "PageViewEvent", dt.datetime(2024, 6, 8, 12, 0), start,
        max_time_ago="3d", min_time_ago="1d")
    assert ok
    # too recent: late data may still arrive
    ok, why = compaction.verify_compaction_time_range(
        "PageViewEvent", dt.datetime(2024, 6, 10, 6, 0), start,
        max_time_ago="3d", min_time_ago="1d")
    assert not ok and "not between" in why
    # too old: outside the compaction window
    ok, _ = compaction.verify_compaction_time_range(
        "PageViewEvent", dt.datetime(2024, 6, 1), start,
        max_time_ago="3d", min_time_ago="1d")
    assert not ok
    # per-dataset regex lookback: Identity.* gets 1d2h, default 22h
    spec = "Identity.*:1d2h;22h;BizProfile.BizCompany:3h"
    assert compaction.matched_lookback("Identity/MemberAccount", spec, "3d") == "1d2h"
    assert compaction.matched_lookback("PageViewEvent", spec, "3d") == "22h"
    assert compaction.matched_lookback("BizProfile.BizCompany", spec, "3d") == "3h"
    # min recompaction duration: a too-recent previous run blocks
    ok, why = compaction.verify_compaction_time_range(
        "PageViewEvent", dt.datetime(2024, 6, 8, 12, 0), start,
        max_time_ago="3d", min_time_ago="1d",
        last_run_start=dt.datetime(2024, 6, 10, 11, 30),
        min_recompaction_duration="2h")
    assert not ok and "not before" in why
    # calendar month arithmetic: 1m before Mar 31 clamps to Feb 29 (2024)
    assert compaction._minus_period(dt.datetime(2024, 3, 31), 1, 0, 0) \
        == dt.datetime(2024, 2, 29)
    assert compaction.parse_lookback("1m2d3h") == (1, 2, 3)
    assert compaction.parse_lookback("22h") == (0, 0, 22)
    with pytest.raises(ValueError):
        compaction.parse_lookback("nope")


def test_compact_small_files(spark, sf_dir, tmp_path):
    ev = files.load_table(spark, sf_dir, "events")
    path = str(tmp_path / "frag")
    ev.repartition(16).write.parquet(path)  # 16 fragments
    before = ev.count()

    res = compaction.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert res["compacted"] and res["files_before"] == 16 and res["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == before
    assert back.columns == ev.columns

    # idempotent: already compact -> no-op
    res2 = compaction.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert not res2["compacted"] and res2["files_after"] == 1


def test_compact_crash_between_trash_and_publish_recovers(spark, sf_dir, tmp_path):
    """Simulate a crash after phase B (old files trashed) but before
    phase C (publish): recover_compaction must restore the original
    files so the dataset reads fully."""
    from gobblin_spark.sinks import publish as P

    ev = files.load_table(spark, sf_dir, "events").select("event_id", "user_id")
    path = str(tmp_path / "crashB")
    ev.repartition(8).write.parquet(path)
    before = spark.read.parquet(path).count()

    token = "deadbeef0001"
    df = spark.read.parquet(path)
    P.stage(df.coalesce(1), path, job_id=token)       # phase A
    compaction._trash_old_files(spark, path, token)   # phase B — then "crash"

    assert compaction.recover_compaction(spark, path) == "restored"
    assert spark.read.parquet(path).count() == before
    # staging was discarded; a rerun compacts cleanly
    res = compaction.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert res["compacted"] and spark.read.parquet(path).count() == before


def test_compact_crash_between_publish_and_cleanup_recovers(spark, sf_dir, tmp_path):
    """Crash after phase C (published) but before phase D (trash
    delete): the published files must win and recovery drops the trash
    (no double-read of old + new)."""
    from gobblin_spark.sinks import publish as P

    ev = files.load_table(spark, sf_dir, "events").select("event_id", "user_id")
    path = str(tmp_path / "crashC")
    ev.repartition(8).write.parquet(path)
    before = spark.read.parquet(path).count()

    token = "deadbeef0002"
    df = spark.read.parquet(path)
    staged = P.stage(df.coalesce(1), path, job_id=token)  # A
    compaction._trash_old_files(spark, path, token)       # B
    P.publish_staged(staged, spark)                       # C — then "crash"

    # dataset is already fully readable (published copy), trash ignored
    assert spark.read.parquet(path).count() == before
    assert compaction.recover_compaction(spark, path) == "cleaned"
    assert spark.read.parquet(path).count() == before
    assert compaction.recover_compaction(spark, path) == "noop"


def test_bounded_hwm_sizes_pulls(spark, sf_dir, tmp_path):
    orders = files.load_table(spark, sf_dir, "orders")
    total = orders.count()
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))

    pulled = 0
    lwm = None
    rounds = 0
    while pulled < total:
        hwm = state.bounded_hwm(orders, "o_orderdate", lwm, max_rows=600)
        if hwm is None:
            break
        pull = state.pull_incremental(orders, "o_orderdate", store, "orders", hwm=hwm)
        n = pull.df.count()
        # ties on the boundary watermark may push past the cap slightly
        assert n <= 600 + 50
        pulled += n
        pull.commit()
        lwm = hwm
        rounds += 1
    assert pulled == total and rounds >= 2
