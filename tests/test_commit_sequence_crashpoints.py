"""Exhaustive crash-point coverage of the CommitSequence exactly-once
publish (``sinks/commit_sequence.py``): inject a crash at EVERY
filesystem mutation of execute() — journal persists/prunes, publish
renames, the _SUCCESS marker, watermark-journal writes, the completion
marker — then run the startup recovery path (``recover()``, the
AbstractJobLauncher replay) and assert the terminal state is the
exactly-once outcome: both datasets published with the right rows,
the watermark at its final value, the marker present, and the
sequence store drained.

Like tests/test_compaction_crashpoints.py this drives the REAL code:
the Hadoop FS handles of both the publish layer and the
WatermarkStore are wrapped in counting proxies sharing one budget."""

import os

import pytest

from _crash_proxy import Boom as _Boom, CrashingFs as _CrashingFs

from gobblin_spark.sinks import commit_sequence as CS
from gobblin_spark.sinks import publish as P
from gobblin_spark import state as ST


def _build(spark, tmp_path, n):
    base = tmp_path / f"case{n}"
    dfa = spark.createDataFrame([(i, "a") for i in range(5)],
                                "k long, s string")
    dfb = spark.createDataFrame([(i, "b") for i in range(7)],
                                "k long, s string")
    stg_a = P.stage(dfa, str(base / "out_a"), job_id="ja")
    stg_b = P.stage(dfb, str(base / "out_b"), job_id="jb")
    seq = CS.Sequence("job1", [
        CS.publish_step(stg_a.staging_dir, str(base / "out_a")),
        CS.publish_step(stg_b.staging_dir, str(base / "out_b")),
        CS.watermark_step(str(base / "wm"), "ds", {"value": 41}),
        CS.marker_step(str(base / "out_a" / "_COMMITTED")),
    ])
    return base, seq


def test_every_crash_point_replays_to_exactly_once(spark, tmp_path,
                                                   monkeypatch):
    """For every mutation count N: execute the sequence until the Nth
    filesystem mutation raises, then recover() from a fresh store and
    require the exactly-once terminal state. Crashes before the first
    journal persist lose the sequence by design (the reference
    persists BEFORE executing — nothing was published yet, the job
    simply reruns); those cases assert nothing was published."""
    real_p_fs = P._fs
    real_w_fs = ST.WatermarkStore._fs

    n = 0
    covered = 0
    while True:
        n += 1
        base, seq = _build(spark, tmp_path, n)
        store_root = str(base / "seqstore")
        budget = [n]

        def crash_p(spk, p, _b=budget):
            fs, dst, jvm = real_p_fs(spk, p)
            return _CrashingFs(fs, _b), dst, jvm

        def crash_w(self, _b=budget):
            fs, jvm = real_w_fs(self)
            return _CrashingFs(fs, _b), jvm

        monkeypatch.setattr(P, "_fs", crash_p)
        monkeypatch.setattr(ST.WatermarkStore, "_fs", crash_w)
        try:
            store = CS.CommitSequenceStore(spark, store_root)
            store.execute(seq)
            crashed = False
        except _Boom:
            crashed = True
        finally:
            monkeypatch.setattr(P, "_fs", real_p_fs)
            monkeypatch.setattr(ST.WatermarkStore, "_fs", real_w_fs)

        fresh = CS.CommitSequenceStore(spark, store_root)
        had_pending = bool(fresh.pending())
        recovered = fresh.recover()

        if not had_pending and crashed:
            # crashed before the first durable persist: by design the
            # sequence is lost whole — nothing may have been published
            assert not os.path.isdir(str(base / "out_a")) or not any(
                f.endswith(".parquet")
                for f in os.listdir(str(base / "out_a")))
            continue
        covered += 1
        # exactly-once terminal state
        assert spark.read.parquet(str(base / "out_a")).count() == 5
        assert spark.read.parquet(str(base / "out_b")).count() == 7
        for d in ("out_a", "out_b"):
            assert os.path.exists(str(base / d / "_SUCCESS"))
        assert ST.WatermarkStore(spark, str(base / "wm")).get("ds") == 41
        assert os.path.exists(str(base / "out_a" / "_COMMITTED"))
        assert fresh.pending() == []            # store drained
        assert CS.CommitSequenceStore(spark, store_root).recover() == []
        if not crashed:
            assert recovered == []              # execute completed it
            break
    assert covered >= 10    # the sweep actually walked the protocol


def test_recovered_watermark_never_regresses(spark, tmp_path):
    """Replaying a sequence whose watermark step already committed (or
    a NEWER watermark landed meanwhile) must not move the watermark
    backwards — the monotone guard in _run_step."""
    base, seq = _build(spark, tmp_path, "wm")
    store_root = str(base / "seqstore")
    store = CS.CommitSequenceStore(spark, store_root)
    store.execute(seq)
    wm = ST.WatermarkStore(spark, str(base / "wm"))
    wm.commit("ds", 99)                         # newer epoch landed
    # force a full replay of the same sequence
    for s in seq.steps:
        s.done = False
    store.execute(seq)
    assert wm.get("ds") == 99                   # not regressed to 41
