"""Exhaustive crash-point coverage of the small-file compaction swap
(``operators/compaction.py``): inject a crash at EVERY filesystem
mutation of phases B/B'/C/D (trash moves, intent write, publish
renames, marker write, cleanup deletes), run ``recover_compaction``,
and assert the directory reads back as EXACTLY the old rows or
EXACTLY the new rows — never a mix, never a loss, and never a
``_SUCCESS`` marker over incomplete data.

This drives the REAL code (the Hadoop FileSystem handle is wrapped in
a counting proxy), not a model. It reproduces both r13 audit bugs
against the pre-fix protocol shape:

- listStatus order is not contractual, so phase B could move data
  files before the ``_SUCCESS`` marker; a crash in that window made
  recovery read "published" and DELETE the trash (data loss). The
  marker now moves first, unconditionally.
- a crash mid-publish left partially-published NEW files in dst with
  no marker; restore renamed the old data back BESIDE them (duplicate
  rows under a restored marker). The ``_intent-<token>`` file now
  names the staged files so recovery un-publishes them first.
"""

import pytest

from _crash_proxy import Boom as _Boom, CrashingFs as _CrashingFs

from gobblin_spark.operators import compaction as C
from gobblin_spark.sinks import publish as P


def _read_keys(spark, path):
    return sorted(r.k for r in spark.read.parquet(path).collect())


def _setup(spark, tmp_path, name, with_success=True):
    """A 6-file directory of 12 rows; returns (path, old_keys)."""
    import os

    path = str(tmp_path / name)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(12)],
                               "k long, s string")
    df.repartition(6).write.mode("overwrite").parquet(path)
    if not with_success:
        os.remove(os.path.join(path, "_SUCCESS"))
        crc = os.path.join(path, "._SUCCESS.crc")
        if os.path.exists(crc):
            os.remove(crc)
    return path, sorted(range(12))


@pytest.mark.parametrize("with_success", [True, False])
def test_every_crash_point_recovers_to_old_or_new(spark, tmp_path,
                                                  with_success,
                                                  monkeypatch):
    """For every mutation count N: run the swap until the Nth
    filesystem mutation raises, recover, and require the directory to
    read as exactly-old or exactly-new; then a clean re-compaction
    must still succeed. Also: recovery is idempotent, leaves no
    _trash-/_intent- residue, and never leaves ``_SUCCESS`` over a
    non-readable state."""
    import os

    real_fs = P._fs

    n = 0
    while True:
        n += 1
        path, old_keys = _setup(spark, tmp_path,
                                f"d{'s' if with_success else 'n'}{n}",
                                with_success)
        budget = [n]

        def crashing(spk, p, _b=budget):
            fs, dst, jvm = real_fs(spk, p)
            return _CrashingFs(fs, _b), dst, jvm

        monkeypatch.setattr(P, "_fs", crashing)
        try:
            res = C.compact_small_files(spark, path,
                                        target_file_bytes=1 << 30)
            crashed = False
        except _Boom:
            crashed = True
        finally:
            monkeypatch.setattr(P, "_fs", real_fs)

        outcome = C.recover_compaction(spark, path)
        got = _read_keys(spark, path)
        assert got == old_keys, (
            f"crash point {n}: rows corrupted after {outcome} "
            f"(got {len(got)})")
        leftovers = [f for f in os.listdir(path)
                     if f.startswith(("_trash-", "_intent-"))]
        assert leftovers == [], f"crash point {n}: {leftovers}"
        # recovery idempotence
        assert C.recover_compaction(spark, path) in ("noop", "cleaned")
        assert _read_keys(spark, path) == old_keys
        # the directory is still compactable after recovery (a crash
        # late enough to have published already leaves it compacted —
        # then the re-run is a clean no-op, never an error)
        res2 = C.compact_small_files(spark, path,
                                     target_file_bytes=1 << 30)
        assert _read_keys(spark, path) == old_keys
        data_files = [f for f in os.listdir(path)
                      if not f.startswith(("_", "."))]
        assert len(data_files) == 1, f"crash point {n}: {data_files}"
        assert os.path.exists(os.path.join(path, "_SUCCESS"))
        res2    # the invariant is the directory state, not the flag
        if not crashed:
            break     # budget outlived the whole swap: done
    assert n >= 8     # the sweep actually covered the protocol


def test_completed_swap_then_lost_cleanup_is_cleaned(spark, tmp_path):
    """Crash between C and D (publish complete, cleanup lost): the
    new data is live under ``_SUCCESS``; recovery must finish the
    cleanup and keep the NEW rows."""
    import json
    import os

    path, old_keys = _setup(spark, tmp_path, "cd")
    df = spark.read.parquet(path)
    staged = P.stage(df.coalesce(1), path, fmt="parquet", job_id="tok1")
    names = [f for f in os.listdir(
        staged.staging_dir.replace("file:", ""))
        if not f.startswith(("_", "."))]
    C._trash_old_files(spark, path, "tok1")
    C._write_publish_intent(spark, path, "tok1", names)
    P.publish_staged(staged, spark)
    # simulated crash HERE (before phase D)
    assert C.recover_compaction(spark, path) == "cleaned"
    assert _read_keys(spark, path) == old_keys      # new rows == old rows
    assert len([f for f in os.listdir(path)
                if f.endswith(".parquet")]) == 1    # compacted layout
    assert not [f for f in os.listdir(path)
                if f.startswith(("_trash-", "_intent-"))]
    json  # silence linters


def test_prefix_marker_rule_regression(spark, tmp_path):
    """The r13 data-loss shape, pinned directly: data files in the
    trash while ``_SUCCESS`` is still in dst must NEVER happen via
    _trash_old_files (marker moves first), and if an out-of-order
    legacy crash produced it anyway, recovery with no intent present
    restores rather than... — the sound witness is what we pin: after
    the marker-first move order, a crash between ANY two phase-B
    renames leaves no ``_SUCCESS`` in dst."""
    import os

    path, _ = _setup(spark, tmp_path, "mk")
    real_fs = P._fs
    # crash after exactly 2 mutations inside phase B alone
    # (mkdirs + first rename = the marker's)
    budget = [2]

    def crashing(spk, p):
        fs, dst, jvm = real_fs(spk, p)
        return _CrashingFs(fs, budget), dst, jvm

    import unittest.mock as mock
    with mock.patch.object(P, "_fs", crashing):
        with pytest.raises(_Boom):
            C._trash_old_files(spark, path, "tokx")
    assert not os.path.exists(os.path.join(path, "_SUCCESS"))
    assert os.path.exists(os.path.join(path, "_trash-tokx", "_SUCCESS"))


# ---- review-pass 6 pins (r13) --------------------------------------


def test_compaction_on_unrecovered_dir_recovers_first(spark, tmp_path,
                                                      monkeypatch):
    """Review r13 pass 6 #1: a scheduled re-run on an UNRECOVERED
    directory (prior swap crashed mid-trash) must not compact the
    visible subset and publish it over the trashed rows — it recovers
    at entry, then compacts the FULL data."""
    import os

    path, old_keys = _setup(spark, tmp_path, "unrec")
    real_fs = P._fs
    budget = [4]        # crash inside phase B: marker + some moved

    def crashing(spk, p):
        fs, dst, jvm = real_fs(spk, p)
        return _CrashingFs(fs, budget), dst, jvm

    monkeypatch.setattr(P, "_fs", crashing)
    with pytest.raises(_Boom):
        C.compact_small_files(spark, path, target_file_bytes=1 << 30)
    monkeypatch.setattr(P, "_fs", real_fs)
    assert [f for f in os.listdir(path) if f.startswith("_trash-")]
    # the re-run, with NO manual recovery in between
    res = C.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert res["compacted"]
    assert _read_keys(spark, path) == old_keys      # nothing lost
    assert not [f for f in os.listdir(path)
                if f.startswith(("_trash-", "_intent-"))]


def test_stale_intent_from_completed_swap_is_inert(spark, tmp_path):
    """Review r13 pass 6 #2: an intent orphaned by a phase-D crash
    (trash deleted, intent delete lost) names files that are now the
    LIVE data; a later generation's recovery must delete it as an
    orphan, never act on it."""
    import os

    path, old_keys = _setup(spark, tmp_path, "staleint")
    res = C.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert res["compacted"]
    live = [f for f in os.listdir(path) if not f.startswith(("_", "."))]
    assert len(live) == 1
    # resurrect the completed swap's intent (phase-D crash shape)
    C._write_publish_intent(spark, path, "oldtok", live)
    # a LATER swap crashes right after moving the marker into trash
    fs, dst, jvm = P._fs(spark, path)
    trash = jvm.org.apache.hadoop.fs.Path(dst, "_trash-newtok")
    fs.mkdirs(trash)
    fs.rename(jvm.org.apache.hadoop.fs.Path(dst, "_SUCCESS"),
              jvm.org.apache.hadoop.fs.Path(trash, "_SUCCESS"))
    assert C.recover_compaction(spark, path) == "restored"
    assert _read_keys(spark, path) == old_keys      # live file SURVIVED
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not [f for f in os.listdir(path)
                if f.startswith(("_trash-", "_intent-"))]


def test_two_trash_generations_raise_loudly(spark, tmp_path):
    """Review r13 pass 6 #3: two coexisting trash generations have no
    provably-right automatic merge — recovery stops with a clear
    manual-resolution error instead of interleaving rows from two
    directory states (or dying midway on the second _SUCCESS rename)."""
    path, _ = _setup(spark, tmp_path, "twogen")
    fs, dst, jvm = P._fs(spark, path)
    for tok in ("g1", "g2"):
        t = jvm.org.apache.hadoop.fs.Path(dst, f"_trash-{tok}")
        fs.mkdirs(t)
        fs.create(jvm.org.apache.hadoop.fs.Path(t, f"junk-{tok}"),
                  True).close()
    import os
    os.remove(os.path.join(path, "_SUCCESS"))     # unpublished shape
    with pytest.raises(IOError, match="trash generations"):
        C.recover_compaction(spark, path)
