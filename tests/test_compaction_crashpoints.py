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

from gobblin_spark.operators import compaction as C
from gobblin_spark.sinks import publish as P


class _Boom(RuntimeError):
    pass


class _CrashingFs:
    """Wraps a py4j Hadoop FileSystem: raises _Boom when the mutation
    budget runs out. Reads (exists/listStatus/open/getFileStatus...)
    pass through untouched."""

    MUTATORS = ("rename", "delete", "mkdirs", "create")

    def __init__(self, fs, budget):
        self._fs = fs
        self._budget = budget

    def __getattr__(self, name):
        attr = getattr(self._fs, name)
        if name not in self.MUTATORS:
            return attr

        def guarded(*a, **k):
            if self._budget[0] <= 0:
                raise _Boom(f"injected crash at fs.{name}")
            self._budget[0] -= 1
            return attr(*a, **k)

        return guarded


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
