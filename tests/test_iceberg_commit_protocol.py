"""Pins for the r13 commit-protocol hardening (sinks/iceberg.py):
the version probe past a stale hint (HadoopTableOperations.findVersion
behavior) and the local link(2) metadata claim with no torn-final
window. The exhaustive interleaving evidence lives in
tests/test_iceberg_commit_model.py; these pins drive the REAL code
through the model's counterexample shapes."""

import json
import os

import pytest

from gobblin_spark.sinks.iceberg import IcebergTable


def _mk(spark, tmp_path, name):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    t = IcebergTable.create(spark, str(tmp_path / name), df.schema)
    t.append_dataframe(df)                     # v2
    return t, df


def test_probe_adopts_commit_whose_hint_flip_crashed(spark, tmp_path):
    """A committer crashing between the metadata-file claim and the
    hint flip used to wedge the table permanently: the committed
    snapshot was invisible (readers trusted the hint alone) and every
    later commit from the stale base collided at claim time forever.
    The probe adopts the orphaned-but-complete version, so readers see
    the snapshot and the next commit lands above it, repairing the
    hint."""
    t, df = _mk(spark, tmp_path, "unflipped")
    t.append_dataframe(df)                     # v3 — the "crashed" commit
    assert t._version() == 3
    # simulate the crash: regress the hint to the pre-commit value
    t._write_bytes(f"{t.location}/metadata/version-hint.text", b"2")
    t2 = IcebergTable(spark, t.location)
    assert t2._version() == 3                  # probe fast-forwards
    assert t2.read().count() == 4              # the orphaned commit's rows
    t2.append_dataframe(df)                    # no wedge: lands at v4
    hint = open(os.path.join(t.location.replace("file:", ""),
                             "metadata", "version-hint.text")).read()
    assert hint.strip() == "4"                 # hint repaired
    assert t2.read().count() == 6


def test_probe_ignores_torn_next_version_file(spark, tmp_path):
    """An unparseable v(N+1) — a crashed O_EXCL-fallback claim's torn
    prefix, or foreign junk — must NOT be adopted as the current
    table state: readers stay on the last good version. Parseable
    json that is not table metadata is refused the same way."""
    t, df = _mk(spark, tmp_path, "tornnext")
    v = t._version()
    mdir = os.path.join(t.location.replace("file:", ""), "metadata")
    with open(os.path.join(mdir, f"v{v + 1}.metadata.json"), "wb") as fh:
        fh.write(b'{"format-ver')       # torn mid-write
    t2 = IcebergTable(spark, t.location)
    assert t2._version() == v
    assert t2.read().count() == 2
    os.remove(os.path.join(mdir, f"v{v + 1}.metadata.json"))
    with open(os.path.join(mdir, f"v{v + 1}.metadata.json"), "wb") as fh:
        fh.write(b'[1, 2]')             # parseable, not metadata
    assert IcebergTable(spark, t.location)._version() == v


def test_commit_names_the_torn_wedge_instead_of_retrying(spark,
                                                         tmp_path):
    """A torn collider never heals, so burning the CAS retries on
    'concurrent commit' misdiagnoses the state: the claim raises a
    distinct diagnosis naming the junk file and the unwedge action,
    and _commit_files does not retry it (the message lacks the
    retryable marker)."""
    t, df = _mk(spark, tmp_path, "wedge")
    v = t._version()
    mdir = os.path.join(t.location.replace("file:", ""), "metadata")
    with open(os.path.join(mdir, f"v{v + 1}.metadata.json"), "wb") as fh:
        fh.write(b'{"format-ver')
    with pytest.raises(RuntimeError, match="delete it to unwedge"):
        t.append_dataframe(df)
    # the diagnosis deliberately omits the retryable marker
    try:
        t.append_dataframe(df)
    except RuntimeError as ex:
        assert "concurrent commit" not in str(ex)
    # operator deletes the junk: the very next commit succeeds
    os.remove(os.path.join(mdir, f"v{v + 1}.metadata.json"))
    t.append_dataframe(df)
    assert t.read().count() == 4


def test_local_claim_leaves_no_tmp_residue(spark, tmp_path):
    """The link(2) claim fully cleans its temp sibling on success AND
    on a lost race, and a lost race never disturbs the winner's
    payload."""
    t, df = _mk(spark, tmp_path, "tmpclean")
    md = t.metadata()                          # stale base for the loser
    t.append_dataframe(df)                     # winner takes v3
    winner = t.read().count()
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t._commit_metadata(md)                 # loser collides at v3
    mdir = os.path.join(t.location.replace("file:", ""), "metadata")
    assert not [f for f in os.listdir(mdir) if f.endswith(".tmp")]
    assert IcebergTable(spark, t.location).read().count() == winner
    # and the winner's v3 payload is genuine metadata, not the loser's
    with open(os.path.join(mdir, "v3.metadata.json"), "rb") as fh:
        assert "format-version" in json.loads(fh.read())


def test_create_refuses_location_with_orphaned_first_commit(spark,
                                                            tmp_path):
    """A missing hint does not prove an empty location: a committer
    can crash before the very first hint flip. create() must probe
    from zero and refuse to clobber the orphaned v1."""
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, str(tmp_path / "orph1"), df.schema)
    hint = os.path.join(t.location.replace("file:", ""), "metadata",
                        "version-hint.text")
    os.remove(hint)
    crc = os.path.join(os.path.dirname(hint), ".version-hint.text.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(FileExistsError, match="already at"):
        IcebergTable.create(spark, t.location, df.schema)
    # and a reader adopts the orphaned commit instead of seeing none
    assert IcebergTable(spark, t.location)._version() == 1
