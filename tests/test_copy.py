"""Distributed copy executor (CopySource.java:111): byte-identical tree
copy, incremental skip, atomic publish, failure abort."""

import os

import pytest

from gobblin_spark.sources import copy as C


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    (src / "a").mkdir(parents=True)
    (src / "b" / "c").mkdir(parents=True)
    (src / "root.txt").write_bytes(b"root-file")
    (src / "a" / "one.bin").write_bytes(os.urandom(70_000))
    (src / "a" / "two.txt").write_bytes(b"hello world")
    (src / "b" / "c" / "deep.bin").write_bytes(os.urandom(9_000))
    return str(src)


def _tree_bytes(root):
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.startswith("_") or n.startswith("."):
                continue
            p = os.path.join(dirpath, n)
            out[os.path.relpath(p, root)] = open(p, "rb").read()
    return out


def test_list_tree_distributed(spark, tree):
    got = {os.path.relpath(r.path, tree): r.size for r in C.list_tree(spark, tree).collect()}
    assert set(got) == {"root.txt", "a/one.bin", "a/two.txt", "b/c/deep.bin"}
    assert got["a/two.txt"] == 11


def test_distcp_byte_identical(spark, tree, tmp_path):
    dst = str(tmp_path / "dst")
    summary, ok = C.distcp(spark, tree, dst)
    assert ok and summary.n_failed == 0 and summary.n_files == 4
    assert summary.n_ok == 4 and summary.errors == []
    assert summary.bytes_copied == sum(
        len(v) for v in _tree_bytes(tree).values())
    assert _tree_bytes(tree) == _tree_bytes(dst)
    assert os.path.exists(os.path.join(dst, "_SUCCESS"))


def test_incremental_skip_unchanged(spark, tree, tmp_path):
    dst = str(tmp_path / "dst")
    C.distcp(spark, tree, dst)
    # second run: nothing changed -> empty manifest
    again = C.plan_copy(spark, tree, dst)
    assert again.count() == 0
    # touch one file with different size -> only it re-copies
    with open(os.path.join(tree, "a", "two.txt"), "ab") as f:
        f.write(b"!!")
    plan = C.plan_copy(spark, tree, dst)
    assert [os.path.basename(r.src) for r in plan.collect()] == ["two.txt"]
    results, ok = C.distcp(spark, tree, dst)
    assert ok
    assert _tree_bytes(tree) == _tree_bytes(dst)


def test_uri_scheme_threads_through_listing_and_copy(spark, tree, tmp_path):
    """URI roots (file://) must keep their scheme on every manifest path
    so worker closures resolve the SAME filesystem — a scheme-less path
    re-inferred in a task silently falls back to LocalFileSystem for
    remote stores (S3/HDFS)."""
    src_uri = "file://" + tree
    listed = C.list_tree(spark, src_uri).collect()
    assert listed and all(r.path.startswith("file:///") for r in listed)

    dst = str(tmp_path / "dst_uri")
    manifest = C.plan_copy(spark, src_uri, dst, skip_unchanged=False)
    rows = manifest.collect()
    assert all(r.src.startswith("file:///") for r in rows)
    # relative layout preserved despite the scheme prefix
    assert {r.dst[len(dst) + 1:] for r in rows} == {
        "root.txt", "a/one.bin", "a/two.txt", "b/c/deep.bin"}
    results, ok = C.distcp(spark, src_uri, dst)
    assert ok and _tree_bytes(tree) == _tree_bytes(dst)


def test_scheme_prefix_helper():
    assert C._scheme_prefix("s3://bucket/key/x", "bucket/key/x") == "s3://"
    assert C._scheme_prefix("hdfs://nn:9000/data", "/data") == "hdfs://nn:9000"
    assert C._scheme_prefix("file:///tmp/x", "/tmp/x") == "file://"
    assert C._scheme_prefix("s3://bucket/x/", "bucket/x") == "s3://"
    assert C._scheme_prefix("/plain/local", "/plain/local") == ""


def test_copy_failure_isolated_and_atomic_abort(spark, tree, tmp_path):
    """A missing source file fails its row; atomic mode aborts the whole
    publish so the destination never half-appears."""
    dst = str(tmp_path / "dst")
    manifest = C.plan_copy(spark, tree, dst, skip_unchanged=False)
    # sabotage one row to a nonexistent source
    from pyspark.sql import functions as F

    bad = manifest.withColumn(
        "src",
        F.when(F.col("src").endswith("two.txt"), F.lit(tree + "/GONE.txt"))
        .otherwise(F.col("src")),
    )
    results = C.execute_copy(bad).collect()
    assert sum(1 for r in results if not r.ok) == 1
    assert sum(1 for r in results if r.ok) == 3

    with pytest.raises(FileNotFoundError):  # missing src root fails fast
        C.distcp(spark, tree + "/NOPE", dst)
    assert not os.path.exists(os.path.join(dst, "_SUCCESS"))


# -- round-6 review fixes ---------------------------------------------


def test_empty_atomic_distcp_is_noop(spark, tmp_path):
    """Review-r6: an atomic distcp of an EMPTY tree must return a
    zero summary, not crash in publish_staged."""
    src = tmp_path / "empty_src"
    src.mkdir()
    summary, ok = C.distcp(spark, str(src), str(tmp_path / "dst"),
                           atomic=True)
    assert ok and summary.n_files == 0 and summary.n_failed == 0


def test_same_size_newer_mtime_recopies(spark, tmp_path):
    """Review-r6: the incremental skip uses mtime as well as size — a
    same-size in-place edit must re-copy (the old size-only predicate
    served stale bytes forever)."""
    import os
    import time

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("AAAA")
    dst = str(tmp_path / "dst")
    summary, ok = C.distcp(spark, str(src), dst, atomic=False)
    assert ok and summary.n_ok == 1
    # second run: nothing changed -> nothing planned
    assert C.plan_copy(spark, str(src), dst).count() == 0
    # same-size edit with a NEWER mtime -> planned again
    time.sleep(0.01)
    (src / "a.txt").write_text("BBBB")
    os.utime(src / "a.txt",
             (time.time() + 5, time.time() + 5))
    assert C.plan_copy(spark, str(src), dst).count() == 1
    summary2, ok2 = C.distcp(spark, str(src), dst, atomic=False)
    assert ok2 and (tmp_path / "dst" / "a.txt").read_text() == "BBBB"


def test_plan_copy_no_forced_broadcast(spark, tmp_path):
    """Review-r6: the destination listing must not be FORCE-broadcast
    (a 100M-file destination would OOM the driver); the optimizer
    decides."""
    src = tmp_path / "s"
    src.mkdir()
    (src / "f").write_text("x")
    dst = tmp_path / "d"
    dst.mkdir()
    (dst / "f").write_text("x")
    plan = C.plan_copy(spark, str(src), str(dst))
    opt = plan._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in opt  # no user-forced broadcast hint
