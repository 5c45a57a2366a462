"""Atomic publish protocol: staging write → audit → rename to final →
``_SUCCESS`` marker, with Gobblin's job-commit policies.

Reference mapping (all relative to /root/reference/):
- DataPublisher iface (gobblin-api/.../publisher/DataPublisher.java:36,75).
- BaseDataPublisher (gobblin-core/.../publisher/BaseDataPublisher.java:100):
  move task-output → final dir with parent creation and subpath
  preservation; here ``publish_staged`` renames every child of the
  staging dir into the final dir — O(children) metadata ops, zero data
  movement on HDFS-like filesystems.
- TimePartitionedDataPublisher (gobblin-core/.../publisher/
  TimePartitionedDataPublisher.java:39): subpaths (partition dirs) are
  preserved by the recursive merge-rename.
- JobCommitPolicy (gobblin-core-base/.../extractor/JobCommitPolicy.java:35):
  COMMIT_ON_FULL_SUCCESS / COMMIT_ON_PARTIAL_SUCCESS /
  COMMIT_SUCCESSFUL_TASKS over a set of staged datasets.
- SafeDatasetCommit (gobblin-runtime/.../SafeDatasetCommit.java:67):
  per-dataset isolation — one dataset's audit failure never blocks
  another's publish (except under FULL_SUCCESS).
- Write-audit-publish: task-level policies (operators/quality.py) run
  against the STAGED output before any rename — bad data never becomes
  visible (TaskLevelPolicy.java:24 FAIL semantics).

Scale notes: the data is written exactly once (to staging, fully
parallel); publish is driver-side metadata work proportional to the
number of partition directories, not bytes. On object stores without
atomic rename, point staging and final at the same bucket and rely on
the store's server-side rename/copy; the protocol is unchanged.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from enum import Enum
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from gobblin_spark.operators.quality import TaskPolicyResult, evaluate_task_policies
from gobblin_spark.sinks.writers import WriteResult, write_data

SUCCESS_MARKER = "_SUCCESS"


class JobCommitPolicy(Enum):
    """JobCommitPolicy.java:35 — what to publish when some datasets fail."""

    COMMIT_ON_FULL_SUCCESS = "full"
    COMMIT_ON_PARTIAL_SUCCESS = "partial"
    COMMIT_SUCCESSFUL_TASKS = "successful"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _merge_rename(fs, jvm, src, dst) -> int:
    """Recursively move children of *src* under *dst* (BaseDataPublisher's
    addWritableDirToDatasetFiles behavior): existing final partition dirs
    are merged, files are moved by rename. Returns FILES moved (a
    whole-directory rename counts its file contents via one
    getContentSummary RPC, not 1)."""
    if not fs.exists(dst):
        fs.mkdirs(dst.getParent()) if dst.getParent() is not None else None
        if fs.rename(src, dst):
            if fs.getFileStatus(dst).isFile():
                return 1
            return int(fs.getContentSummary(dst).getFileCount())
        raise IOError(f"rename failed: {src} -> {dst}")
    if fs.getFileStatus(src).isFile():
        # collision on a file: replace (staging is the new truth)
        fs.delete(dst, False)
        if not fs.rename(src, dst):
            raise IOError(f"rename failed: {src} -> {dst}")
        return 1
    moved = 0
    for st in fs.listStatus(src):
        child = st.getPath()
        moved += _merge_rename(fs, jvm, child, jvm.org.apache.hadoop.fs.Path(dst, child.getName()))
    return moved


@dataclass
class StagedDataset:
    """One dataset's staged write awaiting publish (SafeDatasetCommit's
    unit of isolation)."""

    name: str
    staging_dir: str
    final_dir: str
    write: WriteResult | None = None
    audits: list[TaskPolicyResult] = field(default_factory=list)
    # reader options needed to re-read the staged output faithfully
    # (e.g. csv header=true) — audit() applies them so what is audited
    # is byte-for-byte what publishes
    options: dict | None = None

    @property
    def audit_ok(self) -> bool:
        return evaluate_task_policies(self.audits)


@dataclass
class PublishReport:
    published: list[str] = field(default_factory=list)
    aborted: list[str] = field(default_factory=list)
    # datasets whose publish/abort RAISED (SafeDatasetCommit isolation:
    # the failure is contained, the other datasets still commit), with
    # the error text
    failed: dict = field(default_factory=dict)
    committed: bool = False


def read_json_file(fs, jvm, path) -> dict:
    """Small-JSON read through a Hadoop FS handle (one shared copy of
    the open/IOUtils/close idiom — review r13 pass 6). *path* may be
    a Path object or string. Raises ValueError on a torn/unparseable
    payload; IO errors propagate."""
    import json as _json

    if isinstance(path, str):
        path = jvm.org.apache.hadoop.fs.Path(path)
    stream = fs.open(path)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return _json.loads(bytes(raw).decode("utf-8"))


def staging_dir_for(final_dir: str, job_id: str | None = None) -> str:
    """A unique SIBLING staging dir (FsDataWriter's task-staging idea
    at job scope); sibling so rename stays same-filesystem, and
    OUTSIDE final_dir so (a) staging a red dataset never creates the
    final dir as a side effect and (b) non-Spark listings of final
    can't count leftover staged part-files as committed output.

    Degenerate bases have no usable sibling and fall back to staging
    INSIDE final_dir (the underscore prefix keeps it invisible to
    Spark/Hadoop listings): a scheme-only base (``s3://bucket`` — a
    "sibling" would be a different bucket) or the filesystem root.
    A root-level final dir (``/data``) keeps the root separator so
    staging never lands CWD-relative on the wrong filesystem."""
    token = job_id or uuid.uuid4().hex[:12]
    trimmed = final_dir.rstrip("/")
    base, _, leaf = trimmed.rpartition("/")
    name = f"_staging-{leaf}-{token}"
    if base.endswith(":/") or not leaf:
        # scheme-only base (s3://bucket, hdfs://nn) or bare root
        return f"{trimmed}/{name}" if trimmed else f"/{name}"
    if not base:
        # '/data' → sibling at the root; 'data' → sibling in CWD
        return f"/{name}" if final_dir.startswith("/") else name
    return f"{base}/{name}"


def stage(
    df: DataFrame,
    final_dir: str,
    name: str | None = None,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    job_id: str | None = None,
    options: dict[str, str] | None = None,
    cluster: bool = False,
) -> StagedDataset:
    """Write *df* to a fresh staging dir next to *final_dir*.

    ``cluster=True`` REBALANCES on the partition columns first, so
    each task writes whole partitions instead of every task opening a
    writer (plus a sort) for every partition value it happens to see —
    ~3x faster here and the difference between thousands and millions
    of output files at cluster scale. The rebalance hint (not plain
    repartition) is what lets AQE split oversized partition values:
    OptimizeSkewInRebalancePartitions only applies to
    REBALANCE_PARTITIONS_BY_COL shuffles, so a hot date no longer
    serializes 90%% of the write into one task."""
    if cluster and partition_by:
        df = df.hint("rebalance", *partition_by)
    sdir = staging_dir_for(final_dir, job_id)
    try:
        res = write_data(df, sdir, fmt=fmt, mode="overwrite",
                         partition_by=partition_by, options=options)
    except BaseException:
        # a failed staging write leaves nothing worth keeping — drop
        # the partial staging dir so retried jobs don't accumulate
        # orphaned trees (advice-r13; final_dir is never touched)
        try:
            fs, src, _ = _fs(df.sparkSession, sdir)
            if fs.exists(src):
                fs.delete(src, True)
        except Exception:
            pass
        raise
    return StagedDataset(name or final_dir, sdir, final_dir, write=res,
                         options=dict(options) if options else None)


def audit(
    staged: StagedDataset,
    spark: SparkSession,
    policies: Sequence[Callable[[DataFrame], TaskPolicyResult]],
) -> StagedDataset:
    """Run task-level policies against the STAGED output (write-audit-
    publish): each policy sees the re-read staged DataFrame, so what is
    audited is exactly what would become visible."""
    fmt = staged.write.fmt if staged.write else "parquet"
    from gobblin_spark.sinks.writers import read_data

    staged_df = read_data(spark, staged.staging_dir, fmt,
                          options=staged.options)
    staged.audits.extend(p(staged_df) for p in policies)
    return staged


def publish_staged(staged: StagedDataset, spark: SparkSession) -> int:
    """Rename staging children into final + write ``_SUCCESS``
    (BaseDataPublisher.java:100 + publishMetadata). Returns files moved."""
    fs, src, jvm = _fs(spark, staged.staging_dir)
    _, dst, _ = _fs(spark, staged.final_dir)
    marker = jvm.org.apache.hadoop.fs.Path(dst, SUCCESS_MARKER)
    if not fs.exists(src):
        # crash-replay idempotency: a prior attempt may have moved
        # everything and deleted staging — but a NEVER-staged (typo'd
        # or already-aborted) path must not mint a _SUCCESS over an
        # empty dir
        has_marker = fs.exists(marker)
        has_content = fs.exists(dst) and any(
            st.getPath().getName() != SUCCESS_MARKER
            for st in fs.listStatus(dst))
        if not (has_marker or has_content):
            raise IOError(
                f"staging dir missing and final dir empty — nothing "
                f"to publish for {staged.name} ({staged.staging_dir})")
        fs.create(marker, True).close()
        return 0
    fs.mkdirs(dst)
    moved = 0
    for st in fs.listStatus(src):
        child = st.getPath()
        name = child.getName()
        if name == SUCCESS_MARKER:
            continue
        moved += _merge_rename(fs, jvm, child,
                               jvm.org.apache.hadoop.fs.Path(dst, name))
    # marker BEFORE the staging delete: a crash between the two leaves
    # a published final + empty staging, which replay handles
    # idempotently — the old order left a window where everything was
    # moved but nothing said so (CommitSequence replay then errored)
    fs.create(marker, True).close()
    fs.delete(src, True)
    return moved


def abort_staged(staged: StagedDataset, spark: SparkSession) -> None:
    """Delete the staging dir; final is untouched (cleanLeftoverStagingData,
    gobblin-runtime/.../AbstractJobLauncher.java:530)."""
    fs, src, _ = _fs(spark, staged.staging_dir)
    if fs.exists(src):
        fs.delete(src, True)


def commit(
    datasets: Sequence[StagedDataset],
    spark: SparkSession,
    policy: JobCommitPolicy = JobCommitPolicy.COMMIT_ON_FULL_SUCCESS,
) -> PublishReport:
    """Job-level commit over independently staged datasets
    (JobCommitPolicy.java:35 × SafeDatasetCommit.java:67):

    - FULL_SUCCESS: all audits green → publish all; any red → abort all.
    - PARTIAL_SUCCESS: publish everything, audits notwithstanding.
    - SUCCESSFUL_TASKS: publish green datasets, abort red ones.
    """
    report = PublishReport()
    oks = [d.audit_ok for d in datasets]
    if policy is JobCommitPolicy.COMMIT_ON_FULL_SUCCESS and not all(oks):
        for d in datasets:
            try:
                abort_staged(d, spark)
                report.aborted.append(d.name)
            except Exception as ex:  # noqa: BLE001 - isolation boundary
                report.failed[d.name] = str(ex)
        return report
    # SafeDatasetCommit.java:67 isolation: one dataset's publish
    # failure must never strand the others un-committed — each
    # dataset's outcome is its own
    for d, ok in zip(datasets, oks):
        try:
            if ok or policy is JobCommitPolicy.COMMIT_ON_PARTIAL_SUCCESS:
                publish_staged(d, spark)
                report.published.append(d.name)
            else:
                abort_staged(d, spark)
                report.aborted.append(d.name)
        except Exception as ex:  # noqa: BLE001 - isolation boundary
            report.failed[d.name] = str(ex)
    report.committed = bool(report.published)
    return report


def write_audit_publish(
    df: DataFrame,
    final_dir: str,
    spark: SparkSession,
    policies: Sequence[Callable[[DataFrame], TaskPolicyResult]] = (),
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    policy: JobCommitPolicy = JobCommitPolicy.COMMIT_ON_FULL_SUCCESS,
    options: dict[str, str] | None = None,
) -> PublishReport:
    """The whole protocol for one dataset in one call: stage → audit →
    commit. The canonical Gobblin write path."""
    staged = stage(df, final_dir, fmt=fmt, partition_by=partition_by,
                   options=options)
    audit(staged, spark, policies)
    return commit([staged], spark, policy)


def is_published(spark: SparkSession, final_dir: str) -> bool:
    """True iff *final_dir* carries the ``_SUCCESS`` marker."""
    fs, base, jvm = _fs(spark, final_dir)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(base, SUCCESS_MARKER))


def jdbc_staging_swap(
    df: DataFrame,
    url: str,
    final_table: str,
    options: dict[str, str] | None = None,
    dialect: str | None = None,
) -> str:
    """JdbcPublisher.java:52 — write to a staging table, then swap into
    the final name in one transaction. Spark cannot run the swap DDL
    itself; this stages the data and returns the SQL the caller executes
    on the database (documented two-step, exactly the reference's
    publish-by-rename applied to tables).

    The swap DDL is DIALECT-SPECIFIC: ``ALTER TABLE IF EXISTS ...
    RENAME TO`` is PostgreSQL syntax and a hard error on the MySQL
    family, which instead gets an atomic multi-table ``RENAME TABLE``
    (guarded by ``CREATE TABLE IF NOT EXISTS ... LIKE`` so the first
    publish — no final table yet — still succeeds). *dialect* is
    inferred from the JDBC url when not given; unknown urls default to
    the PostgreSQL/ANSI form."""
    staging_table = f"{final_table}_staging_{uuid.uuid4().hex[:8]}"
    from gobblin_spark.sinks.writers import write_jdbc

    write_jdbc(df, url, staging_table, mode="overwrite", options=options)
    if dialect is None:
        low = url.lower()
        dialect = ("mysql" if ("jdbc:mysql:" in low or "jdbc:mariadb:"
                               in low) else "postgresql")
    # rename-aside, NEVER drop-before-replace: on engines with
    # auto-committing DDL (MySQL family) a DROP that commits before a
    # failed RENAME would lose the final table permanently; this order
    # keeps the old data reachable (as <final>_old_<token>) until the
    # new table is in place, and the trailing DROP is the only
    # destructive step
    old_table = f"{final_table}_old_{uuid.uuid4().hex[:8]}"
    if dialect == "mysql":
        # MySQL DDL auto-commits (no BEGIN), has no IF EXISTS on
        # RENAME, but RENAME TABLE swaps multiple tables atomically
        return (
            f"CREATE TABLE IF NOT EXISTS {final_table} "
            f"LIKE {staging_table}; "
            f"RENAME TABLE {final_table} TO {old_table}, "
            f"{staging_table} TO {final_table}; "
            f"DROP TABLE IF EXISTS {old_table};"
        )
    return (
        f"BEGIN; "
        f"ALTER TABLE IF EXISTS {final_table} RENAME TO {old_table}; "
        f"ALTER TABLE {staging_table} RENAME TO {final_table}; "
        f"DROP TABLE IF EXISTS {old_table}; COMMIT;"
    )


def write_publish_metadata(staged: StagedDataset, spark: SparkSession,
                           extra: dict | None = None) -> str:
    """MetadataWriterWrapper / BaseDataPublisher.publishMetadata — a
    ``_metadata.json`` sidecar in the final dir recording what was
    published (files, bytes, format, partitions, audit results). Driver-
    side metadata only; written AFTER the rename so its presence implies
    a complete publish."""
    import json as _json

    fs, dst, jvm = _fs(spark, staged.final_dir)
    payload = {
        "name": staged.name,
        "format": staged.write.fmt if staged.write else None,
        "files": staged.write.files if staged.write else None,
        "bytes": staged.write.bytes_written if staged.write else None,
        "partitions": staged.write.partitions if staged.write else [],
        "audits": [
            {"name": a.name, "passed": a.passed, "detail": a.detail}
            for a in staged.audits
        ],
    }
    payload.update(extra or {})
    path = jvm.org.apache.hadoop.fs.Path(dst, "_metadata.json")
    out = fs.create(path, True)
    try:
        out.write(bytearray(_json.dumps(payload, default=str).encode()))
    finally:
        out.close()
    return path.toString()
