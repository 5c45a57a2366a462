"""Retention & compliance-purge operators.

Gobblin's retention framework selects dataset *versions* to delete via
composable policies, and its compliance module purges rows whose id
appears in a (small) compliance-id table. References:

- Newest-K: keep the newest K versions, delete the rest
  (gobblin-data-management/.../retention/policy/NewestKRetentionPolicy.java:39,
  .../policy/NewestKSelectionPolicy.java).
- Time-based: select versions by timestamp predicate
  (.../retention/policy/TimeBasedRetentionPolicy.java:48,
  .../policy/SelectBetweenTimeBasedPolicy.java:51).
- Combine: UNION / INTERSECT of per-policy delete sets
  (.../retention/policy/CombineRetentionPolicy.java:80-82,162-164).
- GDPR purge: ``a LEFT JOIN ids b ON a.cid=b.cid WHERE b.cid IS NULL``
  with a ``/*+MAPJOIN(b)*/`` broadcast hint
  (gobblin-modules/gobblin-compliance/.../purger/HivePurgerQueryTemplate.java:35,83-89).

Scale notes: newest-K is a window over the *version inventory* (small —
one row per dataset version, not per data row), so the sort-per-key is
cheap. The purge id-table is small by construction (ids to forget), so it
is always broadcast: a 100 TB fact table is purged with zero shuffle —
each scan task filters against the broadcast hash set, and partition
pruning on the fact side still applies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def newest_k_deletable(
    versions: DataFrame,
    partition_cols: Sequence[str],
    version_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Rows beyond the newest K versions per partition → the delete set.

    NewestKRetentionPolicy.java:39: retain newest K, delete the rest.
    ``version_cols`` must totally order versions (add a unique id last).
    """
    w = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(c).desc_nulls_last() for c in version_cols]
    )
    return (
        versions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > k)
        .drop("_rn")
    )


def select_before(versions: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """Versions strictly older than ``cutoff`` (SelectBeforeTimeBasedPolicy)."""
    return versions.filter(F.col(ts_col) < F.lit(cutoff))


def select_after(versions: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """Versions at/after ``cutoff`` (SelectAfterTimeBasedPolicy)."""
    return versions.filter(F.col(ts_col) >= F.lit(cutoff))


def select_between(versions: DataFrame, ts_col: str, lo, hi) -> DataFrame:
    """SelectBetweenTimeBasedPolicy.java:51 — [lo, hi) half-open window."""
    return versions.filter((F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) < F.lit(hi)))


def combine_delete_sets(
    sets: Sequence[DataFrame], mode: str = "union"
) -> DataFrame:
    """CombineRetentionPolicy.java:80-82,162-164 — UNION/INTERSECT of delete sets."""
    if not sets:
        raise ValueError("need at least one delete set")
    if mode == "union":
        # audit-r7: one distinct over the whole union — the pairwise
        # union+dropDuplicates fold ran N-1 dedup shuffles for N sets
        out = sets[0]
        for s in sets[1:]:
            out = out.unionByName(s)
        return out.dropDuplicates() if len(sets) > 1 else out
    if mode == "intersect":
        out = sets[0]
        for s in sets[1:]:
            out = out.intersect(s)
        return out
    raise ValueError(f"unknown combine mode: {mode}")


def purge_by_id(
    data: DataFrame,
    ids: DataFrame,
    id_col: str,
    data_id_col: str | None = None,
) -> DataFrame:
    """GDPR purge: keep rows whose id is NOT in ``ids`` — broadcast anti-join.

    HivePurgerQueryTemplate.java:83-89 (LEFT JOIN + IS NULL with MAPJOIN
    hint). Broadcast is forced: the forget-list is small by construction
    and this keeps a full-table purge shuffle-free.
    """
    data_id_col = data_id_col or id_col
    ids_small = F.broadcast(ids.select(F.col(id_col).alias(data_id_col)).dropDuplicates())
    return data.join(ids_small, on=data_id_col, how="left_anti")


def purge_partition_predicate(retained: DataFrame, partition_col: str) -> Column:
    """Helper: restrict a purge rewrite to partitions that actually contain
    affected ids (HivePurgerQueryTemplate writes partition-wise INSERT
    OVERWRITEs). Returns a Column usable for partition pruning.

    Driver-side collect is intentional and bounded: the input is the
    *partition inventory of rows containing forget-ids* (≤ total
    partition count — thousands, not data rows). A literal IN-list is
    what static partition pruning needs; a semi-join would shuffle and
    not prune directories."""
    parts = [r[0] for r in retained.select(partition_col).distinct().collect()]
    return F.col(partition_col).isin(parts)


def list_dataset_versions(spark, base_path: str) -> DataFrame:
    """DatasetVersionFinder (gobblin-data-management/.../retention/
    DatasetVersionFinder.java): the immediate child directories of a
    dataset dir as its versions — (path, name, mtime). Driver-side
    metadata (one listing RPC), O(versions)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(base_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    rows = []
    if fs.exists(hpath):
        for st in fs.listStatus(hpath):
            if st.isDirectory():
                name = st.getPath().getName()
                if not name.startswith("_") and not name.startswith("."):
                    rows.append((st.getPath().toString(), name,
                                 int(st.getModificationTime())))
    # JVM LocalRelation (session.local_rows_df) — python-RDD lift
    # launched workers per action on a driver-built version listing
    from gobblin_spark.session import local_rows_df

    return local_rows_df(
        spark, rows or [], "path string, name string, mtime long")


def apply_retention(spark, deletable: DataFrame, dry_run: bool = True) -> list[str]:
    """Execute a retention selection: delete the version directories the
    policy marked deletable (RetentionPolicy + CleanableDataset's
    clean()). ``dry_run=True`` (default, like the reference's
    simulate mode) only reports. Returns deleted (or would-delete)
    paths. Deletion is driver-side recursive fs.delete per version dir —
    O(versions) metadata ops."""
    paths = [r.path for r in deletable.select("path").collect()]
    if dry_run:
        return paths
    jvm = spark._jvm
    out = []
    for p in paths:
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.delete(hpath, True):
            out.append(p)
    return out
