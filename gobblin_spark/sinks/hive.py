"""Catalog registration: publish a dataset's directory as a queryable
table, recover partitions, and convert storage formats.

Reference mapping (all relative to /root/reference/):
- HiveRegister / HiveRegistrationPolicy (gobblin-hive-registration/.../
  HiveRegister.java:62): after publish, register the final dir as an
  external Hive table (create-if-absent, add partitions). Spark's
  catalog IS the metastore client here: ``CREATE TABLE ... USING <fmt>
  LOCATION ...`` + ``recoverPartitions`` replace the HiveMetastoreClient
  plumbing.
- HiveSerDeConverter (gobblin-core/.../converter/serde/
  HiveSerDeConverter.java): storage-format conversion (Avro→ORC etc.)
  was a record-level SerDe round-trip in an MR job; here it is a
  vectorized read→write through the datasource formats.
- Avro→ORC materializer (gobblin-data-management conversion jobs):
  ``convert_format`` is that job in one call.
- IcebergMetadataWriter (gobblin-iceberg/.../IcebergMetadataWriter.java):
  needs the Iceberg runtime jar (catalog ``spark_catalog`` extension);
  gated — the registration API shape is identical.

Scale notes: registration is metadata-only (no data read). Partition
recovery lists directories, not files' contents; format conversion is
scan→write, embarrassingly parallel, with the target's partitioning
preserved or re-specified.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from gobblin_spark.sinks.writers import WriteResult, write_data

# same trust-boundary hygiene as sources/jdbc's _IDENT_RE: these names
# are interpolated into SQL text, so reject anything that isn't a
# plain (optionally db-qualified) identifier instead of letting a
# stray quote produce a broken/surprising statement (audit r9)
_TABLE_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def _check_table(table: str) -> str:
    if not _TABLE_RE.match(table):
        raise ValueError(f"not a valid table identifier: {table!r}")
    return table


def _quote_location(location: str) -> str:
    # backslashes first: escaping only quotes turns a trailing '\'
    # into \' in the SQL literal, which eats the closing quote and
    # malforms the CREATE TABLE statement (advice-r9)
    return location.replace("\\", "\\\\").replace("'", "\\'")


# partition column names ride inside backticks and format names ride
# bare in the USING clause — same trust boundary as _TABLE_RE (a
# backtick in a column name would break out of its quoting; audit r10)
_COL_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_TYPE_RE = re.compile(r"^[A-Za-z0-9_<>,:() ]+$")
_FMT_RE = re.compile(r"^[A-Za-z0-9_.]+$")


def _check_partition_cols(cols) -> None:
    for n, t in cols:
        if not _COL_RE.match(n):
            raise ValueError(f"not a valid column identifier: {n!r}")
        if not _TYPE_RE.match(t):
            raise ValueError(f"not a valid column type: {t!r}")


def _check_fmt(fmt: str) -> str:
    if not _FMT_RE.match(fmt):
        raise ValueError(f"not a valid format name: {fmt!r}")
    return fmt


def register_external_table(
    spark: SparkSession,
    table: str,
    location: str,
    fmt: str = "parquet",
    partition_cols: Sequence[tuple[str, str]] | None = None,
    schema_ddl: str | None = None,
    if_not_exists: bool = True,
) -> None:
    """HiveRegister.java:62 — register *location* as an external table.

    ``partition_cols`` is [(name, type), ...] for partitioned layouts
    (the ``c=v`` directory style written by ``partitionBy``); follow
    with ``recover_partitions`` to load them. Without ``schema_ddl`` the
    non-partitioned schema is inferred from the files."""
    _check_table(table)
    _check_fmt(fmt)
    location = _quote_location(location)
    exists = "IF NOT EXISTS " if if_not_exists else ""
    if partition_cols:
        if not schema_ddl:
            raise ValueError("partitioned registration needs schema_ddl for data columns")
        _check_partition_cols(partition_cols)
        pspec = ", ".join(f"`{n}` {t}" for n, t in partition_cols)
        spark.sql(
            f"CREATE TABLE {exists}{table} ({schema_ddl}) USING {fmt} "
            f"PARTITIONED BY ({pspec}) LOCATION '{location}'"
        )
    elif schema_ddl:
        spark.sql(
            f"CREATE TABLE {exists}{table} ({schema_ddl}) USING {fmt} LOCATION '{location}'"
        )
    else:
        spark.sql(f"CREATE TABLE {exists}{table} USING {fmt} LOCATION '{location}'")


def recover_partitions(spark: SparkSession, table: str) -> None:
    """MSCK REPAIR — discover on-disk ``c=v`` dirs into the catalog
    (HiveRegister's per-partition add, one metadata sweep)."""
    spark.sql(f"MSCK REPAIR TABLE {_check_table(table)}")


def register_published(
    spark: SparkSession,
    table: str,
    final_dir: str,
    fmt: str = "parquet",
    partition_cols: Sequence[tuple[str, str]] | None = None,
    schema_ddl: str | None = None,
) -> None:
    """Post-publish registration: external table + partition recovery —
    the publish→register step BaseDataPublisher triggers via
    HiveRegistrationPolicy."""
    register_external_table(
        spark, table, final_dir, fmt=fmt,
        partition_cols=partition_cols, schema_ddl=schema_ddl,
    )
    if partition_cols:
        recover_partitions(spark, table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {_check_table(table)}")


def convert_format(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    src_fmt: str,
    dst_fmt: str,
    partition_by: Sequence[str] | None = None,
    options: dict[str, str] | None = None,
) -> WriteResult:
    """HiveSerDeConverter as a job: read *src_fmt*, write *dst_fmt*
    (e.g. Avro→ORC materialization). One distributed scan→write; no
    per-record SerDe objects anywhere."""
    df: DataFrame = spark.read.format(src_fmt).load(src_path)
    return write_data(df, dst_path, fmt=dst_fmt, partition_by=partition_by,
                      options=options)


def register_iceberg(spark, location, df_schema):
    """IcebergMetadataWriter — catalog-integrated registration needs the
    iceberg-spark-runtime jar (spark.sql.catalog.* config). Without it,
    ``sinks.iceberg.IcebergTable`` writes the v2 metadata + Avro
    manifest chain directly per the public table spec (HadoopTables
    layout); this creates such a table and returns it."""
    from gobblin_spark.sinks.iceberg import IcebergTable

    return IcebergTable.create(spark, location, df_schema)
