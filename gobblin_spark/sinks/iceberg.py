"""Iceberg table metadata, written directly from the public Table Spec
(https://iceberg.apache.org/spec/, format-version 2) — the
IcebergMetadataWriter analog runnable without the iceberg runtime jar.

Reference mapping:
- IcebergMetadataWriter (gobblin-iceberg/.../writer/
  IcebergMetadataWriter.java:141,578): buffer data-file appends per
  table, commit them as an APPEND snapshot, expire old snapshots.
- Layout follows HadoopTables: ``<loc>/metadata/vN.metadata.json`` +
  ``version-hint.text`` pointer, manifest list + manifest files as
  Avro object containers (operators/avro_container.py), data files
  under ``<loc>/data/``.

What is implemented: table create (schema + identity partition spec),
append commits (one snapshot per commit, sequence numbers, snapshot
log), manifest list/manifest files with the spec's field names and
field-ids, snapshot expiration, time-travel reads, and a Spark-side
``read()`` that resolves current-snapshot → manifest list → manifests
→ parquet paths. Schema evolution, row-level deletes, and catalog
integration are out of scope — with the iceberg-spark-runtime jar on
the classpath use the real catalog instead (sinks/hive.register_iceberg
documents that path). Metadata here is O(files) driver-side work,
exactly like the reference's writer."""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, types as T

from gobblin_spark.operators import avro_container as ACF

_SPARK_TO_ICEBERG = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "binary",
    T.DateType(): "date",
    T.TimestampType(): "timestamptz",
    T.TimestampNTZType(): "timestamp",
}

# Avro schemas for the manifest list and manifest entries, with the
# spec's field names and field-ids (Appendix: Avro manifest schemas).
_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            ]}},
    ],
}


@dataclass
class DataFileInfo:
    path: str
    size_bytes: int
    record_count: int
    file_format: str = "PARQUET"


def _iceberg_schema(schema: T.StructType) -> tuple[dict, int]:
    fields = []
    next_id = 1
    for f in schema.fields:
        t = _SPARK_TO_ICEBERG.get(f.dataType)
        if t is None:
            if isinstance(f.dataType, T.DecimalType):
                t = f"decimal({f.dataType.precision}, {f.dataType.scale})"
            else:
                raise TypeError(
                    f"no iceberg primitive for {f.dataType.simpleString()} "
                    "(nested types need the real runtime)")
        fields.append({"id": next_id, "name": f.name,
                       "required": not f.nullable, "type": t})
        next_id += 1
    return ({"type": "struct", "schema-id": 0, "fields": fields}, next_id - 1)


class IcebergTable:
    """A HadoopTables-layout Iceberg v2 table on any Hadoop-visible FS."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location.rstrip("/")

    # -- fs helpers ----------------------------------------------------
    def _fs(self, path: str):
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()), p, jvm

    def _write_bytes(self, path: str, data: bytes) -> int:
        fs, p, _ = self._fs(path)
        out = fs.create(p, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        return len(data)

    def _read_bytes(self, path: str) -> bytes:
        fs, p, jvm = self._fs(path)
        stream = fs.open(p)
        try:
            return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()

    # -- metadata pointer ----------------------------------------------
    def _version(self) -> int:
        try:
            return int(self._read_bytes(
                f"{self.location}/metadata/version-hint.text").decode().strip())
        except Exception:
            return 0

    def metadata(self) -> dict:
        v = self._version()
        if v == 0:
            raise FileNotFoundError(f"no iceberg table at {self.location}")
        return json.loads(self._read_bytes(
            f"{self.location}/metadata/v{v}.metadata.json"))

    def _commit_metadata(self, md: dict) -> int:
        v = self._version() + 1
        self._write_bytes(f"{self.location}/metadata/v{v}.metadata.json",
                          json.dumps(md, indent=2).encode())
        # HadoopTables commit protocol: the version hint flips last
        self._write_bytes(f"{self.location}/metadata/version-hint.text",
                          str(v).encode())
        return v

    # -- lifecycle ------------------------------------------------------
    @classmethod
    def create(cls, spark: SparkSession, location: str,
               schema: T.StructType) -> "IcebergTable":
        t = cls(spark, location)
        if t._version():
            raise FileExistsError(f"iceberg table already at {location}")
        ice_schema, last_col = _iceberg_schema(schema)
        now = int(time.time() * 1000)
        md = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": t.location,
            "last-sequence-number": 0,
            "last-updated-ms": now,
            "last-column-id": last_col,
            "current-schema-id": 0,
            "schemas": [ice_schema],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        t._commit_metadata(md)
        return t

    def append_files(self, files: list[DataFileInfo]) -> int:
        """AppendFiles.appendFile + commit (IcebergMetadataWriter.java:578):
        one new snapshot whose manifest lists exactly these files."""
        md = self.metadata()
        seq = md["last-sequence-number"] + 1
        snap_id = int(uuid.uuid4().int % (1 << 62))
        now = int(time.time() * 1000)

        entries = [{
            "status": 1,  # ADDED
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,  # DATA
                "file_path": f.path,
                "file_format": f.file_format,
                "record_count": f.record_count,
                "file_size_in_bytes": f.size_bytes,
            },
        } for f in files]
        manifest_path = (f"{self.location}/metadata/"
                         f"manifest-{uuid.uuid4().hex}.avro")
        mbytes = ACF.write_container_bytes(
            entries, json.dumps(_MANIFEST_ENTRY_SCHEMA))
        mlen = self._write_bytes(manifest_path, mbytes)

        # carry forward prior manifests (append-only table)
        prior = []
        if md["current-snapshot-id"] != -1:
            cur = next(s for s in md["snapshots"]
                       if s["snapshot-id"] == md["current-snapshot-id"])
            _, prior = ACF.read_container(self._read_bytes(cur["manifest-list"]))
        new_entry = {
            "manifest_path": manifest_path, "manifest_length": mlen,
            "partition_spec_id": 0, "content": 0,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(files), "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(f.record_count for f in files),
            "existing_rows_count": 0, "deleted_rows_count": 0,
        }
        mlist_path = (f"{self.location}/metadata/"
                      f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
        self._write_bytes(mlist_path, ACF.write_container_bytes(
            prior + [new_entry], json.dumps(_MANIFEST_LIST_SCHEMA)))

        md["snapshots"].append({
            "snapshot-id": snap_id, "sequence-number": seq,
            "timestamp-ms": now, "manifest-list": mlist_path,
            "schema-id": md["current-schema-id"],
            "summary": {"operation": "append",
                        "added-data-files": str(len(files)),
                        "added-records":
                            str(sum(f.record_count for f in files))},
        })
        md["current-snapshot-id"] = snap_id
        md["last-sequence-number"] = seq
        md["last-updated-ms"] = now
        md["snapshot-log"].append({"timestamp-ms": now, "snapshot-id": snap_id})
        self._commit_metadata(md)
        return snap_id

    def append_dataframe(self, df: DataFrame) -> int:
        """Write *df* as parquet files under ``data/`` and commit them
        as one append snapshot. Per-file record counts come from the
        parquet footers (metadata reads, no data scan)."""
        import pyarrow.parquet as pq

        sub = f"{self.location}/data/{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(sub)
        fs, base, jvm = self._fs(sub)
        files = []
        it = fs.listFiles(base, True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                continue
            local = st.getPath().toUri().getPath()
            rows = pq.ParquetFile(local).metadata.num_rows
            files.append(DataFileInfo(st.getPath().toString(),
                                      st.getLen(), rows))
        return self.append_files(files)

    # -- reads ----------------------------------------------------------
    def snapshots(self) -> list[dict]:
        return self.metadata()["snapshots"]

    def data_files(self, snapshot_id: int | None = None) -> list[DataFileInfo]:
        md = self.metadata()
        sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
        if sid == -1:
            return []
        snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
        _, manifests = ACF.read_container(self._read_bytes(snap["manifest-list"]))
        out = []
        for m in manifests:
            _, entries = ACF.read_container(self._read_bytes(m["manifest_path"]))
            for e in entries:
                if e["status"] in (1, 0):  # ADDED / EXISTING
                    d = e["data_file"]
                    out.append(DataFileInfo(d["file_path"],
                                            d["file_size_in_bytes"],
                                            d["record_count"],
                                            d["file_format"]))
        return out

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Time-travel read: snapshot → manifest list → manifests →
        parquet paths → one multi-path scan (partition pruning and
        pushdown apply as for any parquet read)."""
        files = self.data_files(snapshot_id)
        if not files:
            return self.spark.createDataFrame(
                [], T.StructType([]))  # empty table, empty schema
        return self.spark.read.parquet(*[f.path for f in files])

    def expire_snapshots(self, older_than_ms: int) -> int:
        """ExpireSnapshots.expireOlderThan + commit
        (IcebergMetadataWriter.java:634): drop superseded snapshots
        older than the horizon; the current snapshot always survives."""
        md = self.metadata()
        keep, dropped = [], 0
        for s in md["snapshots"]:
            if (s["snapshot-id"] == md["current-snapshot-id"]
                    or s["timestamp-ms"] >= older_than_ms):
                keep.append(s)
            else:
                dropped += 1
        md["snapshots"] = keep
        kept_ids = {s["snapshot-id"] for s in keep}
        md["snapshot-log"] = [e for e in md["snapshot-log"]
                              if e["snapshot-id"] in kept_ids]
        self._commit_metadata(md)
        return dropped
