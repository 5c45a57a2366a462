"""Iceberg v2 metadata writer (IcebergMetadataWriter.java analog):
create / append snapshots / time travel / expiration, with the
manifest chain written as real Avro containers per the table spec."""

import json
import os

from pyspark.sql import functions as F

from gobblin_spark.operators import avro_container as ACF
from gobblin_spark.sinks import iceberg as I
from gobblin_spark.sources import files


def test_create_append_read_roundtrip(spark, sf_dir, tmp_path):
    loc = str(tmp_path / "ice")
    region = files.load_table(spark, sf_dir, "region")
    t = I.IcebergTable.create(spark, loc, region.schema)
    snap1 = t.append_dataframe(region)
    back = t.read()
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, region.collect()))

    # second append: new snapshot sees old + new rows
    more = region.withColumn("r_regionkey", F.col("r_regionkey") + 100)
    snap2 = t.append_dataframe(more)
    assert t.read().count() == 2 * region.count()
    # time travel: snapshot 1 still reads only the first batch
    assert t.read(snapshot_id=snap1).count() == region.count()
    assert [s["snapshot-id"] for s in t.snapshots()] == [snap1, snap2]


def test_metadata_layout_is_spec_shaped(spark, sf_dir, tmp_path):
    loc = str(tmp_path / "ice2")
    nation = files.load_table(spark, sf_dir, "nation")
    t = I.IcebergTable.create(spark, loc, nation.schema)
    t.append_dataframe(nation)

    # version-hint + vN.metadata.json (HadoopTables commit protocol)
    hint = open(os.path.join(loc, "metadata", "version-hint.text")).read()
    md = json.load(open(os.path.join(loc, "metadata",
                                     f"v{int(hint)}.metadata.json")))
    assert md["format-version"] == 2
    assert md["current-snapshot-id"] != -1
    assert md["schemas"][0]["fields"][0]["id"] == 1  # spec field ids
    snap = md["snapshots"][0]
    assert snap["summary"]["operation"] == "append"

    # the manifest chain is real Avro containers with spec field names
    mlist = open(snap["manifest-list"], "rb").read()
    schema_json, manifests = ACF.read_container(mlist)
    assert any(f.get("field-id") == 500
               for f in json.loads(schema_json)["fields"])
    assert manifests[0]["added_files_count"] >= 1
    _, entries = ACF.read_container(
        open(manifests[0]["manifest_path"], "rb").read())
    d = entries[0]["data_file"]
    assert d["file_format"] == "PARQUET" and d["record_count"] > 0
    assert d["file_path"].endswith(".parquet")
    # record counts in the manifest equal the actual table rows
    assert sum(e["data_file"]["record_count"] for e in entries) == \
        nation.count()


def test_expire_snapshots_keeps_current(spark, sf_dir, tmp_path):
    loc = str(tmp_path / "ice3")
    region = files.load_table(spark, sf_dir, "region")
    t = I.IcebergTable.create(spark, loc, region.schema)
    t.append_dataframe(region)
    snap2 = t.append_dataframe(region)
    # horizon far in the future: everything but current expires
    dropped = t.expire_snapshots(older_than_ms=2 ** 62)
    assert dropped == 1
    assert [s["snapshot-id"] for s in t.snapshots()] == [snap2]
    assert t.read().count() == 2 * region.count()  # current data intact
