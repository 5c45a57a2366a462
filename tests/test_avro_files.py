"""Avro object-container files: format-level roundtrip, distributed
read/write, and the full stage→audit→publish path with fmt='avro'
(AvroHdfsDataWriter analog, no spark-avro jar needed)."""

import json
import os

from pyspark.sql import functions as F

from gobblin_spark.operators import avro_container as ACF, avro_serde as AS
from gobblin_spark.sinks import publish as P, writers as W
from gobblin_spark.sources import files


def test_container_format_roundtrip_and_layout():
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": ["null", "long"]},
        {"name": "s", "type": "string"}]}
    recs = [{"a": i if i % 3 else None, "s": f"row{i}"} for i in range(1000)]
    for codec in ("null", "deflate"):
        buf = ACF.write_container_bytes(recs, sch, codec=codec, block_records=128)
        assert buf[:4] == b"Obj\x01"  # spec magic
        schema_json, back = ACF.read_container(buf)
        assert back == recs
        assert json.loads(schema_json) == sch
    assert ACF.read_header_schema(buf)  # header-only schema read
    # deflate actually compresses this repetitive payload
    null_buf = ACF.write_container_bytes(recs, sch, codec="null")
    defl_buf = ACF.write_container_bytes(recs, sch, codec="deflate")
    assert len(defl_buf) < len(null_buf)


def test_write_read_avro_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i) / 3, ["a", "b"][i % 2]) for i in range(400)],
        "id long, s string, d double, part string")
    out = str(tmp_path / "avro")
    summary = AS.write_avro(df, out, partition_by=["part"])
    assert summary.rows == 400 and summary.n_files >= 2
    # hive-style partition layout on disk, container files inside
    assert {d for d in os.listdir(out)} == {"part=a", "part=b"}
    on_disk = [f for d in os.listdir(out)
               for f in os.listdir(os.path.join(out, d))]
    assert on_disk and all(f.endswith(".avro") for f in on_disk)
    assert len(on_disk) == summary.n_files
    back = AS.read_avro(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_write_data_avro_and_publish_protocol(spark, sf_dir, tmp_path):
    """fmt='avro' flows through the unified writer, the write-audit
    stage (read back via the container reader), and the rename publish
    — the whole Gobblin write path producing real .avro files."""
    orders = files.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    final = str(tmp_path / "avro_pub")
    report = P.write_audit_publish(
        orders, final, spark,
        policies=[lambda df: __import__(
            "gobblin_spark.operators.quality", fromlist=["row_count_policy"]
        ).row_count_policy(orders.count(), df.count())],
        fmt="avro")
    assert report.committed
    assert os.path.exists(os.path.join(final, "_SUCCESS"))
    back = W.read_data(spark, final, "avro")
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    # value-exact roundtrip
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, orders.collect()))


def test_pull_job_with_avro_output(spark, sf_dir, tmp_path):
    from gobblin_spark.plans import jobconf as J

    out = str(tmp_path / "avro_job")
    pull = (
        "job.name=AvroOut\nsource.class=table\n"
        f"source.data.directory={sf_dir}\nsource.table.name=region\n"
        "writer.output.format=avro\n"
        f"data.publisher.final.dir={out}\n")
    res = J.run_job(spark, pull)
    assert res.report is not None and res.report.committed
    assert any(f.endswith(".avro") for f in os.listdir(out))
    assert W.read_data(spark, out, "avro").count() == \
        files.load_table(spark, sf_dir, "region").count()
