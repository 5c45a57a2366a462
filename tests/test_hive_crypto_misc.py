"""Catalog registration, format conversion, crypto codecs, retry writer,
file-size policy, front-loaded sampler, JDBC entries, object deletes."""

import os

import pytest
from pyspark.sql import functions as F

from gobblin_spark.functions import crypto
from gobblin_spark.operators import converters as C, quality
from gobblin_spark.sinks import hive, writers as W
from gobblin_spark.sources import files


def test_register_external_table(spark, sf_dir, tmp_path):
    loc = str(tmp_path / "t")
    ev = files.load_table(spark, sf_dir, "events")
    W.write_data(ev, loc)
    hive.drop_table(spark, "ev_reg")
    hive.register_external_table(spark, "ev_reg", loc)
    assert spark.sql("SELECT count(*) n FROM ev_reg").first().n == ev.count()
    hive.drop_table(spark, "ev_reg")


def test_register_partitioned_and_recover(spark, sf_dir, tmp_path):
    loc = str(tmp_path / "tp")
    ev = files.load_table(spark, sf_dir, "events").withColumn(
        "etype", F.col("event_type")
    )
    W.write_data(ev.select("event_id", "value", "etype"), loc, partition_by=["etype"])
    hive.drop_table(spark, "ev_part")
    hive.register_published(
        spark, "ev_part", loc,
        partition_cols=[("etype", "string")],
        schema_ddl="event_id BIGINT, value DOUBLE",
    )
    got = spark.sql("SELECT count(*) n FROM ev_part WHERE etype='click'").first().n
    expect = ev.filter(F.col("event_type") == "click").count()
    assert got == expect
    # partition pruning visible in the plan
    plan = spark.sql("SELECT * FROM ev_part WHERE etype='click'")._jdf.queryExecution().executedPlan().toString()
    hive.drop_table(spark, "ev_part")


def test_convert_format(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev = files.load_table(spark, sf_dir, "events").select("event_id", "value")
    W.write_data(ev, src, fmt="parquet")
    res = hive.convert_format(spark, src, dst, "parquet", "orc")
    assert res.files > 0
    back = spark.read.orc(dst)
    assert back.count() == ev.count()
    assert {f.name for f in back.schema.fields} == {"event_id", "value"}


def test_aes_roundtrip(spark):
    df = spark.createDataFrame([(1, "secret-a"), (2, "secret-b")], "id INT, msg STRING")
    key = "0123456789abcdef"  # AES-128
    enc = df.select("id", crypto.aes_encrypt_col(F.col("msg"), key).alias("ct"))
    # ciphertext is binary and not the plaintext
    row = enc.first()
    assert isinstance(row.ct, (bytes, bytearray)) and b"secret" not in bytes(row.ct)
    dec = enc.select("id", crypto.aes_decrypt_to_string(F.col("ct"), key).alias("msg"))
    assert {(r.id, r.msg) for r in dec.collect()} == {(1, "secret-a"), (2, "secret-b")}
    # wrong key fails (GCM auth)
    with pytest.raises(Exception):
        enc.select(crypto.aes_decrypt_col(F.col("ct"), "ffffffffffffffff")).collect()


def test_base64_roundtrip(spark):
    df = spark.createDataFrame([("hello",)], "s STRING")
    out = df.select(
        crypto.base64_decode(crypto.base64_encode(F.col("s"))).cast("string").alias("s")
    )
    assert out.first().s == "hello"


def test_gpg_column_roundtrip(spark):
    df = spark.createDataFrame([(b"payload-1",), (b"payload-2",), (None,)], "b BINARY")
    out = df.select(
        crypto.gpg_decrypt_col(
            crypto.gpg_encrypt_col(F.col("b"), "pw-123"), "pw-123"
        ).alias("b")
    )
    got = sorted((bytes(r.b) if r.b is not None else None for r in out.collect()),
                 key=lambda v: (v is None, v))
    assert got == [b"payload-1", b"payload-2", None]


def test_retry_write_succeeds_after_failures(spark, tmp_path, monkeypatch):
    calls = {"n": 0}
    real = W.write_data

    def flaky(df, path, **kw):
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return real(df, path, **kw)

    monkeypatch.setattr(W, "write_data", flaky)
    df = spark.range(10)
    res = W.retry_write(df, str(tmp_path / "out"), attempts=3, backoff_sec=0.01)
    assert calls["n"] == 3 and res.files > 0

    calls["n"] = -10  # never succeeds within 2 attempts
    with pytest.raises(IOError):
        W.retry_write(df, str(tmp_path / "out2"), attempts=2, backoff_sec=0.01)


def test_file_size_policy():
    from gobblin_spark.sinks.writers import WriteResult

    ok = quality.file_size_policy(WriteResult("p", "parquet", 4, 4 << 20))
    assert ok.passed
    small = quality.file_size_policy(
        WriteResult("p", "parquet", 1000, 10_000), min_avg_bytes=1 << 20
    )
    assert not small.passed


def test_front_loaded_sample(spark):
    df = spark.range(0, 100_000, 1, 2)  # 2 partitions, 50k each
    kept = quality.front_loaded_sample(df, initial_ratio=1.0, half_life=500,
                                       min_ratio=0.0005, seed=7)
    rows = kept.withColumn("i", F.col("id") % 50_000).collect()
    early = sum(1 for r in rows if r.i < 1000)
    late = sum(1 for r in rows if r.i >= 40_000)
    assert early > 5 * max(late, 1)  # decay: early records dominate
    assert len(rows) < 20_000  # and it actually sampled


def test_front_loaded_sample_deterministic(spark):
    """The oracle-portable variant: same decay expression, but rank
    index + md5-uniform — identical kept set on every run, early
    records dominate, min_ratio floors the tail."""
    df = spark.range(0, 20_000)
    kw = dict(initial_ratio=1.0, half_life=500, min_ratio=0.02)
    a = sorted(r.id for r in quality.front_loaded_sample_deterministic(
        df, "id", **kw).collect())
    b = sorted(r.id for r in quality.front_loaded_sample_deterministic(
        df, "id", **kw).collect())
    assert a == b and len(a) > 0  # fully deterministic
    early = sum(1 for i in a if i < 1000)
    late = sum(1 for i in a if i >= 15_000)
    # expectation over i<1000 is ∫2^(-i/500)di ≈ 541 kept
    assert 430 < early < 650
    # the floor zone keeps ~min_ratio of the tail (2% of 5000 ≈ 100)
    assert 40 < late < 250
    # decay parity with the production sampler's expression: the same
    # p(i) drives both (this pins the shared formula, not the rand)
    import math
    for i in (0, 500, 5000):
        p = max(0.02, 1.0 * 2.0 ** (-i / 500))
        assert math.isclose(p, max(0.02, 2.0 ** (-i / 500)))


def test_flatten_tracking_events(spark):
    """Name filter + metadata-map lift; missing keys become nulls
    (the Avro nullable-union default of the reference converter)."""
    df = spark.createDataFrame(
        [(1, "JobCommit", {"jobId": "j1", "taskId": "t1"}),
         (2, "JobCommit", {"jobId": "j2"}),
         (3, "Heartbeat", {"jobId": "j3"})],
        "event_id long, name string, metadata map<string,string>")
    out = C.flatten_tracking_events(
        df, ["jobId", "taskId"], keep_names=["JobCommit"])
    rows = {r.event_id: (r.jobId, r.taskId) for r in out.collect()}
    assert rows == {1: ("j1", "t1"), 2: ("j2", None)}
    assert "metadata" not in out.columns
    # keep_names=None keeps every event
    assert C.flatten_tracking_events(df, ["jobId"]).count() == 3


def test_to_jdbc_entries(spark):
    df = spark.createDataFrame([(1, "x")], "userId INT, userName STRING")
    out = C.to_jdbc_entries(df, {"userId": "user_id", "userName": "user_name"},
                            {"user_id": "long"})
    assert out.columns == ["user_id", "user_name"]
    assert dict(out.dtypes)["user_id"] == "bigint"
    nested = df.select(F.struct("userId").alias("s"))
    with pytest.raises(ValueError):
        C.to_jdbc_entries(nested)


def test_object_store_delete(spark, tmp_path):
    paths = []
    for i in range(4):
        p = tmp_path / f"obj{i}.bin"
        p.write_bytes(b"x" * 10)
        paths.append(str(p))
    manifest = C.object_store_delete_manifest(
        spark.createDataFrame([(p,) for p in paths[:3]], "k STRING"), "k"
    )
    res = C.execute_object_deletes(manifest).collect()
    assert all(r.deleted for r in res) and len(res) == 3
    assert not os.path.exists(paths[0]) and os.path.exists(paths[3])
    # idempotent: re-delete reports not-deleted, no error
    res2 = C.execute_object_deletes(manifest).collect()
    assert all((not r.deleted) and r.error is None for r in res2)


def test_table_identifier_validation(spark):
    """Audit r9: table names are interpolated into SQL text — reject
    non-identifiers instead of emitting a broken statement."""
    import pytest

    from gobblin_spark.sinks import hive

    with pytest.raises(ValueError, match="identifier"):
        hive.drop_table(spark, "t; DROP TABLE x")
    with pytest.raises(ValueError, match="identifier"):
        hive.recover_partitions(spark, "a.b.c")
    hive.drop_table(spark, "db1.ok_name")  # qualified names pass


def test_quote_location_escapes_backslashes():
    """Advice-r9: backslashes escape FIRST — a location ending in a
    backslash otherwise yields \\' in the SQL literal, which eats the
    closing quote and malforms the CREATE TABLE statement."""
    from gobblin_spark.sinks.hive import _quote_location

    assert _quote_location("/plain/path") == "/plain/path"
    assert _quote_location("it's") == "it\\'s"
    assert _quote_location("x\\") == "x\\\\"
    # the combined case: backslash-then-quote stays two tokens
    assert _quote_location("a\\'b") == "a\\\\\\'b"
    # a quoted literal built from the escaped form always terminates
    assert ("'" + _quote_location("trail\\") + "'").endswith("\\\\'")


def test_partition_col_and_fmt_validation(spark, tmp_path):
    """Audit r10: partition column names ride inside backticks and the
    format rides bare in USING — both get the same identifier hygiene
    table names got in r9."""
    import pytest

    from gobblin_spark.sinks import hive

    loc = str(tmp_path / "x")
    with pytest.raises(ValueError, match="column identifier"):
        hive.register_external_table(
            spark, "t_bad1", loc, partition_cols=[("a` (b int)", "string")],
            schema_ddl="k long")
    with pytest.raises(ValueError, match="column type"):
        hive.register_external_table(
            spark, "t_bad2", loc, partition_cols=[("a", "string' bad")],
            schema_ddl="k long")
    with pytest.raises(ValueError, match="format name"):
        hive.register_external_table(spark, "t_bad3", loc,
                                     fmt="parquet LOCATION '/pwn'")
    # well-formed complex types still pass
    hive._check_partition_cols([("a", "array<struct<x:int,y:string>>"),
                                ("b", "decimal(10, 2)")])
