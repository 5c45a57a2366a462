"""Schema module: Avro JSON ↔ StructType, recursion elimination,
compatibility (JsonElementConversionFactory.java:66-118 matrix,
AvroRecursionEliminatingConverter.java:42)."""

import json

import pytest
from pyspark.sql import functions as F, types as T

from gobblin_spark import schema as S

USER = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "color", "type": {"type": "enum", "name": "Color",
                                   "symbols": ["RED", "GREEN"]}},
        {"name": "born", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                    "precision": 12, "scale": 2}},
        {
            "name": "address",
            "type": {
                "type": "record",
                "name": "Address",
                "fields": [
                    {"name": "city", "type": "string"},
                    {"name": "zip", "type": ["null", "string"]},
                ],
            },
        },
    ],
}


def test_avro_to_struct_type_matrix():
    st = S.avro_to_struct(json.dumps(USER))
    by_name = {f.name: f for f in st.fields}
    assert by_name["id"].dataType == T.LongType() and not by_name["id"].nullable
    assert by_name["name"].dataType == T.StringType() and by_name["name"].nullable
    assert by_name["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert by_name["props"].dataType == T.MapType(T.StringType(), T.LongType(), False)
    assert by_name["color"].dataType == T.StringType()
    assert by_name["born"].dataType == T.DateType()
    assert by_name["at"].dataType == T.TimestampType()
    assert by_name["amount"].dataType == T.DecimalType(12, 2)
    addr = by_name["address"].dataType
    assert isinstance(addr, T.StructType)
    assert addr["zip"].nullable and not addr["city"].nullable


def test_struct_to_avro_roundtrip():
    st = S.avro_to_struct(USER)
    back = S.struct_to_avro(st, "User")
    # round-trip through avro again lands on the same Catalyst type
    st2 = S.avro_to_struct(back)
    # nullability markers survive; enums/decimals degrade as documented
    assert [f.name for f in st2.fields] == [f.name for f in st.fields]
    assert st2["name"].nullable and st2["id"].dataType == T.LongType()
    assert st2["at"].dataType == T.TimestampType()


def test_non_null_union_becomes_member_struct():
    sch = {"type": "record", "name": "R",
           "fields": [{"name": "u", "type": ["int", "string"]}]}
    st = S.avro_to_struct(sch)
    u = st["u"].dataType
    assert isinstance(u, T.StructType)
    assert {f.name for f in u.fields} == {"member_int", "member_string"}


def test_named_type_reuse_resolves_nonrecursively():
    """audit r12: real-world Avro defines a named record/enum/fixed
    once and references it by name later (definition-before-use) —
    avro_to_struct must inline the reference, not raise 'unresolved
    named type'. Genuinely RECURSIVE references still raise."""
    import pytest

    sch = {"type": "record", "name": "Person", "fields": [
        {"name": "home", "type": {
            "type": "record", "name": "Addr", "fields": [
                {"name": "city", "type": "string"},
                {"name": "kind", "type": {
                    "type": "enum", "name": "Kind",
                    "symbols": ["A", "B"]}}]}},
        {"name": "work", "type": "Addr"},        # record reuse
        {"name": "alt_kind", "type": ["null", "Kind"]}]}  # enum reuse
    st = S.avro_to_struct(sch)
    assert st["home"].dataType == st["work"].dataType
    assert isinstance(st["work"].dataType, T.StructType)
    assert st["alt_kind"].dataType == T.StringType()
    assert st["alt_kind"].nullable

    rec = {"type": "record", "name": "Node", "fields": [
        {"name": "next", "type": ["null", "Node"]}]}
    with pytest.raises(RecursionError):
        S.avro_to_struct(rec)

    # r12 review #2: NAMESPACED references — the form avro-tools /
    # Confluent schemas actually emit: the nested record inherits the
    # enclosing namespace, and later references use the FULLNAME
    ns_sch = {"type": "record", "name": "P", "namespace": "com.x",
              "fields": [
                  {"name": "a", "type": {
                      "type": "record", "name": "Addr", "fields": [
                          {"name": "city", "type": "string"}]}},
                  {"name": "b", "type": "com.x.Addr"},  # fullname ref
                  {"name": "c", "type": "Addr"}]}       # bare ref
    st_ns = S.avro_to_struct(ns_sch)
    assert st_ns["a"].dataType == st_ns["b"].dataType == \
        st_ns["c"].dataType
    # fullname recursion still raises
    rec_ns = {"type": "record", "name": "N", "namespace": "com.x",
              "fields": [{"name": "next", "type": ["null", "com.x.N"]}]}
    with pytest.raises(RecursionError):
        S.avro_to_struct(rec_ns)

    # bare-name COLLISION across namespaces: a bare reference resolves
    # against the CURRENT namespace first (spec name resolution), so
    # two same-bare-name types in different namespaces disambiguate
    two_ns = {"type": "record", "name": "Top", "fields": [
        {"name": "x", "type": {
            "type": "record", "name": "Addr", "namespace": "com.a",
            "fields": [{"name": "v", "type": "long"}]}},
        {"name": "y", "type": {
            "type": "record", "name": "P", "namespace": "com.b",
            "fields": [
                {"name": "own", "type": {
                    "type": "record", "name": "Addr", "fields": [
                        {"name": "s", "type": "string"}]}},
                {"name": "ref", "type": "Addr"}]}}]}  # com.b.Addr
    st2 = S.avro_to_struct(two_ns)
    p = st2["y"].dataType
    assert p["ref"].dataType == p["own"].dataType  # com.b's, not com.a's
    assert p["ref"].dataType != st2["x"].dataType

    # r13 (ADVICE): NO cross-namespace bare fallback. A bare reference
    # resolves in the referencing site's namespace ONLY — 'Addr' from
    # the null namespace must NOT silently bind com.a.Addr (the old
    # defs[bare] fallback bound whichever namespace registered first).
    cross = {"type": "record", "name": "Top", "fields": [
        {"name": "x", "type": {
            "type": "record", "name": "Addr", "namespace": "com.a",
            "fields": [{"name": "v", "type": "long"}]}},
        {"name": "y", "type": "Addr"}]}  # bare ref from NULL namespace
    with pytest.raises(ValueError, match="unresolved named type"):
        S.avro_to_struct(cross)
    # ...and 'Addr' from namespace com.b must not reach com.a.Addr
    cross_b = {"type": "record", "name": "Top", "fields": [
        {"name": "x", "type": {
            "type": "record", "name": "Addr", "namespace": "com.a",
            "fields": [{"name": "v", "type": "long"}]}},
        {"name": "y", "type": {
            "type": "record", "name": "P", "namespace": "com.b",
            "fields": [{"name": "ref", "type": "Addr"}]}}]}
    with pytest.raises(ValueError, match="unresolved named type"):
        S.avro_to_struct(cross_b)
    # a null-namespace definition IS reachable by its bare name (its
    # fullname) from the null namespace — and from a namespaced site
    # only via nothing (no dotted form exists), so pin the positive
    # null-ns case too
    nullns = {"type": "record", "name": "Top", "fields": [
        {"name": "x", "type": {
            "type": "record", "name": "Addr",
            "fields": [{"name": "v", "type": "long"}]}},
        {"name": "y", "type": "Addr"}]}
    st3 = S.avro_to_struct(nullns)
    assert st3["x"].dataType == st3["y"].dataType

    # two DIFFERENT definitions of one fullname are an error (Avro
    # forbids duplicate definitions; setdefault silently kept the first)
    dup = {"type": "record", "name": "Top", "fields": [
        {"name": "x", "type": {
            "type": "record", "name": "Addr",
            "fields": [{"name": "v", "type": "long"}]}},
        {"name": "y", "type": {
            "type": "record", "name": "Addr",
            "fields": [{"name": "s", "type": "string"}]}}]}
    with pytest.raises(ValueError, match="duplicate definition"):
        S.avro_to_struct(dup)

    # r12 review #4: chained reuse is MEMOIZED — a ~25-deep chain
    # where each record holds two references to the previous one is
    # linear, not 2^25 re-expansions
    import time
    chain = {"type": "record", "name": "R0",
             "fields": [{"name": "v", "type": "long"}]}
    for i in range(1, 26):
        chain = {"type": "record", "name": f"R{i}", "fields": [
            {"name": "l", "type": chain},
            {"name": "r", "type": f"R{i-1}"}]}
    t0 = time.monotonic()
    st_chain = S.avro_to_struct(chain)
    assert time.monotonic() - t0 < 5.0  # exponential would hang
    assert isinstance(st_chain["l"].dataType, T.StructType)


def test_recursion_elimination():
    tree = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "value", "type": "long"},
            {"name": "child", "type": ["null", "Node"]},
        ],
    }
    with pytest.raises(RecursionError):
        S.avro_to_struct(tree)
    cleaned, dropped = S.eliminate_recursion(tree)
    assert dropped == ["child"]
    st = S.avro_to_struct(cleaned)
    assert [f.name for f in st.fields] == ["value"]


def test_recursion_depth_one_keeps_one_level():
    tree = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "value", "type": "long"},
            {"name": "child", "type": ["null", "Node"]},
        ],
    }
    cleaned, dropped = S.eliminate_recursion(tree, max_depth=1)
    assert dropped == ["child.child"]
    st = S.avro_to_struct(cleaned)
    child = st["child"].dataType
    assert isinstance(child, T.StructType)
    assert [f.name for f in child.fields] == ["value"]


def test_compatibility_promotions():
    assert S.is_compatible(T.LongType(), T.IntegerType())
    assert S.is_compatible(T.DoubleType(), T.FloatType())
    assert not S.is_compatible(T.IntegerType(), T.LongType())
    r = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("new", T.StringType(), True),
    ])
    w = T.StructType([T.StructField("a", T.IntegerType(), False)])
    assert S.is_compatible(r, w)
    r_bad = T.StructType([T.StructField("req", T.StringType(), False)])
    assert not S.is_compatible(r_bad, w)


def test_avro_codec_spec_bytes():
    """Wire-format golden bytes from the Avro spec: zigzag varints and
    length-prefixed strings."""
    from gobblin_spark.operators import avro_codec as AC

    assert AC.encode(0, "long") == b"\x00"
    assert AC.encode(1, "long") == b"\x02"
    assert AC.encode(-1, "long") == b"\x01"
    assert AC.encode(64, "long") == b"\x80\x01"
    assert AC.encode("foo", "string") == b"\x06foo"
    assert AC.decode(b"\x80\x01", "long") == 64


def test_avro_codec_record_roundtrip_types():
    import datetime as dt

    from gobblin_spark.operators import avro_codec as AC

    sch = {"type": "record", "name": "r", "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "local-timestamp-micros"}},
    ]}
    v = {"i": None, "s": "héllo", "d": -2.5, "b": b"\x00\xff",
         "arr": [3, -4, 5], "m": {"k": "v", "x": "y"},
         "day": dt.date(2024, 2, 29),
         "ts": dt.datetime(2024, 2, 29, 12, 30, 15, 123456)}
    assert AC.decode(AC.encode(v, sch), sch) == v


def test_avro_serde_python_fallback_roundtrip(spark):
    """spark-avro isn't shipped here: record_to_avro_bytes /
    avro_bytes_to_record must still round-trip exactly via the
    pure-Python wire-format engine in mapInPandas."""
    from gobblin_spark.operators import avro_serde

    assert not avro_serde.avro_available(spark)  # the JVM path is absent
    df = spark.createDataFrame(
        [(1, "x", 1.5, None), (2, None, -3.25, [1, 2]), (3, "", 0.0, [])],
        "id long, s string, d double, arr array<int>")
    enc = avro_serde.record_to_avro_bytes(df, keep=["id"])
    assert enc.columns == ["id", "value"]
    assert all(isinstance(r.value, (bytes, bytearray)) for r in enc.collect())
    dec = avro_serde.avro_bytes_to_record(enc.drop("id"), spark_schema=df.schema)
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, df.collect()))


def test_avro_envelope_decode(spark):
    """EnvelopePayloadConverter shape: an envelope row carries the
    payload as Avro bytes; decode_envelope recovers the payload fields
    while keeping envelope metadata columns."""
    from gobblin_spark.operators import avro_serde

    payload_df = spark.createDataFrame(
        [(10, "alpha"), (20, "beta")], "pid long, name string")
    env = avro_serde.record_to_avro_bytes(payload_df, out_col="payload") \
        .withColumn("topic", F.lit("t1"))
    out = avro_serde.decode_envelope(
        env, "payload", S.struct_to_avro(payload_df.schema), keep=["topic"])
    got = sorted((r.topic, r.pid, r.name) for r in out.collect())
    assert got == [("t1", 10, "alpha"), ("t1", 20, "beta")]
