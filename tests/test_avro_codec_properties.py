"""Property-based tests (hypothesis) for the pure-Python Avro wire
codec — encode/decode roundtrips over arbitrary values of every
supported primitive, container, and union shape. A hand-written
binary codec earns trust from adversarial values (zigzag boundaries,
empty containers, unicode astral planes), not happy-path fixtures."""

import json
import math

from hypothesis import given, settings, strategies as st

from gobblin_spark.operators import avro_codec as AC

settings.register_profile("codec", deadline=None, max_examples=200)
settings.load_profile("codec")


def _roundtrip(value, schema):
    sch = AC.parse_schema(json.dumps(schema))
    return AC.decode(AC.encode(value, sch), sch)


longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
finite_doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)


@given(longs)
def test_long_zigzag_roundtrip(v):
    assert _roundtrip(v, "long") == v


@given(ints)
def test_int_roundtrip(v):
    assert _roundtrip(v, "int") == v


@given(finite_doubles)
def test_double_roundtrip(v):
    assert _roundtrip(v, "double") == v


def test_double_nan_roundtrip():
    out = _roundtrip(float("nan"), "double")
    assert math.isnan(out)


@given(st.text(max_size=300))
def test_string_roundtrip(v):
    assert _roundtrip(v, "string") == v


@given(st.binary(max_size=300))
def test_bytes_roundtrip(v):
    assert _roundtrip(v, "bytes") == v


@given(st.booleans())
def test_boolean_roundtrip(v):
    assert _roundtrip(v, "boolean") is v


@given(st.lists(longs, max_size=50))
def test_array_roundtrip(v):
    assert _roundtrip(v, {"type": "array", "items": "long"}) == v


@given(st.dictionaries(st.text(max_size=20), st.text(max_size=50),
                       max_size=20))
def test_map_roundtrip(v):
    assert _roundtrip(v, {"type": "map", "values": "string"}) == v


@given(st.one_of(st.none(), st.text(max_size=100)))
def test_nullable_union_roundtrip(v):
    assert _roundtrip(v, ["null", "string"]) == v


RECORD = {
    "type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "double"}},
        {"name": "d", "type": "boolean"},
    ],
}


@given(longs, st.one_of(st.none(), st.text(max_size=80)),
       st.lists(finite_doubles, max_size=10), st.booleans())
def test_record_roundtrip(a, b, c, d):
    rec = {"a": a, "b": b, "c": c, "d": d}
    assert _roundtrip(rec, RECORD) == rec


@given(st.lists(st.tuples(longs, st.text(max_size=40)), max_size=30))
def test_concatenated_records_stream(rows):
    """Container-file blocks are concatenated records: encoding rows
    back-to-back and decoding sequentially must tile the buffer with
    no slack or overlap."""
    sch = AC.parse_schema(json.dumps(
        {"type": "record", "name": "kv", "fields": [
            {"name": "k", "type": "long"}, {"name": "v", "type": "string"}]}))
    buf = b"".join(AC.encode({"k": k, "v": v}, sch) for k, v in rows)
    out, pos = [], 0
    while pos < len(buf):
        rec, pos = AC._decode(buf, pos, sch)
        out.append((rec["k"], rec["v"]))
    assert pos == len(buf) and out == rows


def test_timestamp_micros_exact_far_future():
    """Audit-r7: timestamp encode must be exact integer arithmetic —
    float total_seconds() drifts toward half a microsecond by the
    22nd century, flipping the encoded micros by one."""
    import datetime as dt

    from gobblin_spark.operators import avro_codec as AC

    sch = {"type": "long", "logicalType": "timestamp-micros"}
    for y in (1970, 2024, 2150, 2500):
        v = dt.datetime(y, 7, 3, 12, 34, 56, 789123,
                        tzinfo=dt.timezone.utc)
        expect = (
            (v - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)).days
            * 86_400_000_000
            + ((v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000)
            + v.microsecond)
        got = AC.decode(AC.encode(v, sch), sch)
        assert got == v, (y, got)
        raw, _pos = AC._read_long(AC.encode(v, sch), 0)
        assert raw == expect, (y, raw, expect)
