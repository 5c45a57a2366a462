"""Pure-Python Avro *binary encoding* codec (no container files).

Implements the Avro 1.11 binary wire format from the public spec
(https://avro.apache.org/docs/current/specification/): zigzag-varint
ints/longs, length-prefixed bytes/strings, IEEE little-endian floats,
records as concatenated fields, arrays/maps as counted blocks, unions
as branch-index + value. This is the same record payload
AvroToBytesConverter.java:41 / BytesToAvroConverter produce between
Gobblin stages and on Kafka topics — NOT the .avro object-container
format (that adds a header/sync markers; Spark reads those natively
when the spark-avro package is present).

Used by operators/avro_serde.py as the fallback engine inside
Arrow-batched ``mapInPandas`` when the spark-avro JVM package is not
on the session classpath. On a real cluster ship this package to the
workers (``--py-files`` / pip install) — standard PySpark deployment.

Logical types honored: date (int days), timestamp-micros /
local-timestamp-micros (long). Decimal/fixed pass through as bytes.
"""

from __future__ import annotations

import datetime as _dt
import json
import struct as _struct

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def parse_schema(schema):
    """JSON string → dict/list/str schema node (idempotent)."""
    if isinstance(schema, str):
        try:
            return json.loads(schema)
        except json.JSONDecodeError:
            return schema  # bare primitive name like "string"
    return schema


# ------------------------------------------------------------------
# primitives
# ------------------------------------------------------------------


def _write_varint(out: bytearray, z: int) -> None:
    while z > 0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)


def _write_long(out: bytearray, n: int) -> None:
    # zigzag: Python's arbitrary-precision XOR matches two's complement
    _write_varint(out, (n << 1) ^ (n >> 63))


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    z, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"] if isinstance(schema["type"], str) else _type_name(schema["type"])


def _union_branch(value, branches):
    """Pick the union branch for a Python value (nullable unions and
    simple primitive unions — the shapes struct_to_avro generates)."""
    if value is None:
        for i, b in enumerate(branches):
            if b == "null":
                return i, b
        raise ValueError("null value but no null branch")
    for i, b in enumerate(branches):
        if b != "null":
            return i, b  # struct_to_avro unions are ["null", T]
    raise ValueError("no non-null branch")


# ------------------------------------------------------------------
# encode
# ------------------------------------------------------------------


def _encode(out: bytearray, value, schema) -> None:
    if isinstance(schema, list):  # union
        idx, branch = _union_branch(value, schema)
        _write_long(out, idx)
        if branch != "null":
            _encode(out, value, branch)
        return
    t = _type_name(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
        return
    if t in ("int", "long"):
        if logical == "date" and isinstance(value, _dt.date) \
                and not isinstance(value, _dt.datetime):
            value = (value - _EPOCH_DATE).days
        elif logical in ("timestamp-micros", "local-timestamp-micros",
                         "timestamp-millis") and isinstance(value, _dt.datetime):
            epoch = _EPOCH_UTC if value.tzinfo else _EPOCH_DT
            # exact int64 arithmetic (audit-r7): float total_seconds()
            # carries up to ~0.5 µs of rounding by the 22nd century —
            # the same mantissa trap the nano-parquet reader avoids
            delta = value - epoch
            micros = ((delta.days * 86_400 + delta.seconds) * 1_000_000
                      + delta.microseconds)
            value = micros // 1000 if logical == "timestamp-millis" else micros
        _write_long(out, int(value))
        return
    if t == "float":
        out.extend(_struct.pack("<f", float(value)))
        return
    if t == "double":
        out.extend(_struct.pack("<d", float(value)))
        return
    if t in ("bytes", "fixed"):
        b = bytes(value)
        if t == "fixed":
            out.extend(b)
        else:
            _write_long(out, len(b))
            out.extend(b)
        return
    if t in ("string", "enum"):
        if t == "enum":
            _write_long(out, schema["symbols"].index(value))
            return
        b = str(value).encode("utf-8")
        _write_long(out, len(b))
        out.extend(b)
        return
    if t == "record":
        for f in schema["fields"]:
            fv = value.get(f["name"]) if isinstance(value, dict) else getattr(value, f["name"])
            _encode(out, fv, f["type"])
        return
    if t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(out, it, schema["items"])
        _write_long(out, 0)
        return
    if t == "map":
        entries = dict(value)
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                kb = str(k).encode("utf-8")
                _write_long(out, len(kb))
                out.extend(kb)
                _encode(out, v, schema["values"])
        _write_long(out, 0)
        return
    raise TypeError(f"unsupported avro type: {t}")


def encode(value, schema) -> bytes:
    """Encode *value* (dict for records) to Avro binary per *schema*."""
    out = bytearray()
    _encode(out, value, parse_schema(schema))
    return bytes(out)


# ------------------------------------------------------------------
# decode
# ------------------------------------------------------------------


def _decode(buf: bytes, pos: int, schema):
    if isinstance(schema, list):  # union
        idx, pos = _read_long(buf, pos)
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return _decode(buf, pos, branch)
    t = _type_name(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        n, pos = _read_long(buf, pos)
        if logical == "date":
            return _EPOCH_DATE + _dt.timedelta(days=n), pos
        if logical == "timestamp-micros":
            return _EPOCH_UTC + _dt.timedelta(microseconds=n), pos
        if logical == "local-timestamp-micros":
            return _EPOCH_DT + _dt.timedelta(microseconds=n), pos
        if logical == "timestamp-millis":
            return _EPOCH_UTC + _dt.timedelta(milliseconds=n), pos
        return n, pos
    if t == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos:pos + n]), pos + n
    if t == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if t == "enum":
        i, pos = _read_long(buf, pos)
        return schema["symbols"][i], pos
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(buf, pos, f["type"])
        return rec, pos
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-permitted)
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                v, pos = _decode(buf, pos, schema["items"])
                out.append(v)
        return out, pos
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                klen, pos = _read_long(buf, pos)
                k = buf[pos:pos + klen].decode("utf-8")
                pos += klen
                out[k], pos = _decode(buf, pos, schema["values"])
        return out, pos
    raise TypeError(f"unsupported avro type: {t}")


def decode(buf: bytes, schema):
    """Decode Avro binary *buf* per *schema*; returns the value
    (records as dicts)."""
    value, _ = _decode(bytes(buf), 0, parse_schema(schema))
    return value
