"""Avro *object container file* format (.avro files), pure Python.

Implements the container layout from the public Avro spec
(https://avro.apache.org/docs/current/specification/#object-container-files):

    magic 'Obj\\x01'
    file metadata (an Avro map<string, bytes>: avro.schema, avro.codec)
    16-byte sync marker
    data blocks: [record count: long][byte size: long][records][sync]

on top of the wire-format codec in ``operators/avro_codec.py``.
Codecs: ``null`` and ``deflate`` (raw zlib, per spec). This is the
on-disk format AvroHdfsDataWriter produces and every Avro lake reader
consumes (reference: gobblin-core/.../writer/AvroHdfsDataWriter.java);
the Spark-side distributed read/write lives in operators/avro_serde.py.
"""

from __future__ import annotations

import io
import json
import os
import zlib

from gobblin_spark.operators import avro_codec as AC

MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_header(out, schema_json: str, sync: bytes, codec: str = "null") -> None:
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    out.write(AC.encode(meta, _META_SCHEMA))
    out.write(sync)


def write_block(out, encoded_records: list[bytes], sync: bytes,
                codec: str = "null") -> None:
    if not encoded_records:
        return
    payload = b"".join(encoded_records)
    if codec == "deflate":
        # spec: raw DEFLATE stream, no zlib header/checksum
        payload = zlib.compress(payload)[2:-4]
    elif codec != "null":
        raise ValueError(f"unsupported codec: {codec}")
    head = bytearray()
    AC._write_long(head, len(encoded_records))
    AC._write_long(head, len(payload))
    out.write(bytes(head))
    out.write(payload)
    out.write(sync)


def new_sync() -> bytes:
    return os.urandom(16)


def read_container(buf: bytes):
    """Parse one container file → (schema_json_str, list of records)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, pos = AC._decode(buf, 4, AC.parse_schema(_META_SCHEMA))
    schema_json = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    schema = AC.parse_schema(schema_json)
    sync = buf[pos:pos + 16]
    pos += 16
    records = []
    n = len(buf)
    while pos < n:
        count, pos = AC._read_long(buf, pos)
        size, pos = AC._read_long(buf, pos)
        block = buf[pos:pos + size]
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        bpos = 0
        for _ in range(count):
            rec, bpos = AC._decode(block, bpos, schema)
            records.append(rec)
        if buf[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
        pos += 16
    return schema_json, records


def read_header_schema(buf: bytes) -> str:
    """Schema JSON from a container header without decoding blocks."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, _ = AC._decode(buf, 4, AC.parse_schema(_META_SCHEMA))
    return meta["avro.schema"].decode("utf-8")


def write_container_bytes(records, schema, codec: str = "null",
                          block_records: int = 4096) -> bytes:
    """Encode an iterable of records into one in-memory container."""
    schema = AC.parse_schema(schema)
    out = io.BytesIO()
    sync = new_sync()
    write_header(out, json.dumps(schema) if not isinstance(schema, str) else schema,
                 sync, codec)
    batch: list[bytes] = []
    for rec in records:
        batch.append(AC.encode(rec, schema))
        if len(batch) >= block_records:
            write_block(out, batch, sync, codec)
            batch = []
    write_block(out, batch, sync, codec)
    return out.getvalue()
