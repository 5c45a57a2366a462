"""Avro binary serde: AvroToBytes / BytesToAvro as ``to_avro``/``from_avro``
column transforms.

Reference mapping:
- AvroToBytesConverter (gobblin-core/.../converter/AvroToBytesConverter.java:41)
  and BytesToAvroConverter: record ↔ Avro binary wire format — the
  reference's lingua franca between stages and Kafka topics.
- EnvelopeSchemaConverter (gobblin-modules/gobblin-kafka-common/.../
  EnvelopePayloadConverter.java): an envelope record carries the payload
  as Avro bytes; decode = ``from_avro`` on the payload column.

Spark design: ``pyspark.sql.avro.functions.to_avro/from_avro`` are
JVM-side Catalyst expressions (vectorized, codegen-friendly) — never a
Python UDF. They live in the external ``spark-avro`` module
(``--packages org.apache.spark:spark-avro_2.13:<version>``); this
sandbox does not ship it, so ``require_avro`` raises a clear error
at call time. Schema derivation (``gobblin_spark.schema``) is pure
metadata and fully tested regardless.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, functions as F

from gobblin_spark import schema as _schema


class AvroNotAvailable(RuntimeError):
    pass


def avro_available(spark) -> bool:
    """True iff the spark-avro datasource is loaded in this session."""
    try:
        spark.range(1).select(
            __import__("pyspark.sql.avro.functions", fromlist=["to_avro"]).to_avro(F.col("id"))
        ).collect()
        return True
    except Exception:
        return False


def _fns():
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro
        return from_avro, to_avro
    except ImportError as ex:  # pragma: no cover
        raise AvroNotAvailable(
            "pyspark.sql.avro.functions unavailable"
        ) from ex


def record_to_avro_bytes(df: DataFrame, out_col: str = "value",
                         keep: list[str] | None = None) -> DataFrame:
    """AvroToBytesConverter.java:41 — pack the whole row into one Avro
    binary column (writer schema derived from the Catalyst schema).
    Needs the spark-avro package on the session classpath."""
    _, to_avro = _fns()
    packed = F.struct(*df.columns)
    cols = [F.col(c) for c in (keep or [])]
    return df.select(*cols, to_avro(packed).alias(out_col))


def avro_bytes_to_record(df: DataFrame, bytes_col: str = "value",
                         avro_schema: str | dict | None = None,
                         spark_schema=None, flatten: bool = True) -> DataFrame:
    """BytesToAvroConverter — decode an Avro binary column. Give either
    the Avro writer schema JSON (preferred: exact resolution) or a
    Catalyst schema (converted via schema.struct_to_avro)."""
    from_avro, _ = _fns()
    if avro_schema is None:
        if spark_schema is None:
            raise ValueError("need avro_schema or spark_schema")
        avro_schema = _schema.struct_to_avro(spark_schema)
    if isinstance(avro_schema, dict):
        avro_schema = json.dumps(avro_schema)
    decoded = df.withColumn("_rec", from_avro(F.col(bytes_col), avro_schema))
    if not flatten:
        return decoded
    others = [c for c in df.columns if c != bytes_col]
    return decoded.select(*others, "_rec.*")


def decode_envelope(df: DataFrame, payload_col: str, payload_avro_schema: str | dict,
                    keep: list[str] | None = None) -> DataFrame:
    """EnvelopePayloadConverter — decode the nested payload bytes column
    of an envelope record, keeping selected envelope columns."""
    return avro_bytes_to_record(
        df.select(*(keep or []), F.col(payload_col).alias("_payload")),
        bytes_col="_payload",
        avro_schema=payload_avro_schema,
    )
