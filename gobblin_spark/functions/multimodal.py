"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct. The
Spark-side plumbing — schema, Arrow-batched mapInPandas transforms,
partition sizing — is real and tested; the actual codec step is STUBBED
(this container has no image/audio libraries): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder produces stable feature values so the distributed plumbing
can be exercised end-to-end.

Design notes for 100 TB of media:
- Blobs stay in the ``binary`` column; metadata-only transformations
  (dimensions, duration, content hashes) never deserialize payloads.
- mapInPandas streams Arrow record batches — bounded memory per task
  regardless of per-file blob size; ``maxRecordsPerBatch`` caps batch
  memory (set in session.py).
- Repartition by size before decode so one task doesn't get all the
  4K videos: ``repartition_by_bytes``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("sha256", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Compute blob metadata (length, sha256) without leaving the JVM."""
    return df.withColumn("byte_len", F.length(F.col(payload_col)).cast("long")).withColumn(
        "sha256", F.lower(F.sha2(F.col(payload_col), 256))
    )


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test fixture: lift a text table into the media schema (payload =
    utf-8 bytes). Lets the binary plumbing be oracle-checked without any
    real media files."""
    lifted = df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )
    return attach_binary_metadata(lifted)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder: derives pseudo-dimensions + feature
    hash from the payload digest. Stable across runs/machines."""
    d = hashlib.sha256(payload or b"").digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    return width, height, d.hex()[:16]


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract stage as Arrow-batched mapInPandas.

    Real decode requires PIL/ffmpeg — NOT available here; ``fake=True``
    swaps in the deterministic fake decoder. The distributed shape
    (batch iteration, schema, memory bounds) is identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: no module-global references, so the
        # worker needs nothing on its PYTHONPATH
        import hashlib as _hashlib

        def fake_decode(payload):
            d = _hashlib.sha256(payload or b"").digest()
            return 64 + d[0] % 192, 64 + d[1] % 192, d.hex()[:16]

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode needs PIL/opencv; not installed in this "
                    "environment — pass fake=True for the deterministic stub"
                )
            feats = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([f[0] for f in feats], dtype="int32"),
                    "height": pd.Series([f[1] for f in feats], dtype="int32"),
                    "feature_hash": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (media_id, frame_ts). Decoding the actual frame is the stubbed step;
    the explode that fans a video row into frame-task rows is the real
    distributed mechanic (it is how frame extraction parallelizes)."""
    duration = (F.col("byte_len") % 120 + 1).cast("int")  # stub duration seconds
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), duration, F.lit(every_n_seconds))
        ).alias("frame_ts"),
    )


def repartition_by_bytes(
    df: DataFrame,
    target_bytes_per_partition: int = 128 << 20,
    total_bytes: int | None = None,
) -> DataFrame:
    """Size the partition COUNT from total payload bytes and hash-spread
    rows across it.

    Pass ``total_bytes`` (e.g. summed from the file inventory that fed
    the read — ``list_files`` returns sizes) to keep the plan lazy; if
    omitted, one eager ``sum(byte_len)`` job runs and the upstream plan
    is computed twice — acceptable only right after a scan, never
    mid-pipeline. Hashing on the full row spreads blobs uniformly in
    EXPECTATION; exact byte-balanced bin-packing is not attempted (it
    would serialize planning on the driver). At read time prefer sizing
    via ``spark.sql.files.maxPartitionBytes`` instead.
    """
    if total_bytes is None:
        total_bytes = df.agg(F.sum("byte_len")).first()[0] or 0
    n = max(1, int(total_bytes // target_bytes_per_partition) + 1)
    return df.repartition(n)


def audio_segment_plan(
    df: DataFrame,
    segment_seconds: int = 10,
    overlap_seconds: int = 2,
) -> DataFrame:
    """Audio segmentation *plan*: one row per overlapping window
    (media_id, seg_start, seg_end) — the ASR/embedding pre-chunking
    step (Whisper-style 10s windows with 2s overlap). Like
    frame_sample_plan, the explode that fans one recording into
    segment-task rows IS the distributed mechanic; the codec behind it
    stays stubbed (no ffmpeg in this environment). Stride = segment −
    overlap; the tail window is kept short rather than dropped (audio
    endings matter), and every segment end is clipped to the duration.
    """
    if overlap_seconds >= segment_seconds:
        raise ValueError("overlap must be smaller than the segment")
    stride = segment_seconds - overlap_seconds
    duration = (F.col("byte_len") % 120 + 1).cast("int")  # stub seconds
    start = F.explode(
        F.sequence(F.lit(0), duration - 1, F.lit(stride))).alias("seg_start")
    return (
        df.select("media_id", duration.alias("_dur"), start)
        .select(
            "media_id",
            "seg_start",
            F.least(F.col("seg_start") + segment_seconds, F.col("_dur"))
            .cast("int").alias("seg_end"),
        )
    )
