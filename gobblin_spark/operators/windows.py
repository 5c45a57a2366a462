"""Time-window aggregations (tumbling / sliding / session).

Gobblin's only windowing is implicit: time-partitioned writes are
tumbling windows on event time (TimeBasedWriterPartitioner.java:59), and
it has no session/sliding windows (SURVEY §2.11 — "absent"). Spark gives
these for free; we expose them as parity-plus operators usable both on
batch DataFrames and (with watermarks) on streams.

Scale notes: a tumbling-window agg is one hash shuffle keyed on
(window, keys) with map-side partial aggregation. Session windows on
batch use Spark's native session_window (merge-on-shuffle); both are
AQE-coalesced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Tumbling-window aggregation; emits window_start/window_end columns."""
    win = F.window(F.col(ts_col), duration)
    out = df.groupBy(win.alias("w"), *keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Sliding-window aggregation (window length ``duration``, step ``slide``)."""
    win = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(win.alias("w"), *keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge.

    Emits session_start (first event) and session_end (last event + gap,
    Spark's session_window convention).
    """
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("w"), *keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


def time_partition_columns(
    df: DataFrame, ts_col: str, granularity: str = "day"
) -> DataFrame:
    """Derive yyyy/MM/dd[/HH] partition columns from an event timestamp.

    TimeBasedWriterPartitioner.java:59 — the partition key of the
    time-partitioned writer; used with ``partitionBy('year','month','day')``
    so the output layout prunes on date at read time.
    """
    out = (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )
    if granularity == "hour":
        out = out.withColumn("hour", F.hour(ts_col))
    elif granularity != "day":
        raise ValueError(f"unknown granularity: {granularity}")
    return out
