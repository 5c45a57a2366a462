"""Custom stateful streaming operators (applyInPandasWithState).

Reference mapping (all relative to /root/reference/):
- Streaming dedup: the compaction key-dedup (gobblin-compaction/.../
  AvroKeyDedupReducer.java) applied CONTINUOUSLY — the reference dedups
  per compaction run; with keyed state the first occurrence of a key is
  emitted and every later one is suppressed across epochs.
- Sessionization: windows.session_windows (batch twin) with state —
  the stateful runtime the reference lacks natively (its streaming is
  record-at-a-time pass-through; SURVEY marks this parity-plus).

Spark design: ``applyInPandasWithState`` keeps per-key state in the
checkpointed state store — Arrow-batched, grouped by key, scales with
the shuffle. State per key is O(1) (a flag / an open-session tuple),
NOT a growing set: the key itself is the group, so "seen" is one
boolean per distinct key, exactly like a streaming dedup should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def stateful_dedup_stream(
    stream_df: DataFrame,
    key_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Exactly-first-occurrence streaming dedup: group by *key_col*;
    keyed state is a single seen-flag, so only the FIRST row per key —
    across all epochs since the checkpoint began — is emitted.

    ``timeout`` accepts only ``"NoTimeout"``: a TTL'd seen-set (state
    evicted after idleness, keys re-emitted later) is a DIFFERENT
    dedup contract and the state fn has no timeout branch — silently
    accepting another value would hand back exact-dedup results the
    caller believes are TTL'd (audit r13).

    Output: (key, n_suppressed) — emitted ONCE, on the epoch that first
    sees the key, with the count of same-key duplicates suppressed in
    that same batch; later epochs only update the suppression tally in
    state. State never grows per key; total state is O(distinct keys),
    partitioned by the shuffle like any aggregation."""
    if timeout != "NoTimeout":
        raise NotImplementedError(
            "stateful_dedup_stream supports timeout='NoTimeout' only — "
            "a TTL'd dedup needs a timeout branch in the state fn "
            "(see sessionize_stream_with_timeout for the pattern)")
    out_schema = StructType([
        StructField("key", stream_df.schema[key_col].dataType, True),
        StructField("n_suppressed", LongType(), True),
    ])
    state_schema = StructType([StructField("seen", LongType(), True)])

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            return iter(())  # duplicate key: suppress
        state.update((n,))
        yield pd.DataFrame({"key": [key[0]], "n_suppressed": [n - 1]})

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Event-time sessionization with keyed state: rows within
    *gap_seconds* of the session's current end extend it; a larger gap
    closes the old session (emitted) and opens a new one. The batch twin
    is ``operators.windows.session_windows``; this one is incremental.

    Sessions are emitted when a LATER event closes them; the final open
    session per key stays in state (drain it by sending a sentinel event
    past the gap, or use the batch twin for bounded data)."""
    out_schema = StructType([
        StructField("key", stream_df.schema[key_col].dataType, True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ])
    state_schema = StructType([
        StructField("start_us", LongType(), True),
        StructField("end_us", LongType(), True),
        StructField("n", LongType(), True),
    ])

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        ts_all = []
        for pdf in pdfs:
            ts_all.append(pd.to_datetime(pdf[ts_col]))
        # NaT rows are not events: their int64 sentinel (most-negative)
        # would slip past the sorted order and count toward n (audit r9)
        ts = pd.concat(ts_all).dropna().sort_values()
        if len(ts) == 0:
            return iter(())
        us = (ts.astype("int64") // 1000).tolist()
        gap_us = gap_seconds * 1_000_000

        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = us[0], us[0], 0
        closed = []
        for t in us:
            if t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                # a LATE event (t <= end, possibly before start) merges
                # into the open session and must widen BOTH bounds —
                # the batch twin (native session_window) reports the
                # earliest event as session_start (audit r9)
                start = min(start, t)
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        if not closed:
            return iter(())
        out = pd.DataFrame(closed, columns=["s", "e", "n"])
        yield pd.DataFrame({
            "key": [key[0]] * len(out),
            "session_start": pd.to_datetime(out["s"], unit="us"),
            "session_end": pd.to_datetime(out["e"], unit="us"),
            "n_events": out["n"],
        })

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def sessionize_stream_with_timeout(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """``sessionize_stream`` plus PROCESSING-TIME timeouts: a key that
    stops producing events has its open session FLUSHED once no batch
    touches it for ``idle_timeout_ms`` — closing the gap the NoTimeout
    variant documents ("the final open session stays in state"). This
    is the idle-key eviction every production sessionizer needs: state
    size tracks ACTIVE keys, not all keys ever seen.

    Timeout semantics are Spark's: the callback fires on a subsequent
    micro-batch after expiry (some trigger must run), so drain
    latency = idle_timeout + one trigger interval. Emitted rows are
    identical in shape to the gap-closed ones — downstream cannot tell
    how a session ended, which is the correct contract."""
    out_schema = StructType([
        StructField("key", stream_df.schema[key_col].dataType, True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ])
    state_schema = StructType([
        StructField("start_us", LongType(), True),
        StructField("end_us", LongType(), True),
        StructField("n", LongType(), True),
    ])

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame({
                "key": [key[0]],
                "session_start": pd.to_datetime([start], unit="us"),
                "session_end": pd.to_datetime([end], unit="us"),
                "n_events": [n],
            })
            return

        ts_all = [pd.to_datetime(pdf[ts_col]) for pdf in pdfs]
        # NaT rows are not events (see sessionize_stream, audit r9)
        ts = pd.concat(ts_all).dropna().sort_values()
        if len(ts) == 0:
            if state.exists:
                # an all-null batch still proves the key is alive
                state.setTimeoutDuration(idle_timeout_ms)
            return
        us = (ts.astype("int64") // 1000).tolist()
        gap_us = gap_seconds * 1_000_000
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = us[0], us[0], 0
        closed = []
        for t in us:
            if t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                # late events widen both bounds (see sessionize_stream)
                start = min(start, t)
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            out = pd.DataFrame(closed, columns=["s", "e", "n"])
            yield pd.DataFrame({
                "key": [key[0]] * len(out),
                "session_start": pd.to_datetime(out["s"], unit="us"),
                "session_end": pd.to_datetime(out["e"], unit="us"),
                "n_events": out["n"],
            })

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
