"""Generic record sink: batched, retried delivery to any external system
through an injectable sender — the HTTP/Elasticsearch/Couchbase/EventHub
writer family collapsed into one operator.

Reference mapping (all relative to /root/reference/):
- AsyncHttpWriter / AbstractHttpWriter (gobblin-modules/gobblin-http/
  .../AsyncHttpWriterBuilder.java): batch, send, retry with backoff.
- ElasticsearchDataWriter (gobblin-modules/gobblin-elasticsearch/.../
  ElasticsearchRestWriter.java): bulk-batches of index requests.
- CouchbaseWriter (gobblin-modules/gobblin-couchbase/.../CouchbaseWriter.java),
  EventhubDataWriter (gobblin-modules/gobblin-azure-eventhubs/...):
  same shape — serialize record, deliver, count failures.

Spark design: ``foreachPartition``-style delivery via ``mapInPandas`` —
each task slices its Arrow batches into sender-sized chunks, retries
transient failures with exponential backoff, and emits one result row
per chunk (rows_sent, attempts, error). The sender is a plain callable
``(list[dict]) -> None`` built per partition from ``sender_factory``
(connections are NOT serialized from the driver — the factory runs in
the task, the standard foreachPartition connection pattern). The
sandbox has no external endpoints; tests inject a recording sender —
that gates the endpoint, not the operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

RESULT_SCHEMA = "batch_id string, rows_sent long, attempts int, error string"


def write_batched(
    df: DataFrame,
    sender_factory: Callable[[], Callable[[list[dict]], None]],
    batch_size: int = 1000,
    retries: int = 3,
    backoff_sec: float = 0.5,
) -> DataFrame:
    """Deliver *df* through per-partition senders in *batch_size* chunks.

    Returns a result DataFrame (one row per chunk) — run an action on it
    to execute the delivery; failed chunks carry the last error instead
    of raising, so one bad endpoint shard doesn't kill the job
    (RetryWriter + partial-commit semantics)."""

    if retries < 1:
        # retries=0 would skip the attempt loop and report every chunk
        # as SENT (rows_sent=len(buf), error=None) without ever calling
        # the sender — silent data loss (audit r9; same hazard as
        # sources/rest.fetch_pages)
        raise ValueError("retries must be >= 1 (attempts, not re-tries)")

    def run(batches):
        import time as _time
        import uuid as _uuid

        import pandas as pd

        send = sender_factory()
        out = []
        buf: list[dict] = []

        def flush():
            if not buf:
                return
            err, attempt = None, 0
            for attempt in range(1, retries + 1):
                try:
                    send(list(buf))
                    err = None
                    break
                except Exception as ex:  # noqa: BLE001 - retry loop
                    err = f"{type(ex).__name__}: {ex}"
                    if attempt < retries:
                        _time.sleep(backoff_sec * (2 ** (attempt - 1)))
            out.append((_uuid.uuid4().hex[:12], len(buf) if err is None else 0,
                        attempt, err))
            buf.clear()

        for pdf in batches:
            for rec in pdf.to_dict("records"):
                buf.append(rec)
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame(
            out, columns=["batch_id", "rows_sent", "attempts", "error"]
        )

    return df.mapInPandas(run, RESULT_SCHEMA)
