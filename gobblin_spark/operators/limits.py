"""Limiters & top-k: record caps, rate limits, newest-K selection.

Reference: the Limiter family — CountBasedLimiter, RateBasedLimiter,
TimeBasedLimiter + LimitingExtractorDecorator
(gobblin-runtime/.../CountBasedLimiter.java, RateBasedLimiter.java:29,
LimitingExtractorDecorator.java) cap what an extractor may pull; the
retention NewestKSelectionPolicy is the reference's only top-k.

Spark mapping: count cap = limit(); deterministic top-k = ORDER BY +
LIMIT, which Spark executes as TakeOrderedAndProject (per-partition
heap + driver merge — no full sort, no full shuffle; exactly the right
plan at 100 TB). Rate/time limits belong to the streaming source
(maxOffsetsPerTrigger / maxFilesPerTrigger — see streaming/runner.py),
not to a batch operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def count_limit(df: DataFrame, n: int) -> DataFrame:
    """CountBasedLimiter — cap total records."""
    return df.limit(n)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Deterministic top-k (caller supplies a total order incl. tiebreak).

    Physical plan: TakeOrderedAndProject — per-partition bounded heap,
    single driver merge of k·num_partitions rows.
    """
    return df.orderBy(*order).limit(k)


def streaming_rate_options(
    max_offsets_per_trigger: int | None = None,
    max_files_per_trigger: int | None = None,
) -> dict[str, str]:
    """RateBasedLimiter / ThrottleWriter analog for streaming reads:
    built-in source throttles (RateBasedLimiter.java:29,
    gobblin-core/.../writer/ThrottleWriter.java:44)."""
    opts: dict[str, str] = {}
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return opts
