"""Temporal joins Spark's API lacks as primitives: AS-OF join and
interval RANGE join, both composed from shuffle-friendly DataFrame ops.

No reference analog (Gobblin stops at ingestion); the semantics are
the standard streaming/timeseries definitions (DuckDB `ASOF JOIN`,
pandas `merge_asof`, KDB `aj`) — which also makes them exactly
oracle-checkable.

100 TB design:
- as-of join: ONE shuffle on the join key. Both sides project to slim
  rows, union, and a single `last(ignorenulls)` window ordered by
  (ts, side) propagates the most recent right-side payload onto every
  left row. No per-row lookups, no broadcast requirement, no range
  explosion; skew on the key behaves like any keyed window (salt the
  key upstream if one key dominates).
- range join: equi-join on a coarse time BUCKET before the interval
  predicate. A naive `l.ts BETWEEN r.lo AND r.hi` join has no equi
  condition and plans as BroadcastNestedLoopJoin (quadratic); with
  bucketing each interval lands in ceil(span/bucket)+1 buckets and the
  join is hash-partitioned, with the exact predicate applied after.
  Bucket width trades duplication (long intervals) against selectivity
  (short buckets) — pass the p95 interval span.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the right row with the largest
    ``on`` <= left.``on`` (direction='backward'; 'forward' takes the
    smallest >=), matching within ``by`` groups — `merge_asof` /
    DuckDB `ASOF JOIN` semantics, including: right rows at EXACTLY the
    left timestamp match, and left rows with no candidate keep nulls.

    Single-shuffle plan: union(left ⊕ tagged right) → window
    ``last(value, ignorenulls=True)`` partitioned by ``by`` ordered by
    (on, side) → keep left rows. Right payload columns come back
    suffixed when they collide with left names."""
    by = list(by or [])
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    payload = [c for c in right.columns if c not in by and c != on]
    if not payload:
        raise ValueError("right side has no payload columns")
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}

    # side orders ties: right rows sort BEFORE left rows at the same ts
    # so an exact-timestamp right row is visible to that left row.
    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in payload) + ">"))
    rhs_cols = [F.col(c) for c in by] + [F.col(on), F.lit(0).alias("_side"),
                F.struct(*payload).alias("_payload")]
    for c in left.columns:
        if c not in by and c != on:
            rhs_cols.append(F.lit(None).cast(dict(left.dtypes)[c]).alias(c))
    rhs = right.select(*rhs_cols)

    unioned = lhs.unionByName(rhs)
    order = [F.col(on).asc(), F.col("_side").asc()] if direction == "backward" \
        else [F.col(on).desc(), F.col("_side").asc()]
    w = (Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = unioned.withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1)
    for c in payload:
        out = out.withColumn(out_names[c], F.col("_m")[c])
    return out.drop("_side", "_payload", "_m")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    by: list[str] | None = None,
    bucket: Column | int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose ``left_ts`` falls in [right_lo, right_hi]
    (inclusive both ends), optionally also matching ``by`` keys.

    ``bucket`` (seconds, for timestamp columns; same unit as the
    columns for numerics) sets the coarse equi-join grid: each right
    interval is exploded to the buckets it covers via ``sequence``,
    each left row maps to one bucket, and the exact BETWEEN applies
    after the hash join. how='inner' or 'left' (unmatched left rows
    null-filled via a distinct-on-left anti pattern)."""
    by = list(by or [])
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how {how!r}")

    def to_bucket(c: Column) -> Column:
        dt = F.lit(bucket)
        num = F.unix_timestamp(c) if dict(left.dtypes).get(left_ts, "").startswith(
            "timestamp") or dict(right.dtypes).get(right_lo, "").startswith(
            "timestamp") else c
        return F.floor(num / dt).cast("long")

    lb = left.withColumn("_lb", to_bucket(F.col(left_ts)))
    rb = right
    for c in by:  # disambiguate the equality keys before the join
        rb = rb.withColumnRenamed(c, f"_r_{c}")
    rb = rb.withColumn(
        "_bs",
        F.sequence(to_bucket(F.col(right_lo)), to_bucket(F.col(right_hi))),
    ).withColumn("_rb", F.explode("_bs")).drop("_bs")

    cond = F.col("_lb") == F.col("_rb")
    for c in by:
        cond = cond & (F.col(c) == F.col(f"_r_{c}"))
    cond = cond & F.col(left_ts).between(F.col(right_lo), F.col(right_hi))
    # how='left' is the SAME bucketed join run as an outer join: the
    # bucket equality keeps it hash-partitioned (the BETWEEN rides as
    # the join's extra condition), unmatched left rows null-fill, and
    # a left row matching k intervals emits k rows — matching each
    # interval's ONE bucket-equal copy, so the explode never
    # duplicates a pair. (audit-r7: the previous anti-join rebuild of
    # unmatched rows compared all left columns with null-unsafe
    # equality, so a matched left row containing ANY null came back a
    # second time null-filled — and cost a second full-width join.)
    joined = lb.join(rb, cond, how).drop(
        "_lb", "_rb", *[f"_r_{c}" for c in by])
    return joined


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_distance: int = 3,
) -> DataFrame:
    """Blocked fuzzy self-match: pairs whose ``text_col`` values are
    within ``max_distance`` Levenshtein edits, candidates drawn ONLY
    from equal ``block_cols`` — the entity-resolution primitive
    (dedup of titles/names/addresses) a data-integration engine owes
    its users.

    Blocking is what scales it: the quadratic edit-distance step runs
    within a block's hash partition, so cost is Σ|block|², not
    |corpus|² — choose block keys (phonetic code, length band,
    sorted-token prefix) so blocks stay executor-sized; recall is
    bounded by the blocking scheme, the standard ER trade (Fellegi-
    Sunter blocking). Levenshtein itself is JVM codegen on both
    engines, making the operator fully oracle-able.

    Returns (id_a, id_b, distance), id_a < id_b, distance exact int.
    """
    slim = df.select(
        F.col(id_col), F.col(text_col).alias("_t"), *block_cols)
    a = slim.select(
        F.col(id_col).alias("id_a"), F.col("_t").alias("ta"), *block_cols)
    b = slim.select(
        F.col(id_col).alias("id_b"), F.col("_t").alias("tb"), *block_cols)
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        # length band first: |len(a)-len(b)| > k already proves
        # distance > k — a one-instruction filter that skips the
        # O(len·k) DP for most pairs in the block (audit r9)
        .filter(F.abs(F.length("ta") - F.length("tb"))
                <= F.lit(max_distance))
        # thresholded levenshtein: Spark's banded DP early-exits past
        # max_distance (returns -1) instead of computing the full
        # matrix — same results, the block's hot loop gets cheaper
        .withColumn("distance",
                    F.levenshtein("ta", "tb", max_distance))
        .filter((F.col("distance") >= 0)
                & (F.col("distance") <= max_distance))
        .select("id_a", "id_b", "distance")
    )
