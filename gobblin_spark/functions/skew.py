"""Skew tooling: heavy-hitter detection and salted two-phase aggregation.

Reference context: Gobblin sizes work units by bin-packing record-count
estimates (gobblin-api/.../workunit/WorkUnitBinPacker.java:25,
KafkaBiLevelWorkUnitPacker.java:56) because a hot topic-partition
otherwise dominates a container. On Spark the same hot-key problem hits
shuffles: one reducer gets the heavy key. AQE's skew-join splitting
covers JOINS automatically (session.py enables it); aggregations over a
pathological key still funnel into a single task — these helpers cover
that case explicitly.

- ``heavy_hitters``: sampled frequency probe (one cheap pass over a
  fraction) returning keys whose estimated share exceeds a threshold.
- ``salted_agg``: two-phase aggregation — phase 1 groups by
  (key, salt) spreading each hot key over ``salts`` reducers, phase 2
  merges the partials by key. Correct for any algebraic aggregate
  expressed as (partial_exprs, merge_exprs) pairs; helpers provided for
  count/sum/min/max.

When to use: only when a KNOWN pathological key distribution exists
(web crawl domains, null-ish defaults). For ordinary skew, AQE +
map-side partial aggregation already handle it — salting every
aggregation would just double the shuffle count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def heavy_hitters(
    df: DataFrame,
    key_cols: Sequence[str],
    min_share: float = 0.01,
    sample_fraction: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """Estimate heavy keys from a sample: keys with ≥ *min_share* of the
    sampled rows. One pass over ``sample_fraction`` of the data; output
    is a tiny (key, est_share) frame, broadcastable into a routing
    decision (e.g. salt only these keys)."""
    s = df.select(*key_cols).sample(False, sample_fraction, seed)
    total = s.count()
    if total == 0:
        return df.select(*key_cols).limit(0).withColumn("est_share", F.lit(0.0))
    return (
        s.groupBy(*key_cols)
        .agg((F.count(F.lit(1)) / F.lit(float(total))).alias("est_share"))
        .filter(F.col("est_share") >= min_share)
    )


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: Sequence[tuple[Column, str, Column]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` is a list of (partial_agg_expr, partial_name, merge_expr)
    where ``merge_expr`` references ``F.col(partial_name)``. Example —
    count and sum:

        salted_agg(df, ["k"], [
            (F.count(F.lit(1)), "_c", F.sum("_c").alias("n")),
            (F.sum("v"),        "_s", F.sum("_s").alias("sum_v")),
        ])

    Phase 1 shuffles on (key, salt) — a key's rows spread over *salts*
    reducers; phase 2 shuffles only the ``salts``-per-key partial rows.
    Total shuffle bytes barely change; the single-reducer hot spot
    disappears."""
    salt = (F.rand(42) * salts).cast("int")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[expr.alias(name) for expr, name, _ in aggs])
    )
    return phase1.groupBy(*key_cols).agg(*[merge for _, _, merge in aggs])


def salted_count_sum(
    df: DataFrame, key_cols: Sequence[str], value_col: str, salts: int = 16
) -> DataFrame:
    """The common case: skew-safe count + sum per key."""
    return salted_agg(
        df,
        key_cols,
        [
            (F.count(F.lit(1)), "_c", F.sum("_c").alias("n")),
            (F.sum(value_col), "_s", F.sum("_s").alias(f"sum_{value_col}")),
        ],
        salts=salts,
    )


def salt_join_key(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Manual salted join prep for when AQE skew splitting is
    unavailable (e.g. a broadcast won't fit and one key dominates):
    the big side gets a random salt; the small side is replicated
    ``salts`` times so every (key, salt) pair can match. Join on the
    returned key list. Shuffle of the small side grows x salts — use
    only for genuinely skewed joins."""
    big_s = big.withColumn("_salt", (F.rand(42) * salts).cast("int"))
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return big_s, small_s, [key, "_salt"]
