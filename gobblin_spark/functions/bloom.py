"""Bloom-filter sketch as a DataFrame: build, probe, incremental dedup.

The 100 TB pattern this enables: deduplicating a NEW ingest batch
against a huge HISTORICAL corpus without shuffling the corpus. The
corpus is folded once into a compact bit-array sketch (``num_bits``
bits ≈ num_bits/8 bytes regardless of corpus size); the sketch is
broadcast and the new batch probes it map-side. Rows failing any probe
are *definitely* unseen and pass through with zero further work; only
the (few) rows passing every probe — true repeats plus the false-
positive tail — go through an exact anti-join, so the final output is
EXACT, not approximate. With a 1%-FP sketch, the exact join's left side
shrinks ~100x versus anti-joining the whole batch.

Reference semantics: Gobblin's record-level dedup relies on full
compaction (AvroKeyDedupReducer.java:89 keep-one-per-key over the whole
dataset); this module is the streaming/incremental complement a
training-data pipeline needs when "the whole dataset" is 100 TB.

Spark design notes:
- The sketch is a DataFrame ``(word_idx int, bits long)`` — only words
  with at least one set bit are materialized, built by ONE groupBy with
  ``bit_or`` (map-side combined). No driver collect, no UDF.
- Probing explodes each row into its k bit positions and broadcast-joins
  the sketch: k·|new| slim rows against ≤ num_bits/64 sketch rows.
- k hash positions use Kirsch-Mitzenstein double hashing
  h1 + i·h2 (mod num_bits) with both hashes pre-folded below 2^31 so
  the ANSI-mode int64 arithmetic cannot overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_FOLD = (1 << 31) - 1  # keep h1 + i*h2 far below int64 overflow


def _positions(col: Column | str, num_bits: int, k: int, seed: int,
               base_hash: str = "xxhash64") -> Column:
    """Array of k bit positions for a value (double hashing).

    ``base_hash='md5_60'`` swaps xxhash64 for two 60-bit slices of the
    value's md5 hex (chars 1-15 and 17-31) — engine-portable, so an
    external SQL engine (``CAST('0x' || substr(md5(v),1,15) AS
    BIGINT)``) reproduces every position bit-for-bit; ``seed`` is
    ignored on that path. Same pattern as dedup.md5_60."""
    c = F.col(col) if isinstance(col, str) else col
    if base_hash == "md5_60":
        m = F.md5(c.cast("string"))
        h1 = F.pmod(
            F.conv(F.substring(m, 1, 15), 16, 10).cast("long"),
            F.lit(_FOLD))
        h2 = F.pmod(
            F.conv(F.substring(m, 17, 15), 16, 10).cast("long"),
            F.lit(_FOLD - 1)) + F.lit(1)
    else:
        h1 = F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(_FOLD))
        # +1 keeps h2 nonzero so the k probes never collapse to one
        h2 = F.pmod(F.xxhash64(c, F.lit(seed + 1)),
                    F.lit(_FOLD - 1)) + F.lit(1)
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)) for i in range(k)]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 22,
    k: int = 5,
    seed: int = 42,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Fold ``df[col]`` into a Bloom sketch DataFrame (word_idx, bits).

    One explode to (row → k positions), one groupBy(word_idx) with a
    ``bit_or`` of single-bit masks — the partial aggregation collapses
    the sketch map-side, so the shuffle carries at most
    min(|input|·k, num_bits/64) slim rows."""
    pos = df.select(F.explode(
        _positions(col, num_bits, k, seed, base_hash)).alias("pos"))
    # md5_60 hashes a NULL key to NULL positions (md5(NULL) is NULL) —
    # drop them rather than emit a junk (NULL, NULL) sketch word; the
    # probe side routes null keys to the exact anti-join instead
    pos = pos.where(F.col("pos").isNotNull())
    return (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # F.shiftleft only accepts a literal shift — expr() for the
            # column-valued bit offset
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_split(
    new_df: DataFrame,
    sketch: DataFrame,
    col: str,
    num_bits: int = 1 << 22,
    k: int = 5,
    seed: int = 42,
    base_hash: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """Split ``new_df`` into (definitely_unseen, maybe_seen) by probing
    the broadcast sketch. A row is maybe_seen iff ALL k probed bits of
    its value are set; one missing bit proves the value was never
    inserted. Membership depends only on the VALUE, so the probe runs
    once per distinct value and the verdict joins back — duplicate rows
    keep their multiplicity and the k-way explode never touches the
    full batch."""
    vals = new_df.select(col).distinct()
    probes = vals.withColumn(
        "_pos", F.explode(_positions(col, num_bits, k, seed, base_hash))
    ).withColumn("_word_idx", (F.col("_pos") / 64).cast("int"))
    joined = probes.join(
        F.broadcast(sketch), probes["_word_idx"] == sketch["word_idx"], "left"
    )
    bit_set = (
        F.coalesce(F.col("bits"), F.lit(0))
        .bitwiseAND(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))")
        )
        != 0
    )
    verdict = (
        joined.withColumn("_hit", bit_set.cast("int"))
        .groupBy(col)
        # a NULL verdict happens only for a NULL key on the md5_60
        # path (md5(NULL) is NULL, so every probe is NULL and the sum
        # over the group is NULL). Coalescing to maybe_seen=True keeps
        # the row flowing — the exact eqNullSafe anti-join downstream
        # settles null-vs-history membership — where a NULL verdict
        # would fail BOTH filters below and silently drop the row.
        .agg(F.coalesce(F.sum("_hit") == F.lit(k),
                        F.lit(True)).alias("_maybe"))
    )
    # eqNullSafe: a plain equi-join would silently drop null-valued rows
    flagged = new_df.join(
        verdict.withColumnRenamed(col, "_vcol"),
        new_df[col].eqNullSafe(F.col("_vcol")),
    ).drop("_vcol")
    unseen = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    return unseen, maybe


def bloom_incremental_dedup(
    new_df: DataFrame,
    history_df: DataFrame,
    col: str,
    num_bits: int = 1 << 22,
    k: int = 5,
    seed: int = 42,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """EXACT rows of ``new_df`` whose ``col`` never appears in
    ``history_df``, without shuffling history against the full batch:
    sketch-prefilter (cheap, broadcast) then an exact anti-join over
    only the maybe-seen sliver (true repeats + ~FP-rate of the batch).
    """
    sketch = bloom_build(history_df, col, num_bits, k, seed, base_hash)
    unseen, maybe = bloom_split(new_df, sketch, col, num_bits, k, seed,
                                base_hash)
    # eqNullSafe anti (audit-r7): the name-based anti-join can never
    # match null to null, so a null value PRESENT in history slipped
    # through — violating "exact" for nullable key columns
    hist_vals = history_df.select(F.col(col).alias("_hv")).distinct()
    verified = maybe.join(
        hist_vals, maybe[col].eqNullSafe(F.col("_hv")), "left_anti"
    )
    return unseen.unionByName(verified)
