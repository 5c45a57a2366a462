"""Training-data mixing: sample a corpus to target per-domain
proportions, and assign documents to fixed-token packs — the two
dataset-assembly steps between "cleaned corpus" and "training run".

No reference analog (Gobblin stops at ingestion); this is part of the
LLM-pipeline surface the engine adds on top. Related reference
machinery: per-dataset sampling knobs (SamplingConverter,
gobblin-core-base/.../converter/SamplingConverter.java) and dataset
partitioning (WriterPartitioner) — mixing composes the same ideas
corpus-wide.

100 TB design:
- Domain inventory is a tiny aggregate (one map-side-combined groupBy
  over the domain column, ~thousands of rows); the per-domain sample
  fraction joins back via BROADCAST, so the corpus itself is never
  shuffled — sampling is a scan + filter.
- Sampling is DETERMINISTIC (md5-prefix of the id vs a per-domain
  hex threshold): re-runs pick the same rows, adding a domain doesn't
  reshuffle others, and the oracle can reproduce the choice exactly.
- Pack assignment is a cumulative sum window per (domain, shard) —
  one shuffle on the partition key; packs never cross shards, so at
  1000 executors each shard packs independently.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def _hex_threshold(fraction: Column) -> Column:
    """fraction in [0,1] → 8-hex-digit lowercase threshold string such
    that P(md5_prefix < threshold) == fraction. String comparison keeps
    the whole predicate engine-portable (Spark hex() is uppercase,
    DuckDB to_hex lowercase — both sides lower + lpad to 8)."""
    scaled = F.floor(F.least(fraction, F.lit(1.0)) * F.lit(4294967296.0)).cast("long")
    # fraction >= 1 scales to 2^32 = 9 hex digits, which lpad would
    # TRUNCATE to a tiny threshold; 'g' sorts above every hex prefix.
    return F.when(fraction >= 1.0, F.lit("g")).otherwise(
        F.lpad(F.lower(F.hex(scaled)), 8, "0")
    )


def domain_stats(df: DataFrame, domain_col: str = "source",
                 weight_col: str | None = None) -> DataFrame:
    """Per-domain inventory: document count and total weight (tokens /
    chars / bytes). The planning input for mixture design."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    return df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(w).cast("long").alias("weight"),
    )


def sample_mixture(
    df: DataFrame,
    targets: Mapping[str, float],
    budget: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministically sample ~``budget`` documents in the proportions
    of ``targets`` (domain → relative weight; normalized internally).
    Domains absent from ``targets`` are dropped. Per-domain fraction is
    ``budget * share / domain_count`` capped at 1.0 (undersized domains
    contribute everything they have — no upsampling).

    Plan shape: tiny groupBy(domain) inventory → broadcast join of the
    per-domain threshold → md5-prefix filter. The corpus is never
    shuffled and never collected."""
    if not targets or any(w < 0 for w in targets.values()) \
            or sum(targets.values()) <= 0:
        raise ValueError(
            "targets must be a non-empty mapping of non-negative "
            "weights with a positive sum")
    total_w = float(sum(targets.values()))
    from gobblin_spark.session import local_rows_df

    # LocalRelation (see local_rows_df): this few-row target table is
    # only ever broadcast-joined — the python-RDD form launched python
    # workers just to build the broadcast side
    tgt = local_rows_df(
        df.sparkSession,
        [(d, w / total_w) for d, w in sorted(targets.items())],
        f"{domain_col} string, _share double",
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_cnt"))
    frac = counts.join(tgt, domain_col).select(
        domain_col,
        _hex_threshold(F.lit(float(budget)) * F.col("_share") / F.col("_cnt")).alias(
            "_thresh"
        ),
    )
    return (
        df.join(F.broadcast(frac), domain_col)
        .filter(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < F.col("_thresh"))
        .drop("_thresh")
    )


def mixture_report(
    sampled: DataFrame, targets: Mapping[str, float], domain_col: str = "source"
) -> DataFrame:
    """Achieved vs requested share per domain — the audit artifact a
    mixture job publishes next to the sampled corpus."""
    total_w = float(sum(targets.values()))
    from gobblin_spark.session import local_rows_df

    # LocalRelation (see local_rows_df): few-row join side, python-RDD
    # form launched python workers to build it
    tgt = local_rows_df(
        sampled.sparkSession,
        [(d, w / total_w) for d, w in sorted(targets.items())],
        f"{domain_col} string, requested_share double",
    )
    got = sampled.groupBy(domain_col).agg(F.count(F.lit(1)).alias("docs"))
    # driver-side action on a tiny aggregate (one row: the domain-count
    # sum) — O(domains) input, fine at any corpus scale
    total = got.agg(F.sum("docs")).first()[0] or 1
    return (
        got.join(tgt, domain_col, "right")
        .select(
            domain_col,
            F.coalesce(F.col("docs"), F.lit(0)).alias("docs"),
            F.round(F.coalesce(F.col("docs"), F.lit(0)) / F.lit(float(total)), 4).alias(
                "achieved_share"
            ),
            F.round("requested_share", 4).alias("requested_share"),
        )
    )


def pack_assignments(
    df: DataFrame,
    token_col: str,
    seq_len: int,
    order_col: str = "doc_id",
    shard_col: str | None = None,
    n_shards: int = 256,
    allow_global: bool = False,
) -> DataFrame:
    """Assign each document to a fixed-token-budget pack: documents are
    laid out in ``order_col`` order within a shard and cut into
    consecutive bins of ``seq_len`` tokens — the distributed form of
    greedy sequence packing. Oversized documents (> seq_len) still get
    a deterministic pack via their cumulative position.

    Sharding is MANDATORY at scale: an unpartitioned ordered window
    pulls the entire corpus through one reducer. With ``shard_col=None``
    a deterministic hash shard ``pack_shard = pmod(xxhash64(order_col),
    n_shards)`` is derived (stable across runs; adding documents only
    perturbs their own shard), and pack identity is (pack_shard,
    pack_id). ``allow_global=True`` is the explicit escape hatch for
    driver-scale inputs that genuinely need one global order.

    Adds ``pack_id`` (bin ordinal within shard) and ``pack_offset``
    (tokens before this doc within its running total). One window
    shuffle on the shard key; packs never span shards."""
    from pyspark.sql.window import Window

    if shard_col is not None:
        w = Window.partitionBy(shard_col).orderBy(order_col)
    elif allow_global:
        w = Window.orderBy(order_col)
    else:
        df = df.withColumn(
            "pack_shard",
            F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards)).cast("int"),
        )
        w = Window.partitionBy("pack_shard").orderBy(order_col)
    # ROWS frame: the default RANGE frame makes duplicate order
    # values PEERS sharing one cum — tied docs would get identical
    # (overlapping) pack positions and packs silently overflow
    # seq_len (audit r8). order_col must be unique within a shard
    # for deterministic packing (ids and shuffle_pos both are).
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(
        "pack_id", F.floor((cum - F.col(token_col)) / F.lit(seq_len)).cast("int")
    ).withColumn(
        "pack_offset", ((cum - F.col(token_col)) % F.lit(seq_len)).cast("int")
    )


def length_histogram(
    df: DataFrame,
    len_col: str = "n_chars",
    group_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Power-of-two length histogram per group: (group..., bucket,
    n_docs, total_chars) where bucket = floor(log2(len)) for len ≥ 1
    and -1 for empty. The corpus-composition report every training-data
    pipeline prints before sampling (token budgets per length band).

    bucket is computed as length(bin(len)) - 1 — integer-exact, unlike
    floor(log2(x)) whose last-ulp behavior differs between engines'
    libm. One groupBy; output is |groups|·64 rows at most."""
    c = F.col(len_col)
    # null lengths land in the documented -1 'empty' bucket, not an
    # undocumented null group (audit r8)
    bucket = F.when(c.isNull() | (c <= 0), F.lit(-1)).otherwise(
        (F.length(F.bin(c)) - F.lit(1)).cast("int")
    )
    return (
        df.withColumn("bucket", bucket)
        .groupBy(*group_cols, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.greatest(c, F.lit(0))).alias("total_chars"),
        )
    )


def shuffle_seeded(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    n_shards: int = 256,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    (shard, position) from a seeded hash of its id — change the seed
    string, get an independent permutation (one per training epoch);
    re-run the job, get the identical order. The conventional
    alternative (orderBy(rand())) is neither reproducible nor
    restartable.

    Sharded like ``pack_assignments``: position is a row_number within
    a shard derived from the SEEDED key (audit-r7: an id-only shard
    kept every cross-shard pair in the same relative order across
    epochs — shard-major readers got correlated epoch orders, not
    independent permutations), so no single reducer ever sees the
    whole corpus — consumers read shards in order (shard-major,
    position-minor) for the global permutation. ``hash_fn='md5'``
    swaps the order key to md5(seed || ':' || id), slower but
    reproducible by any SQL engine for oracle checks.
    """
    from pyspark.sql.window import Window

    if hash_fn == "xxhash64":
        key = F.xxhash64(F.lit(seed), F.col(id_col))
        shard = F.pmod(key, F.lit(n_shards))
    elif hash_fn == "md5":
        key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                             F.col(id_col).cast("string")))
        shard = (F.conv(F.substring(key, 1, 15), 16, 10)
                 .cast("long") % n_shards)
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    w = Window.partitionBy("shuffle_shard").orderBy("_key", id_col)
    return (
        df.withColumn("_key", key)
        .withColumn("shuffle_shard", shard.cast("int"))
        .withColumn("shuffle_pos", F.row_number().over(w).cast("long"))
        .drop("_key")
    )


def pack_manifest(
    assignments: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    shard_col: str = "pack_shard",
    order_col: str | None = None,
) -> DataFrame:
    """Materialize the per-pack manifest a sequence-packing writer
    consumes: for each (shard, pack) the member docs IN ORDER, their
    count, and the token total. This is the metadata a 100 TB packing
    job actually ships to writers — the concatenation itself then
    streams doc payloads in manifest order without any further
    shuffle. One groupBy on the (shard, pack) key; doc order inside a
    pack is rebuilt via array_sort over the ORDER the cumulative sum
    was computed in (collect_list order is not deterministic across
    retries) — pass the pack_assignments ``order_col`` when it differs
    from ``id_col``, or pack_offset and manifest order disagree and a
    writer streaming in manifest order lays docs at each other's
    offsets (audit r8)."""
    okey = F.col(order_col if order_col else id_col)
    ids_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct(
            okey.alias("_o"), F.col(id_col).alias("_i")))),
        lambda s: s["_i"])
    return (
        assignments.groupBy(shard_col, "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("pack_tokens"),
            F.concat_ws(
                ",",
                F.transform(ids_sorted, lambda x: x.cast("string")),
            ).alias("doc_ids"),
        )
    )


def assign_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by md5 hex prefix —
    the content-stable holdout split of a training-data pipeline
    (re-running over a GROWN corpus never moves an existing document
    between splits, which leakage audits depend on).

    The first two hex chars of md5(id) give 256 uniform buckets;
    fractions quantize to 1/256 granularity (floor). Comparison is on
    the HEX STRING (lowercase in every md5 implementation), so any
    engine reproduces the assignment without integer-conversion
    builtins. Pure narrow projection: no shuffle, no RNG, no state.
    """
    if not (0 < train < 1 and 0 <= val < 1 and train + val < 1):
        raise ValueError("need 0<train, 0<=val, train+val<1")
    b_train = format(int(256 * train), "02x")
    b_val = format(int(256 * (train + val)), "02x")
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    # null ids get a NULL split — visible in any split audit — rather
    # than silently inflating 'test' through the otherwise() branch
    # (audit r8)
    return df.withColumn(
        split_col,
        F.when(F.col(id_col).isNull(), F.lit(None).cast("string"))
        .when(bucket < F.lit(b_train), F.lit("train"))
        .when(bucket < F.lit(b_val), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    target_total: int,
    split_hex_chars: int = 8,
) -> DataFrame:
    """Temperature-weighted source rebalancing (T=2 ⇒ weights ∝
    sqrt(n_s) — the multilingual/multi-source mixing rule of
    mT5/XLM-R-style pipelines): abundant sources are downsampled
    harder than rare ones, targeting ``target_total`` rows overall.

    Everything that decides a row's fate is INTEGER arithmetic, so any
    engine reproduces the exact same kept-set:
    - weight_s   = floor(sqrt(n_s) * 1000)    (bigint; sqrt is
      IEEE-correctly-rounded, the only float op, and its floor is
      boundary-safe: perfect squares hit integers exactly)
    - threshold_s = target * weight_s * 16**split_hex_chars
      // (Σ weights * n_s)   (pure bigint floor division)
    - keep row  ⇔ first ``split_hex_chars`` md5 hex chars of the id,
      parsed base-16, < threshold_s   (uniform bucket, content-stable
      like assign_split — rerunning over a grown corpus never flips an
      existing row's fate for the same thresholds)

    Granularity is 16**-split_hex_chars of a source: the old 4-char
    default floored keep-fractions below 2^-16 to ZERO, silently
    emptying abundant sources at 100 TB scales (audit r8) — 8 chars
    (2^-32, sample_mixture's width) makes that unreachable in
    practice.

    A threshold ≥ 16**split_hex_chars keeps the whole source (rare sources saturate
    instead of upsampling — deterministic sampling cannot mint rows;
    callers wanting true upsampling repeat epochs, cf. pack/shuffle).
    Per-source counts collect to the driver (bounded by source
    cardinality) and ship back as a broadcast threshold table; the
    corpus itself is one scan + one broadcast join.
    """
    import math

    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("_n")).collect()
    # null sources cannot join a threshold row — exclude them
    # explicitly (they used to crash the driver-side sorted())
    counts = [r for r in counts if r[source_col] is not None]
    weights = {r[source_col]: int(math.floor(math.sqrt(r["_n"]) * 1000))
               for r in counts}
    ns = {r[source_col]: r["_n"] for r in counts}
    sum_w = sum(weights.values())
    spark = df.sparkSession
    # Scale matches the bucket width: split_hex_chars md5 hex chars
    # parse to a value in [0, 16**split_hex_chars).
    scale = 16 ** split_hex_chars
    thr_rows = [
        (s, (target_total * weights[s] * scale) // (sum_w * ns[s]))
        for s in sorted(ns)
    ]
    # LocalRelation (see local_rows_df): this per-source threshold
    # table is only ever broadcast-joined — the python-RDD form
    # launched python workers just to build the broadcast side
    from gobblin_spark.session import local_rows_df

    thr = local_rows_df(
        spark, thr_rows, f"{source_col} string, _gs_threshold long")
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, split_hex_chars),
        16, 10,
    ).cast("long")
    # the broadcast bookkeeping column is dropped: leaking it polluted
    # the caller's schema and collided with real columns (audit r8)
    return (
        df.join(F.broadcast(thr), source_col)
        .filter(bucket < F.col("_gs_threshold"))
        .drop("_gs_threshold")
    )
