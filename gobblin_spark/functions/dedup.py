"""Document deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

These are the training-data-pipeline dedup families, built Spark-first:

- Exact: fingerprint (md5 of normalized text) → hash groupBy. One
  shuffle keyed on a 128-bit digest; at 100 TB the shuffle carries only
  (fingerprint, doc_id), not document bodies.
- N-gram Jaccard: shingle → inverted-index self-join on shingle →
  per-pair intersection counts → |A∩B|/(|A|+|B|-|A∩B|). Exact but
  quadratic in docs-per-shingle; use for verification and small/medium
  corpora, or as the re-rank stage after LSH candidate generation.
- MinHash+LSH: k permutation min-hashes over shingles, banded into b
  bands of r rows (k = b·r); equal band-hash → candidate pair; candidates
  verified by signature agreement (estimated Jaccard). Scale path:
  candidate generation is a groupBy on (band, band_hash) — linear, no
  all-pairs anywhere.
- SimHash: 64-bit sign-aggregated token-hash fingerprint; near-dups =
  Hamming distance ≤ t, found by pigeonhole banding (4×16-bit chunks
  catches every pair with distance ≤ 3 without an all-pairs join).

Everything is built-in Column expressions (xxhash64, bitwise ops,
higher-order array functions) — no Python in the hot path. Permutation
parameters use a fixed Mersenne prime so ``a·h + b`` stays within int64
under ANSI arithmetic.

CACHE LIFETIME: the pair-search entry points ``.persist()`` their
signature/shingle tables so candidate generation and verification
share one materialization; the cache lives until the session ends (or
the executor evicts it). A long-lived driver looping over many
corpora should unpersist between runs
(``spark.catalog.clearCache()`` or df-level unpersist) — the persists
here deliberately do not self-unpersist, because the returned
DataFrame is lazy and still depends on them.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F

from gobblin_spark.functions.text import fingerprint, normalize_text, word_shingles
from gobblin_spark.session import ensure_parallelism

MERSENNE_P = (1 << 31) - 1  # 2^31-1, prime; keeps a*h+b < 2^62 (no int64 overflow)


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact near-identical dedup: keep the min-id doc per fingerprint.

    Returns (kept id, fingerprint, dup_count). Single hash shuffle on the
    digest; map-side partial aggregation applies.

    Null-text documents have no content to compare — md5(null) is null
    and grouping on it would collapse *distinct* empty docs into one
    survivor. They pass through as singletons (fp null, dup_count 1)
    instead of being deduped away.
    """
    base = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    # ONE scan + ONE shuffle: null-fp rows get a unique synthetic group
    # key ("\0id:<id>" cannot collide with 32-hex digests), so they come
    # out as singleton groups instead of needing a second filtered scan
    # unioned back in (the old shape read the text column twice).
    gk = F.coalesce(
        F.col("fp"), F.concat(F.lit("\0id:"), F.col(id_col).cast("string"))
    )
    return (
        base.groupBy(gk.alias("_gk"))
        .agg(
            F.min(id_col).alias(id_col),
            # fp is constant within a group (it IS the key, or null):
            # min == first but keeps the aggregate hash-based instead of
            # forcing a SortAggregate
            F.min("fp").alias("fp"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "fp", "dup_count")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard ≥ threshold).

    Inverted-index join: explode distinct shingles, self-join on shingle,
    count co-occurrences, combine with per-doc shingle counts. The join
    key is the shingle (high cardinality → well-distributed shuffle);
    hot shingles are the skew risk — a shingle shared by d documents
    contributes d² join rows, so a single stop-shingle in 1M docs means
    10^12 rows. ``max_doc_freq`` caps that: shingles appearing in more
    than that many documents are dropped from the *intersection* count
    only (per-doc sizes keep them, so Jaccard becomes a conservative
    lower bound — pairs are never over-reported). At scale this operator
    is the re-rank stage after MinHash/LSH candidate generation, with
    ``max_doc_freq`` as the mandatory guardrail — it is therefore ON by
    default (1000); pass ``None`` to disable for exact small-corpus runs.
    """
    slim = ensure_parallelism(df.select(id_col, text_col))
    # deliberately NOT persisted (re-adjudicated r14, verdict-r13 #5):
    # the shingle projection textually feeds 4+ consumers and the
    # AQE-final plan shows NO runtime exchange reuse (each consumer
    # re-runs the narrow tokenize+shingle codegen — see
    # plans/r14/ngram_jaccard_docs_ledger.txt). An arm-alternating
    # persist-vs-recompute A/B at sf0.1 now has persist at 0.91x
    # (1.40 vs 1.54 s; the r13 block A/B said 1.19x the other way —
    # warming bias), but the ~9% local win materializes a
    # CORPUS-SIZED intermediate: unlike the slim tf-idf/signature
    # tables this repo persists, the shingle table is bigger than its
    # input, and at 100 TB memory+disk-persisting it costs far more
    # than the extra streaming scans it saves. Recompute stays.
    # NOT digest-keyed, unlike the span/line dedup shuffles: an A/B at
    # sf0.1 showed unhex(md5(shingle)) keys leave shuffle bytes FLAT
    # (5.8 vs 5.9 MB) while adding md5 CPU — natural-language shingles
    # lz4-compress about as small as an incompressible 16-byte digest
    sh = word_shingles(slim, text_col, n).select(id_col, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    if max_doc_freq is not None:
        doc_freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        keep = doc_freq.filter(F.col("_df") <= max_doc_freq).select("shingle")
        sh = sh.join(keep, "shingle")

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        # threshold the TRUE similarity; rounding first admitted pairs
        # strictly below it (0.7999996 rounds to 0.8 — audit r8). The
        # displayed value stays rounded for engine-portable hashing.
        .filter(jac >= threshold)
        .withColumn("jaccard", F.round(jac, 6))
        .select("id_a", "id_b", "jaccard")
    )


def _permutation_params(k: int, seed: int = 42) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    a = [rng.randrange(1, MERSENNE_P) for _ in range(k)]
    b = [rng.randrange(0, MERSENNE_P) for _ in range(k)]
    return a, b


def md5_60(col: Column | str) -> Column:
    """60-bit integer hash: first 15 hex chars of md5, parsed base-16.

    ~2-3x slower than xxhash64 but REPLICABLE BY ANY ENGINE (DuckDB:
    ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``) — the cross-engine
    verification hash. 60 bits keeps the value signed-int64-positive on
    both sides; use it when an external oracle must reproduce signatures
    bit-for-bit, xxhash64 everywhere else."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _base_hash(col: Column | str, kind: str) -> Column:
    if kind == "xxhash64":
        return F.xxhash64(col)
    if kind == "md5_60":
        return md5_60(col)
    raise ValueError(f"unknown base_hash: {kind}")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    seed: int = 42,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Per-doc MinHash signature: array<num_perm> of min permuted hashes.

    Base hash = xxhash64(shingle) folded into [0, P); permutation i is
    (a_i·h + b_i) mod P. All JVM-side: one explode + one groupBy with
    ``num_perm`` min() aggregates (map-side combined).
    ``base_hash='md5_60'`` swaps in the engine-portable md5 hash so an
    external SQL oracle can reproduce signatures exactly.
    """
    a_par, b_par = _permutation_params(num_perm, seed)
    sh = word_shingles(ensure_parallelism(df.select(id_col, text_col)), text_col, n)
    # materialize the base hash ONCE per shingle: referencing the
    # xxhash64 expression inside each of the num_perm aggregates would
    # re-hash the string num_perm times (CSE doesn't span aggregates)
    hashed = sh.select(
        id_col, F.pmod(_base_hash("shingle", base_hash), F.lit(MERSENNE_P)).alias("_h")
    )
    # one parsed SQL expression per permutation: the Column-algebra
    # form cost ~6 py4j round trips per term (~0.6 s driver wall per
    # plan build at num_perm=64); parsed trees and results are
    # identical (pinned for both base hashes)
    mins = [
        F.expr(f"min(pmod({a_par[i]} * _h + {b_par[i]}, {MERSENNE_P}))"
               f" AS _m{i}")
        for i in range(num_perm)
    ]
    sig = hashed.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"_m{i}" for i in range(num_perm)]).alias("signature")
    )


def _band_key_array(num_perm: int, bands: int, band_key: str) -> Column:
    """array<bands> of LSH band keys over a ``signature`` column.

    ``xxhash64``: 8-byte keys (production). ``concat``: stringified
    signature values (wider, but reproducible by any SQL engine —
    pair with base_hash='md5_60' for oracle-checked runs)."""
    rows = num_perm // bands
    if band_key not in ("xxhash64", "concat"):
        raise ValueError(f"unknown band_key: {band_key}")

    # one parsed SQL expression for the whole key array (vs ~6 py4j
    # round trips per band in Column form); parsed trees and results
    # are identical for both key kinds (pinned)
    def _bkey(bi: int) -> str:
        if band_key == "xxhash64":
            vals = ", ".join(f"signature[{bi * rows + r}]"
                             for r in range(rows))
            return f"xxhash64({bi}, {vals})"
        cvals = ", ".join(f"CAST(signature[{bi * rows + r}] AS STRING)"
                          for r in range(rows))
        return f"concat_ws('_', CAST({bi} AS STRING), {cvals})"

    return F.expr(
        "array(" + ", ".join(_bkey(bi) for bi in range(bands)) + ")")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    base_hash: str = "xxhash64",
    band_key: str = "xxhash64",
) -> DataFrame:
    """MinHash+LSH near-dup pairs (id_a < id_b, n_agree, est_jaccard ≥
    threshold).

    Banding: signature split into ``bands`` bands of num_perm/bands rows;
    docs sharing any band-hash become candidates (generated by a groupBy
    on (band, hash) — never an all-pairs join). Candidates are scored by
    signature agreement (unbiased Jaccard estimate) and thresholded.

    ``band_key='concat'`` keys bands on the concatenated signature
    values instead of their xxhash64 (a wider shuffle key, but one an
    external SQL engine can reproduce — pair with base_hash='md5_60'
    for a fully oracle-checkable run).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    # The signature table feeds THREE consumers (band explode + two
    # re-attach joins); without a persist each one re-runs the whole
    # shingle→hash→64-min pipeline. Signatures are slim (~0.5 KB/row:
    # id + 64 longs), so MEMORY_AND_DISK holds even at cluster scale —
    # this is the standard LSH shape: materialize signatures once,
    # never the documents.
    sig = minhash_signatures(
        df, id_col, text_col, n, num_perm, seed, base_hash
    ).persist()

    band_hashes = _band_key_array(num_perm, bands, band_key)
    # Candidate generation is SLIM: only (band, bhash, id) is exploded
    # and self-joined — the ~0.5 KB signatures never ride the band
    # shuffle (at 1M docs x 16 bands that's the difference between a
    # ~100 MB and a ~10 GB exchange). Signatures are re-attached by two
    # id-joins only for SURVIVING deduped candidate pairs.
    banded = sig.select(id_col, F.posexplode(band_hashes).alias("band", "bhash"))
    left = banded.select(F.col(id_col).alias("id_a"), "band", "bhash")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "bhash")
    cand = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sig.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sig_b = sig.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    scored = cand.join(sig_a, "id_a").join(sig_b, "id_b")
    return _score_signature_agreement(
        scored, num_perm, threshold, ["id_a", "id_b"])


def minhash_probe_corpus(
    new_df: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    base_hash: str = "xxhash64",
    band_key: str = "xxhash64",
) -> DataFrame:
    """Incremental near-dup: probe a NEW batch of documents against a
    PERSISTED corpus signature table — the standing workflow for a
    growing 100 TB corpus (reference analogue: the incremental-pull
    pattern of QueryBasedSource low/high watermarks, applied to
    near-dup instead of rows; complements ``bloom.py``'s incremental
    EXACT dedup).

    ``corpus_sigs`` is ``minhash_signatures(corpus, ...)`` written
    once and stored (id_col, signature). The corpus TEXT is never
    re-read, re-shingled, or re-shuffled here: the corpus side ships
    only its slim (id, band, bhash) band index, the new batch computes
    signatures for itself alone, and the (band, bhash) equi-join makes
    candidates without any all-pairs step. Signatures re-attach by id
    for surviving candidates only; AQE broadcasts the new-batch side
    when it is small (the common case of a daily increment).

    Returns (new_id, corpus_id, n_agree, est_jaccard ≥ threshold).
    Caller must have built corpus_sigs with the SAME n/num_perm/seed/
    base_hash — signatures from different parameters never match.
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    new_sig = minhash_signatures(
        new_df, id_col, text_col, n, num_perm, seed, base_hash
    ).persist()
    bk = _band_key_array(num_perm, bands, band_key)
    nb = new_sig.select(
        F.col(id_col).alias("new_id"), F.posexplode(bk).alias("band", "bhash")
    )
    cb = corpus_sigs.select(
        F.col(id_col).alias("corpus_id"),
        F.posexplode(bk).alias("band", "bhash"),
    )
    cand = (
        cb.join(nb, ["band", "bhash"])
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    sa = new_sig.select(
        F.col(id_col).alias("new_id"), F.col("signature").alias("sig_a"))
    sb = corpus_sigs.select(
        F.col(id_col).alias("corpus_id"), F.col("signature").alias("sig_b"))
    scored = cand.join(sa, "new_id").join(sb, "corpus_id")
    return _score_signature_agreement(
        scored, num_perm, threshold, ["new_id", "corpus_id"])


def _score_signature_agreement(scored: DataFrame, num_perm: int,
                               threshold: float,
                               id_cols: list[str]) -> DataFrame:
    """Shared MinHash verify: count per-position signature agreement
    between sig_a/sig_b, estimate Jaccard, keep pairs >= threshold.
    ONE implementation so the pair search and the incremental corpus
    probe can never drift apart (their equivalence is property-
    tested)."""
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    est = F.col("n_agree").cast("double") / F.lit(float(num_perm))
    return (
        scored.withColumn("n_agree", agree)
        .filter(est >= threshold)  # true estimate, not the rounded one
        .withColumn("est_jaccard", F.round(est, 6))
        .select(*id_cols, "n_agree", "est_jaccard")
    )


def _simhash_chunk_array(cw: int) -> Column:
    """The 4-chunk pigeonhole key array of a 'simhash' column (cw bits
    per chunk). ONE implementation shared by the pair search and the
    corpus probe — their banding must stay bit-identical for
    batch-vs-incremental parity."""
    return F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), cw * i).bitwiseAND(
                F.lit((1 << cw) - 1)
            )
            for i in range(4)
        ]
    )


def simhash64(
    df: DataFrame,
    id_col: str,
    text_col: str,
    base_hash: str = "xxhash64",
    bits: int = 64,
) -> DataFrame:
    """``bits``-bit SimHash per document over normalized word tokens.

    For each bit position, sum +1/-1 over token hashes; bit = sign.
    Returned as bigint ``simhash`` (with bits=64, bit 63 included —
    value may be negative; it is a fingerprint, not a number).
    ``base_hash='md5_60'`` + ``bits=60`` gives the engine-portable
    variant an external SQL oracle can reproduce bit-for-bit.
    """
    toks = ensure_parallelism(df.select(id_col, text_col)).select(
        id_col, F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    # hash each token ONCE; the per-bit aggregates reference the
    # materialized column (xxhash64 inline would re-hash 64x per token)
    hashed = toks.select(id_col, _base_hash("tok", base_hash).alias("_h"))
    # each aggregate (and the bit-recombine projection) is ONE parsed
    # SQL expression: composing them from Column algebra cost ~8 py4j
    # round trips per term — ~1 s of driver wall per plan build for
    # the 64+64 term lists (guide §1.2: the distributed plan is
    # unchanged; this is per-plan-build driver latency). Parsed trees
    # are value-identical to the Column form (pinned for both base
    # hashes, including the negative bit-63 case).
    bit_sums = [
        F.expr(f"sum(CAST((shiftright(_h, {i}) & 1) * 2 - 1 AS BIGINT))"
               f" AS _b{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    val_sql = " + ".join(
        f"(CASE WHEN _b{i} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i})"
        f" ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits)
    )
    return agg.select(
        id_col, F.expr(f"CAST(0 AS BIGINT) + {val_sql} AS simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    base_hash: str = "xxhash64",
    bits: int = 64,
    allow_partial: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Pigeonhole banding on 4×(bits/4)-bit chunks: any pair within
    distance 3 agrees on at least one chunk, so candidates come from
    equality joins on chunk values — linear candidate generation, then
    exact popcount verification. (max_hamming ≤ 3 is guaranteed
    complete; larger values would need more/smaller chunks.)
    """
    _pigeonhole_guard(bits, max_hamming, allow_partial)
    # two consumers (left/right of the chunk self-join) — persist the
    # slim (id, simhash) table so the per-bit-sum aggregation runs once
    sh = simhash64(df, id_col, text_col, base_hash, bits).persist()
    return simhash_pairs_from_signatures(sh, id_col, max_hamming, bits,
                                         allow_partial)


def _pigeonhole_guard(bits: int, max_hamming: int,
                      allow_partial: bool) -> None:
    """Scalar validation shared by every pigeonhole entry point — run
    it BEFORE building signature plans or persisting (audit r8: the
    pair search persisted the signature table and only then failed
    validation, leaking a registered cache entry)."""
    if bits % 4:
        raise ValueError("bits must be divisible by 4 (pigeonhole chunks)")
    if max_hamming > 3 and not allow_partial:
        # 4-chunk pigeonhole is COMPLETE only for distance <= 3 (4
        # differing bits can land one per chunk, sharing none) — a
        # silent partial result is worse than an error. Pass
        # allow_partial=True to opt into best-effort recall (pairs
        # that happen to share a chunk), e.g. for diagnostics.
        raise ValueError(
            "max_hamming > 3 needs more than 4 pigeonhole chunks and "
            "would return an INCOMPLETE pair set; pass "
            "allow_partial=True to accept best-effort recall")


def simhash_pairs_from_signatures(
    sh: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    allow_partial: bool = False,
) -> DataFrame:
    """Pigeonhole pair search over a PRECOMPUTED (id, simhash) table —
    the banding/verify half of ``simhash_near_dup_pairs``, split out so
    callers that already hold the signature table (incremental stores,
    the completeness report's truth side) never pay the per-bit-sum
    aggregation twice."""
    _pigeonhole_guard(bits, max_hamming, allow_partial)
    cw = bits // 4
    banded = sh.select(
        id_col, "simhash",
        F.posexplode(_simhash_chunk_array(cw)).alias("chunk", "cval"))
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "cval"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "cval"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # Order matters at scale: the Hamming verify is a pure function of
    # the pair, so it runs BEFORE dropDuplicates — the dedup shuffle
    # then carries only verified near-dups (a handful) instead of every
    # banding collision (quadratic in corpus/2^16 per chunk).
    return (
        left.join(right, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def simhash_probe_corpus(
    new_df: DataFrame,
    corpus_hashes: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    base_hash: str = "xxhash64",
    bits: int = 64,
    allow_partial: bool = False,
) -> DataFrame:
    """Incremental SimHash near-dup probe — completes the
    growing-corpus family (Bloom = incremental EXACT dedup, MinHash
    probe = set-overlap near-dup, this = bit-fingerprint near-dup):
    a new batch checks against a PERSISTED (id, simhash) corpus table;
    the corpus text is never re-read or re-tokenized.

    Pigeonhole banding as in ``simhash_near_dup_pairs``: both sides
    explode into 4 chunk keys, candidates come from the chunk
    equality join (the corpus ships 4 slim rows per doc — at 100 TB
    this index is materialized alongside the hash table), and exact
    popcount verifies before the dedup shuffle. Returns
    (new_id, corpus_id, hamming ≤ max_hamming). Build corpus_hashes
    with the SAME base_hash/bits.
    """
    _pigeonhole_guard(bits, max_hamming, allow_partial)
    cw = bits // 4
    nh = simhash64(new_df, id_col, text_col, base_hash, bits)

    def _chunks(df: DataFrame, out_id: str, out_sh: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col("simhash").alias(out_sh),
            F.posexplode(_simhash_chunk_array(cw)).alias("chunk", "cval"),
        )

    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        _chunks(corpus_hashes, "corpus_id", "sh_b")
        .join(_chunks(nh, "new_id", "sh_a"), ["chunk", "cval"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["new_id", "corpus_id"])
        .select("new_id", "corpus_id", "hamming")
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination scan: per document, the fraction of its
    n-gram shingles that appear anywhere in *benchmark* (the eval-set
    decontamination step every pre-training pipeline runs before
    training).

    Output: (id, n_shingles, n_overlap, overlap_ppm, overlap_ratio),
    one row per document INCLUDING zero-overlap docs AND null/blank
    docs (no shingles -> all-zero row; a decontamination join must
    never silently drop them). *id_col* must uniquely identify
    documents (the contract shared by every dedup entry point). ``overlap_ppm``
    is the exact-integer form (floor of ratio·10⁶ as bigint) — use it
    for cross-engine comparison; a rounded double's final ULP can
    differ between engines even when the value is identical. Scale shape: the benchmark's
    distinct shingle set is tiny relative to the corpus (eval sets are
    thousands of docs) → broadcast semi-ish join against it; the corpus
    side streams, nothing quadratic. For a huge benchmark drop the
    broadcast and it degrades to one shuffle on the shingle hash.
    """
    bcol = bench_text_col or text_col
    # word_shingles emits DISTINCT shingles per row (array_distinct
    # before the explode), so with unique ids — the contract for every
    # dedup entry point here — a corpus-wide (id, shingle) distinct is
    # a full shuffle of every shingle string for nothing. Dropping it
    # leaves the group-by on id as the only wide edge, and its map-side
    # partials collapse each document (explode keeps a doc's shingles
    # in one partition) to a single counts row before the exchange.
    doc_sh = word_shingles(
        ensure_parallelism(docs.select(id_col, text_col)), text_col, n
    ).select(id_col, "shingle")
    bench_sh = (
        word_shingles(benchmark.select(bcol), bcol, n)
        .select("shingle").distinct()
    )
    bench_marked = bench_sh.withColumn("_hit", F.lit(1))
    if broadcast_benchmark:
        bench_marked = F.broadcast(bench_marked)
    # broadcast_benchmark=False is the documented degrade path for a
    # benchmark whose shingle set exceeds broadcast limits: one
    # shuffle on the shingle key instead (audit r8 — the docstring
    # promised this escape hatch but no parameter existed)
    hits = (
        doc_sh.join(bench_marked, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"),
        )
    )
    # shingle-less documents (null/blank text) re-enter as zero rows —
    # the one-row-per-document contract above
    hits = (
        docs.select(id_col).join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        )
    )
    nonzero = F.col("n_shingles") > 0
    ratio = F.when(nonzero, F.round(
        F.col("n_overlap").cast("double")
        / F.col("n_shingles").cast("double"), 6)).otherwise(F.lit(0.0))
    # multiply-then-divide in doubles, then floor: IEEE-deterministic on
    # any engine, unlike round-half-up of a binary double
    ppm = F.when(nonzero, F.floor(
        F.col("n_overlap").cast("double") * F.lit(1000000.0)
        / F.col("n_shingles").cast("double")
    )).otherwise(F.lit(0)).cast("long")
    return hits.select(id_col, "n_shingles", "n_overlap",
                       ppm.alias("overlap_ppm"), ratio.alias("overlap_ratio"))


def dedup_keep_best(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score_col: str,
) -> DataFrame:
    """Exact dedup keeping the BEST-scoring representative per group
    (quality-aware curation: among identical documents, keep the copy
    whose metadata/quality score is highest, not the arbitrary min-id).
    Reference analogue: compaction keep-one-per-key with a dedupKey
    comparator (gobblin-compaction
    .../RecordKeyDedupReducerBase.java) — the comparator here is
    (score DESC, id ASC).

    ONE aggregate shuffle on the 16-byte fingerprint: argmax is
    expressed as ``min_by(struct(id, score), struct(-score, id))`` so
    the partial aggregate combines map-side and the exchange carries
    one candidate row per (mapper, distinct doc) — the
    window/row_number formulation costs a second exchange because
    each Window node re-projects its own partition key. The
    struct-valued max_by buffer makes Spark pick SortAggregate over
    HashAggregate; the map-side combine (the property that matters at
    scale) still applies. Null-fp docs pass through as singletons
    under a synthetic key, mirroring ``dedup_exact``.
    """
    base = ensure_parallelism(
        df.select(id_col, score_col, text_col)).select(
        F.col(id_col),
        F.col(score_col),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    gk = F.coalesce(
        F.col("fp"), F.concat(F.lit("\0id:"), F.col(id_col).cast("string"))
    )
    # minimize (-score, id): highest score wins, smallest id breaks
    # ties. The SCORE (numeric by contract) is what gets negated —
    # negating the id would break for string/UUID ids, which every
    # other entry point here supports
    # a NULL score must LOSE, not win: struct(NULL, id) compares
    # smallest, so a scoreless copy beat every scored one (audit r8);
    # +inf in the minimized slot pushes null-score rows last while
    # real scores order unchanged
    best = F.min_by(
        F.struct(F.col(id_col), F.col(score_col)),
        F.struct(
            F.coalesce(-F.col(score_col).cast("double"),
                       F.lit(float("inf"))).alias("_neg_score"),
            F.col(id_col)),
    )
    return (
        base.groupBy(gk.alias("_gk"))
        .agg(
            best.alias("_best"),
            F.min("fp").alias("fp"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(
            F.col("_best")[id_col].alias(id_col),
            "fp",
            F.col("_best")[score_col].alias(score_col),
            "dup_count",
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    n: int = 3,
) -> DataFrame:
    """Cross-SOURCE n-gram overlap matrix — the corpus diagnostic that
    decides which crawls/dumps duplicate each other before mixing
    (inter-source dedup planning, licensing provenance checks).

    Shape is the reason this scales: shingles collapse to DISTINCT
    (source, shingle) rows first, so the self-join on the shingle key
    fans out to at most |sources| rows per shingle — join cost is
    bounded by sources², never documents², and no doc-frequency cap is
    needed (a boilerplate shingle in a million documents is still ONE
    row per source). Returns one row per unordered source pair WITH at
    least one shared shingle: (source_a, source_b, n_inter,
    jaccard_ppm), Jaccard as exact integer ppm (floor x1e6). A pair
    ABSENT from the output has zero overlap — the inner join never
    materializes empty intersections (at many sources that sparsity
    is the point).
    """
    sh = (
        word_shingles(ensure_parallelism(df.select(source_col, text_col)),
                      text_col, n)
        .select(F.col(source_col).alias("src"), "shingle")
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("src").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("src").alias("source_a"), "shingle")
    b = sh.select(F.col("src").alias("source_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = F.broadcast(sizes.select(F.col("src").alias("source_a"),
                                  F.col("n_sh").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("src").alias("source_b"),
                                  F.col("n_sh").alias("n_b")))
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a", "source_b", "n_inter",
            # pure long arithmetic: the double product loses integer
            # exactness past 2^53/1e6 intersections (audit r8); DIV is
            # floor for the non-negative operands here
            F.expr(
                "(n_inter * CAST(1000000 AS BIGINT)) DIV "
                "(n_a + n_b - n_inter)"
            ).cast("long").alias("jaccard_ppm"),
        )
    )
