"""Bloom incremental dedup + vocabulary/TF-IDF/blocklist/histogram."""

import pyspark.sql.functions as F
import pytest

from gobblin_spark.functions import bloom, cleaning, mixing, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", 44),
        (2, "the quick brown fox jumps over the lazy dog", "en", 44),
        (3, "pack my box with five dozen liquor jugs", "en", 40),
        (4, "", "en", 0),
        (5, None, "de", None),
        (6, "slow slow slow broken pipeline", "en", 30),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])


def test_bloom_split_completeness(spark):
    history = spark.range(0, 500).select(F.col("id").alias("k"))
    new = spark.range(400, 900).select(F.col("id").alias("k"))
    sketch = bloom.bloom_build(history, "k", num_bits=1 << 16, k=5)
    unseen, maybe = bloom.bloom_split(new, sketch, "k", num_bits=1 << 16, k=5)
    unseen_ids = {r.k for r in unseen.collect()}
    maybe_ids = {r.k for r in maybe.collect()}
    # no false negatives ever: every truly-seen id must land in maybe
    assert set(range(400, 500)) <= maybe_ids
    assert unseen_ids.isdisjoint(set(range(400, 500)))
    assert unseen_ids | maybe_ids == set(range(400, 900))


def test_bloom_incremental_dedup_exact(spark):
    history = spark.range(0, 300).select(F.col("id").alias("k"))
    new = spark.range(250, 600).select(F.col("id").alias("k"))
    out = bloom.bloom_incremental_dedup(new, history, "k", num_bits=1 << 14)
    assert {r.k for r in out.collect()} == set(range(300, 600))


def test_bloom_duplicate_rows_preserved(spark):
    history = spark.createDataFrame([(1,)], ["k"])
    new = spark.createDataFrame([(2,), (2,), (1,)], ["k"])
    out = bloom.bloom_incremental_dedup(new, history, "k")
    assert sorted(r.k for r in out.collect()) == [2, 2]


def test_bloom_incremental_dedup_null_in_history(spark):
    """Audit-r7: a null key PRESENT in history must be deduped like
    any other value — the name-based anti-join could never match null
    to null, so null rows always slipped through the exact pass."""
    history = spark.createDataFrame([(1,), (None,)], "k int")
    new = spark.createDataFrame([(None,), (2,), (1,)], "k int")
    out = bloom.bloom_incremental_dedup(new, history, "k")
    assert [r.k for r in out.collect()] == [2]
    # null NOT in history still passes through
    out2 = bloom.bloom_incremental_dedup(
        new, spark.createDataFrame([(1,)], "k int"), "k")
    assert sorted((r.k is None, r.k) for r in out2.collect()) == [
        (False, 2), (True, None)]


def test_bloom_md5_60_null_keys_not_dropped(spark):
    """Advice-r8 (medium): on base_hash='md5_60', md5(NULL) is NULL so
    every probe position is NULL and the group verdict went NULL —
    failing both the unseen and maybe filters, silently dropping every
    null-key row. Null rows must keep flowing to the exact anti-join,
    matching the xxhash64 path's r7 eqNullSafe semantics."""
    history = spark.createDataFrame([(1,), (None,)], "k int")
    new = spark.createDataFrame([(None,), (2,), (1,)], "k int")
    out = bloom.bloom_incremental_dedup(new, history, "k",
                                        base_hash="md5_60")
    assert [r.k for r in out.collect()] == [2]
    # null NOT in history survives the dedup
    out2 = bloom.bloom_incremental_dedup(
        new, spark.createDataFrame([(1,)], "k int"), "k",
        base_hash="md5_60")
    assert sorted((r.k is None, r.k) for r in out2.collect()) == [
        (False, 2), (True, None)]
    # split-level: the null row lands in exactly one half
    sketch = bloom.bloom_build(history, "k", base_hash="md5_60")
    # and the null history key emits no junk NULL sketch word
    assert sketch.filter("word_idx IS NULL").count() == 0
    unseen, maybe = bloom.bloom_split(new, sketch, "k",
                                      base_hash="md5_60")
    assert unseen.count() + maybe.count() == 3


def test_blocklist_filter(docs):
    kept = cleaning.blocklist_filter(docs, ["slow", "broken"])
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 6 not in ids and {1, 2, 3, 4, 5} == ids
    flagged = cleaning.blocklist_filter(docs, ["slow"], mode="flag")
    m = {r.doc_id: r.blocked for r in flagged.collect()}
    assert m[6] is True and m[1] is False


def test_token_counts(docs):
    counts = {r.token: r.n for r in text.token_counts(docs).collect()}
    assert counts["the"] == 4  # 2x in each duplicated pangram
    assert counts["slow"] == 3
    assert "" not in counts


def test_tfidf_ranks_distinctive_terms(docs):
    out = text.tf_idf_top_terms(docs, "doc_id", "text", top_k=2)
    rows = [(r.doc_id, r.token, r.rank) for r in out.collect()]
    by_doc = {}
    for d, tok, rk in rows:
        by_doc.setdefault(d, []).append((rk, tok))
    # 'slow' appears 3x only in doc 6 → its top term
    assert sorted(by_doc[6])[0][1] == "slow"
    # rank-2 ties ('broken'/'pipeline', equal score) break on token asc
    assert sorted(by_doc[6])[1][1] == "broken"
    # empty/null docs emit no terms at all
    assert 4 not in by_doc and 5 not in by_doc


def test_length_histogram_buckets(docs):
    out = mixing.length_histogram(docs, "n_chars", ("lang",))
    rows = {(r.lang, r.bucket): (r.n_docs, r.total_chars) for r in out.collect()}
    # 44 and 40 → bucket 5 (32..63); 30 → bucket 4; 0 → -1; null lang row
    assert rows[("en", 5)] == (3, 128)
    assert rows[("en", 4)] == (1, 30)
    assert rows[("en", -1)] == (1, 0)


def test_bloom_fpr_tracks_theory_on_tiny_sketch(spark):
    """A deliberately undersized sketch shows a measurable FPR that
    stays near the (bits, k, n) design formula; the exact verify stage
    removes every false positive regardless."""
    import math

    from pyspark.sql import functions as F

    from gobblin_spark.functions import bloom

    n, m, k = 400, 1 << 12, 3
    hist = spark.range(0, n).select(
        F.concat(F.lit("h"), F.col("id")).alias("v"))
    probe = spark.range(0, 2000).select(
        F.concat(F.lit("p"), F.col("id")).alias("v"))  # fully disjoint
    sketch = bloom.bloom_build(hist, "v", num_bits=m, k=k)
    unseen, maybe = bloom.bloom_split(probe, sketch, "v", num_bits=m, k=k)
    fp = maybe.count()  # every sketch-positive is false here
    p_theory = (1 - math.exp(-k * n / m)) ** k
    observed = fp / 2000
    assert observed < 2 * p_theory + 0.01, (observed, p_theory)
    # and the exact stage yields a perfect final result anyway
    final = bloom.bloom_incremental_dedup(probe, hist, "v",
                                          num_bits=m, k=k)
    assert final.count() == 2000


def test_blocklist_escapes_metachars_and_case(spark):
    """Audit r9: a blocklist entry with regex metachars must match
    literally (not break the alternation), and an upper-case entry
    must still hit (the text side is lowercased)."""
    from gobblin_spark.functions.cleaning import blocklist_filter

    df = spark.createDataFrame(
        [(1, "we write c++ here"), (2, "pure python"), (3, "BAD stuff")],
        "doc_id int, text string")
    out = blocklist_filter(df, ["c[+][+]", "BAD"], mode="flag")
    got = {r.doc_id: r.blocked for r in out.collect()}
    # 'c[+][+]' is matched literally (no doc contains that string);
    # 'BAD' lowercases and hits doc 3
    assert got == {1: False, 2: False, 3: True}
