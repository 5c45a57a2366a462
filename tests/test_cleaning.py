"""Corpus cleaning: C4 line rules, corpus-wide line dedup (first
occurrence survives), reassembly order, and the duplication census."""

from pyspark.sql import functions as F

from gobblin_spark.functions import cleaning as CL


def make_docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox jumps.\nshort\nBuy cookies now here!\n"
                "This boilerplate line is shared across documents okay.\n"
                "Unique ending line for doc one."),
            (2, "This boilerplate line is shared across documents okay.\n"
                "Another perfectly fine sentence lives here.\nlorem ipsum dolor sit"),
            (3, "This boilerplate line is shared across documents okay.\n"
                "Third doc keeps its own content intact."),
        ],
        "doc_id int, text string",
    )


def test_clean_lines_c4_rules(spark):
    docs = make_docs(spark)
    out = {r.doc_id: r.cleaned for r in docs.select(
        "doc_id", CL.clean_lines(F.col("text")).alias("cleaned")).collect()}
    kept1 = out[1].split("\n")
    assert "The quick brown fox jumps." in kept1
    assert "short" not in kept1  # < 3 words
    assert all("cookies" not in ln for ln in kept1)  # boilerplate
    assert "Unique ending line for doc one." in kept1
    assert all("lorem ipsum" not in ln for ln in out[2].split("\n"))


def test_line_stats(spark):
    docs = make_docs(spark)
    s = [x.s for x in docs.select(CL.line_stats(F.col("text")).alias("s")).collect()]
    assert all(x.kept_lines <= x.total_lines for x in s)


def test_dedup_lines_global_first_occurrence_wins(spark):
    docs = make_docs(spark)
    out = {r.doc_id: r.text for r in CL.dedup_lines_global(docs, min_dup_chars=20).collect()}
    shared = "This boilerplate line is shared across documents okay."
    assert shared in out[1]  # first occurrence (doc 1 has smallest id)
    assert shared not in out[2] and shared not in out[3]
    # untouched short lines survive everywhere
    assert "short" in out[1]
    # order preserved
    assert out[1].index("The quick") < out[1].index("Unique ending")
    # non-duplicated content intact
    assert "Third doc keeps its own content intact." in out[3]


def test_dedup_lines_short_lines_exempt(spark):
    docs = spark.createDataFrame(
        [(1, "same\nlong line repeated across both documents here."),
         (2, "same\nlong line repeated across both documents here.")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.text for r in CL.dedup_lines_global(docs, min_dup_chars=20).collect()}
    assert "same" in out[1] and "same" in out[2]  # short → exempt
    assert "repeated" in out[1] and "repeated" not in out[2]


def test_dedup_lines_fully_emptied_doc_survives_as_empty(spark):
    """A document whose every line is removed (all lines are duplicates
    first seen elsewhere, or text is null) must come back with text ''
    — not silently disappear from the corpus."""
    dup = "this exact long line appears in both documents verbatim."
    docs = spark.createDataFrame(
        [(1, dup), (2, dup), (3, None)], "doc_id int, text string")
    out = {r.doc_id: r.text for r in
           CL.dedup_lines_global(docs, min_dup_chars=20).collect()}
    assert set(out) == {1, 2, 3}  # one row per input doc
    assert out[1] == dup          # first occurrence survives
    assert out[2] == ""           # fully deduped, not dropped
    assert out[3] == ""           # null text → empty doc


def test_duplicate_line_stats_census(spark):
    docs = make_docs(spark)
    rows = CL.duplicate_line_stats(docs, min_dup_chars=20).collect()
    assert len(rows) == 1
    assert rows[0].occurrences == 3 and rows[0].docs == 3


def test_explode_lines_positions(spark):
    docs = spark.createDataFrame([(7, "a\nbb\nccc")], "doc_id int, text string")
    rows = CL.explode_lines(docs).orderBy("pos").collect()
    assert [(r.pos, r.line) for r in rows] == [(0, "a"), (1, "bb"), (2, "ccc")]


def test_span_dedup_first_occurrence_survives(spark):
    """A repeated 4-token span survives only in the lexicographically
    first (doc_id, pos) occurrence; other docs lose exactly those
    tokens; unique surroundings are untouched."""
    span = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(1, f"intro {span} outro one"),
         (2, f"other words here {span} trailing bits"),
         (3, "completely unique text with no repeats at all")],
        "doc_id int, text string")
    out = {r.doc_id: r for r in
           CL.dedup_spans_global(docs, width=4).collect()}
    assert out[1].clean_text == f"intro {span} outro one"
    assert out[1].n_removed == 0
    assert out[2].clean_text == "other words here trailing bits"
    assert out[2].n_removed == 4
    assert out[3].n_removed == 0


def test_span_dedup_short_and_empty_docs(spark):
    """Docs shorter than the window produce no n-grams (and no
    descending-sequence crash); null text comes back as ''."""
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, None), (3, "")],
        "doc_id int, text string")
    out = {r.doc_id: r for r in
           CL.dedup_spans_global(docs, width=12).collect()}
    assert out[1].clean_text == "tiny doc" and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_removed == 0
    assert out[3].clean_text == "" and out[3].n_removed == 0


def test_span_dedup_overlapping_marks_merge(spark):
    """Two overlapping duplicated windows in the same doc mark the
    union of their positions — tokens covered twice are removed once,
    mark-then-remove without cascade."""
    # doc 2 repeats a 5-token run; with width=4 the run yields two
    # overlapping duplicated windows covering all 5 tokens
    run = "v w x y z"
    docs = spark.createDataFrame(
        [(1, f"{run} first home"), (2, f"pre {run} post")],
        "doc_id int, text string")
    out = {r.doc_id: r for r in
           CL.dedup_spans_global(docs, width=4).collect()}
    assert out[1].n_removed == 0
    assert out[2].clean_text == "pre post"
    assert out[2].n_removed == 5


def test_span_dedup_skew_guard_branch_equal_and_prefiltered(spark):
    """The scale-adaptive skew guard (r14, verdict-r13 #2): forcing the
    guarded branch must (a) put the duplicate-count hash aggregate
    BELOW the window so unique digests never reach the sort, and (b)
    produce exactly the plain branch's output."""
    span = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(1, f"intro {span} outro one"),
         (2, f"other words here {span} trailing bits"),
         (3, "completely unique text with no repeats at all")],
        "doc_id int, text string")
    plain = CL.dedup_spans_global(docs, width=4)
    guarded = CL.dedup_spans_global(docs, width=4, skew_guard_bytes=0)
    assert plain.exceptAll(guarded).count() == 0
    assert guarded.exceptAll(plain).count() == 0
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    iw = plan.find("Window ")
    ih = plan.find("HashAggregate(keys=[_h")
    assert 0 < iw < ih, plan[:1500]   # count agg below the window
    # a provably-small SCAN (known stats, under the guard) keeps the
    # plain single-window plan — no prefilter stages on small inputs
    from gobblin_spark.sources.files import load_table

    small = load_table(spark, "/root/testdata/sf0.001", "documents")
    gplan = CL.dedup_spans_global(small, width=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate(keys=[_h" not in gplan, gplan[:1500]
