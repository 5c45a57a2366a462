"""Streaming runner (FIXTURES §8): flush epochs drain to batch parity,
late rows route to _late, bad rows to _quarantine, frontier advances."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from gobblin_spark import state, streaming
from gobblin_spark.operators import quality
from gobblin_spark.sources import files


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    """Events table split into 3 parquet files (3 arrival epochs)."""
    ev = files.load_table(spark, sf_dir, "events")
    path = str(tmp_path / "in")
    ev.repartition(3).write.parquet(path)
    return path, ev.count(), ev.schema


def test_stream_equals_batch(spark, events_dir, tmp_path):
    path, total, schema = events_dir
    out = str(tmp_path / "out")
    stream = streaming.file_stream(spark, path, schema=schema,
                                   max_files_per_trigger=1)
    spec = streaming.IngestSpec(final_dir=out, ts_col="ts",
                                allowed_lateness=dt.timedelta(days=10**6))
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    stats = streaming.run_ingest_blocking(stream, spec, store,
                                          str(tmp_path / "ckpt"))
    assert len(stats) >= 2  # maxFilesPerTrigger=1 → multiple epochs
    back = spark.read.parquet(out)
    assert back.count() == total
    assert sum(s.rows for s in stats) == total
    assert all(s.late_rows == 0 for s in stats)
    # frontier committed to the global max event time
    assert store.get("stream") is not None


def test_late_rows_routed(spark, tmp_path):
    """Epoch 1 establishes the frontier; epoch 2's old rows land in _late."""
    sch = "id INT, ts TIMESTAMP_NTZ"
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    fresh = [(i, t0 + dt.timedelta(minutes=i)) for i in range(10)]
    stale = [(100 + i, t0 - dt.timedelta(days=2)) for i in range(3)]
    indir = tmp_path / "in"
    spark.createDataFrame(fresh, sch).coalesce(1).write.parquet(str(indir / "b1"))

    out = str(tmp_path / "out")
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    spec = streaming.IngestSpec(final_dir=out, ts_col="ts",
                                allowed_lateness=dt.timedelta(hours=1))

    # epoch 1: no frontier yet → all on-time, frontier = max(ts)
    stream = streaming.file_stream(spark, str(indir / "b1"), schema=sch)
    streaming.run_ingest_blocking(stream, spec, store, str(tmp_path / "c1"))
    assert spec.stats[-1].late_rows == 0
    frontier = store.get("stream")
    assert frontier == t0 + dt.timedelta(minutes=9)

    # epoch 2: stale rows are older than frontier - 1h → _late
    spark.createDataFrame(stale, sch).coalesce(1).write.parquet(str(indir / "b2"))
    spec2 = streaming.IngestSpec(final_dir=out, ts_col="ts",
                                 allowed_lateness=dt.timedelta(hours=1))
    stream2 = streaming.file_stream(spark, str(indir / "b2"), schema=sch)
    streaming.run_ingest_blocking(stream2, spec2, store, str(tmp_path / "c2"))
    assert spec2.stats[-1].late_rows == 3
    late = spark.read.parquet(os.path.join(out, streaming.LATE_DIR))
    assert {r.id for r in late.collect()} == {100, 101, 102}
    # late rows must NOT be in the main dir; frontier unchanged by stale rows
    main_ids = {r.id for r in spark.read.parquet(out).select("id").collect()}
    assert main_ids == set(range(10))
    assert store.get("stream") == frontier


def test_quarantine_in_stream(spark, tmp_path):
    sch = "id INT, v INT, ts TIMESTAMP_NTZ"
    t0 = dt.datetime(2024, 5, 1)
    rows = [(i, (None if i % 4 == 0 else i), t0) for i in range(20)]
    indir = str(tmp_path / "in")
    spark.createDataFrame(rows, sch).coalesce(1).write.parquet(indir)

    out = str(tmp_path / "out")
    spec = streaming.IngestSpec(
        final_dir=out, ts_col="ts",
        row_policies=[quality.not_null_policy(["v"])],
    )
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    stream = streaming.file_stream(spark, indir, schema=sch)
    stats = streaming.run_ingest_blocking(stream, spec, store, str(tmp_path / "c"))
    assert sum(s.quarantined for s in stats) == 5
    assert spark.read.parquet(out).count() == 15
    q = spark.read.parquet(os.path.join(out, streaming.QUARANTINE_DIR))
    assert q.count() == 5 and all(r.v is None for r in q.collect())


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch can re-deliver an epoch after a failure. A replayed
    epoch must not duplicate rows: a fully-committed epoch no-ops on its
    marker; a partially-written epoch REWRITES its own partition via
    dynamic partition overwrite."""
    sch = "id INT, ts TIMESTAMP_NTZ"
    t0 = dt.datetime(2024, 3, 1)
    batch = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i)) for i in range(8)], sch)
    out = str(tmp_path / "out")
    spec = streaming.IngestSpec(final_dir=out, ts_col="ts")
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    from gobblin_spark.streaming import runner as _R
    fn = _R._epoch_fn(spec, store, "tok00001")

    # crash-before-marker: the data landed but the marker didn't
    _R._epoch_write(batch, spec, "tok00001-0", out)
    assert spark.read.parquet(out).count() == 8
    fn(batch, 0)  # re-delivery — no marker yet, partition rewritten
    assert spark.read.parquet(out).count() == 8
    assert not spec.stats[-1].replayed and spec.stats[-1].rows == 8

    # crash-after-marker: second delivery must be a pure no-op
    fn(batch, 0)
    assert spark.read.parquet(out).count() == 8
    assert spec.stats[-1].replayed

    # a different epoch still appends (new partition)
    batch2 = spark.createDataFrame(
        [(100 + i, t0 + dt.timedelta(hours=1, minutes=i)) for i in range(3)], sch)
    fn(batch2, 1)
    assert spark.read.parquet(out).count() == 11


def test_windowed_counts_watermark(spark, tmp_path):
    """Built-in watermark path: hourly tumbling counts over a stream equal
    the batch groupBy, rows later than the watermark dropped by Spark."""
    sch = "id INT, ts TIMESTAMP_NTZ"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(i, t0 + dt.timedelta(minutes=17 * i)) for i in range(40)]
    indir = str(tmp_path / "in")
    df = spark.createDataFrame(rows, sch)
    df.coalesce(1).write.parquet(indir)

    stream = streaming.file_stream(spark, indir, schema=sch)
    agg = streaming.windowed_counts(stream, "ts", window="1 hour")
    streaming.stream_to_memory(agg, "win_counts")
    got = {
        (r.window_start, r.n)
        for r in spark.table("win_counts").collect()
    }
    expect = {
        (r.ws, r.n)
        for r in df.groupBy(F.date_trunc("hour", "ts").alias("ws"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_stream_stream_interval_join_bounds(spark, tmp_path):
    """Matches inside the delay horizon join; outside-horizon and
    wrong-key rows do not; no duplicates."""
    import datetime as dt

    from gobblin_spark.streaming import runner as R

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = [(1, t0), (2, t0)]
    right = [
        (1, t0 + dt.timedelta(minutes=30), 10.0),   # in window
        (1, t0 + dt.timedelta(minutes=90), 20.0),   # past max_delay
        (1, t0 - dt.timedelta(minutes=1), 30.0),    # before the view
        (3, t0 + dt.timedelta(minutes=5), 40.0),    # wrong key
    ]
    spark.createDataFrame(left, "user_id long, ts timestamp_ntz") \
        .write.parquet(f"{tmp_path}/l")
    spark.createDataFrame(right, "user_id long, ts timestamp_ntz, value double") \
        .write.parquet(f"{tmp_path}/r")
    ldf = spark.readStream.schema("user_id long, ts timestamp_ntz") \
        .parquet(f"{tmp_path}/l")
    rdf = spark.readStream.schema(
        "user_id long, ts timestamp_ntz, value double").parquet(f"{tmp_path}/r")
    joined = R.stream_stream_interval_join(
        ldf, rdf, "user_id", "ts", "ts",
        max_delay="1 hour", watermark="10 days")
    q = R.stream_to_memory_append(joined, "ssj_test")
    rows = spark.table("ssj_test").collect()
    assert len(rows) == 1
    assert rows[0].user_id == 1 and rows[0].r_value == 10.0


# -- round-6 review fixes ---------------------------------------------


def test_null_event_times_stay_on_time(spark, tmp_path):
    """Review-r6: once a frontier exists, a NULL event time made both
    split predicates NULL and the row vanished from BOTH outputs.
    NULL ts must route on-time (as it did on the first epoch)."""
    sch = "id INT, ts TIMESTAMP_NTZ"
    t0 = dt.datetime(2024, 3, 1)
    out = str(tmp_path / "out")
    spec = streaming.IngestSpec(final_dir=out, ts_col="ts",
                                allowed_lateness=dt.timedelta(hours=1))
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    from gobblin_spark.streaming import runner as _R
    fn = _R._epoch_fn(spec, store, "toknull1")
    fn(spark.createDataFrame([(1, t0)], sch), 0)  # establishes frontier
    fn(spark.createDataFrame([(2, t0 + dt.timedelta(minutes=1)),
                              (3, None)], sch), 1)
    ids = sorted(r.id for r in spark.read.parquet(out).collect())
    assert ids == [1, 2, 3]  # the null-ts row was NOT lost
    assert spec.stats[-1].rows == 2 and spec.stats[-1].late_rows == 0


def test_marker_frontier_crash_window_repaired(spark, tmp_path):
    """Review-r6: marker now commits FIRST carrying the epoch's
    frontier; a crash before the dataset-frontier commit is repaired
    on replay instead of re-splitting against the epoch's own max."""
    sch = "id INT, ts TIMESTAMP_NTZ"
    t0 = dt.datetime(2024, 3, 1)
    out = str(tmp_path / "out")
    spec = streaming.IngestSpec(final_dir=out, ts_col="ts",
                                allowed_lateness=dt.timedelta(minutes=30))
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    from gobblin_spark.streaming import runner as _R
    fn = _R._epoch_fn(spec, store, "tokcrash")
    batch = spark.createDataFrame(
        [(i, t0 + dt.timedelta(hours=i)) for i in range(3)], sch)
    # simulate the crash window: run the epoch, then roll the DATASET
    # frontier back as if the final commit never landed
    fn(batch, 0)
    assert store.get(spec.dataset) == t0 + dt.timedelta(hours=2)
    # wipe the dataset frontier (crash before it was written) — only
    # the wm files directly under wm/<dataset>; epochs/ is a CHILD
    # dataset in the same tree and must survive
    for f in (tmp_path / "wm" / spec.dataset).iterdir():
        if f.is_file() and f.name.startswith("wm-"):
            f.unlink()
    assert store.get(spec.dataset) is None
    fn(batch, 0)  # replay: marker present -> no-op + frontier REPAIR
    assert spec.stats[-1].replayed
    assert store.get(spec.dataset) == t0 + dt.timedelta(hours=2)
    assert spark.read.parquet(out).count() == 3  # no duplicate rows


def test_canonical_checkpoint_spellings(tmp_path):
    """Review-r6: every spelling of one checkpoint dir must yield one
    run token (a resume under a different spelling re-published every
    epoch under a new token)."""
    from gobblin_spark.streaming import runner as _R

    p = str(tmp_path / "ckpt")
    variants = [p, p + "/", f"file:{p}", f"file://{p}"]
    toks = {_R._run_token(v) for v in variants}
    assert len(toks) == 1
    import os
    os.chdir(str(tmp_path))
    assert _R._run_token("ckpt") == _R._run_token(p)


def test_run_ingest_trigger_conflict_is_loud(spark, tmp_path):
    """processing_time with the available_now default must raise, not
    silently drain-once."""
    sch = "id INT, ts TIMESTAMP_NTZ"
    (tmp_path / "src").mkdir()
    stream = (spark.readStream.schema(sch)
              .parquet(str(tmp_path / "src")))
    spec = streaming.IngestSpec(final_dir=str(tmp_path / "o"), ts_col="ts")
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    with pytest.raises(ValueError, match="available_now=False"):
        streaming.run_ingest(stream, spec, store, str(tmp_path / "ck"),
                             processing_time="10 seconds")


def test_split_late_rejects_non_temporal_frontier(spark):
    from gobblin_spark.streaming.runner import split_late

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))],
                               "id INT, ts TIMESTAMP_NTZ")
    with pytest.raises(TypeError, match="non-temporal"):
        split_late(df, "ts", 1700000000000, dt.timedelta(hours=1))
    # date frontier: sub-day lateness rounds UP to one day
    on_time, late = split_late(
        df, "ts", dt.date(2024, 1, 3), dt.timedelta(hours=1))
    assert late.count() == 1  # ts < 2024-01-02 -> late


def test_checkpoint_recreate_does_not_drop_epochs(spark, tmp_path):
    """Audit r8: the run token binds the checkpoint LINEAGE id, not
    just the path — rm -rf <ckpt> + restart used to mark every
    re-read batch as a replay of the old lineage and silently drop
    the first N+1 micro-batches."""
    import shutil

    rows = [(i, dt.datetime(2024, 1, 1 + i)) for i in range(4)]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz")
    indir = str(tmp_path / "in")
    df.repartition(2).write.parquet(indir)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))

    def drain():
        stream = streaming.file_stream(spark, indir, schema=df.schema,
                                       max_files_per_trigger=1)
        spec = streaming.IngestSpec(
            final_dir=out, ts_col="ts", dataset="reproc",
            allowed_lateness=dt.timedelta(days=10**6))
        return streaming.run_ingest_blocking(stream, spec, store, ck)

    s1 = drain()
    assert sum(s.rows for s in s1) == 4
    # the reprocess-from-scratch move
    shutil.rmtree(ck)
    s2 = drain()
    assert sum(s.rows for s in s2) == 4, "recreated lineage dropped rows"
    assert not any(s.replayed for s in s2)
    # data re-landed under a NEW epoch token (8 rows total now)
    assert spark.read.parquet(out).count() == 8


def test_non_temporal_ts_col_fails_epoch_one(spark, tmp_path):
    """Audit r8: a bigint ts_col must fail loudly on the FIRST epoch
    instead of committing a poison frontier that wedges epoch 2 with
    an error blaming a shared store."""
    df = spark.createDataFrame([(1, 100), (2, 200)], "k long, ts long")
    indir = str(tmp_path / "in")
    df.write.parquet(indir)
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    spec = streaming.IngestSpec(final_dir=str(tmp_path / "out"),
                                ts_col="ts", dataset="poison")
    stream = streaming.file_stream(spark, indir, schema=df.schema)
    with pytest.raises(Exception, match="non-temporal frontier"):
        streaming.run_ingest_blocking(stream, spec, store,
                                      str(tmp_path / "ck"))
    assert store.get("poison") is None  # nothing poisoned the store


def test_epoch_persist_released_and_ledger_pruned(spark, tmp_path):
    """Audit r8: the per-epoch persist is released even when
    row_policies rebind the frame, and the marker/frontier ledgers
    stay bounded."""
    rows = [(i, dt.datetime(2024, 1, 1 + i % 5)) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz")
    indir = str(tmp_path / "in")
    df.repartition(4).write.parquet(indir)
    store = state.WatermarkStore(spark, str(tmp_path / "wm"))
    spec = streaming.IngestSpec(
        final_dir=str(tmp_path / "out"), ts_col="ts", dataset="cache",
        row_policies=[quality.RowPolicy("pos", F.col("k") >= 0)],
        allowed_lateness=dt.timedelta(days=10**6))
    stream = streaming.file_stream(spark, indir, schema=df.schema,
                                   max_files_per_trigger=1)
    before = spark._jsc.sc().getPersistentRDDs().size()
    streaming.run_ingest_blocking(stream, spec, store,
                                  str(tmp_path / "ck"))
    # relative: other suites legitimately leave persisted frames in
    # the shared session; THIS drain must add none (4 epochs ran)
    n_cached = spark._jsc.sc().getPersistentRDDs().size()
    assert n_cached <= before, f"{n_cached - before} cached batches leaked"
    # pruned ledgers: marker key bounded by 20, dataset key by 200
    from gobblin_spark.streaming import runner as R
    token = R._run_token(str(tmp_path / "ck"), spark)
    assert len(store._entries(f"cache/epochs/{token}")) <= 20


def test_epoch_col_clash_fails_loudly(spark, tmp_path):
    """Audit r8: a pre-existing gobblin_epoch column must not be
    silently overwritten by the epoch partition value."""
    from gobblin_spark.streaming import runner as R

    df = spark.createDataFrame([(1, "x")],
                               f"k long, {R.EPOCH_COL} string")
    spec = streaming.IngestSpec(final_dir=str(tmp_path / "o"), ts_col="k")
    with pytest.raises(ValueError, match=R.EPOCH_COL):
        R._epoch_write(df, spec, "t-0", str(tmp_path / "o"))


def test_changelog_stream_exactly_once_random_crashes(spark, tmp_path):
    """Property (review r13 pass 3): for a RANDOM history of appends /
    equality-deletes / position-deletes consumed through the
    checkpointed stream with CRASHES injected at random offset
    commits (including crashes racing NEW upstream commits), an
    idempotent-by-token sink's net effect equals both read() and the
    batch changelog — exactly-once across every interleaving, not
    just the pointwise crash pins. Sweep more seeds with
    GOBBLIN_STREAM_SEED=n."""
    import os as _os
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream

    rng = random.Random(int(_os.environ.get("GOBBLIN_STREAM_SEED", "7")))
    loc = str(tmp_path / "clsprop")
    ckpt = str(tmp_path / "clsprop_ckpt")
    t = IcebergTable.create(
        spark, loc,
        spark.createDataFrame([(1, "x")], "k long, s string").schema)

    sink: dict[int, list] = {}      # token -> rows, idempotent by token

    def fn(batch_df, token):
        sink.setdefault(token, [
            (r.k, r._change_type, r._commit_snapshot_id)
            for r in batch_df.collect()])

    real_commit = IcebergChangelogStream._commit_offset

    def crashy(p):
        def maybe(self, sid, epoch, *a):
            if rng.random() < p:
                raise OSError("injected crash before offset commit")
            return real_commit(self, sid, epoch, *a)
        return maybe

    next_k, live = 0, []
    for step in range(8):
        # upstream: 1-2 commits per step
        for _ in range(rng.randint(1, 2)):
            op = ("append" if not live
                  else rng.choice(["append", "append", "eq_del", "pos_del"]))
            if op == "append":
                ks = [next_k + i for i in range(rng.randint(1, 3))]
                next_k += len(ks)
                t.append_dataframe(spark.createDataFrame(
                    [(k, f"v{k}") for k in ks],
                    "k long, s string").coalesce(1))
                live.extend(ks)
            elif op == "eq_del":
                k = rng.choice(live)
                t.delete_equality(spark.createDataFrame([(k,)], "k long"))
                live.remove(k)
            else:
                k = rng.choice(live)
                pos = (t.read(apply_deletes=False)
                       .select(F.col("_metadata.file_path")
                               .alias("file_path"),
                               F.col("_metadata.row_index").alias("pos"),
                               "k")
                       .filter(F.col("k") == k).drop("k"))
                t.delete_positions(pos)
                live.remove(k)
        # consumer: crash ~35% of offset commits, restart fresh each
        # step (new instance = the recovery path every time)
        mx = rng.choice([None, 1, 2])
        IcebergChangelogStream._commit_offset = crashy(0.35)
        try:
            cs = IcebergChangelogStream(t, ckpt,
                                        max_snapshots_per_batch=mx)
            try:
                cs.process_available(fn)
            except OSError:
                pass                 # crashed mid-drain; restart below
        finally:
            IcebergChangelogStream._commit_offset = real_commit

    # final clean drain (the restart after the last crash)
    IcebergChangelogStream(t, ckpt).process_available(fn)

    got = Counter(r for rows in sink.values() for r in rows)
    want = Counter((r.k, r._change_type, r._commit_snapshot_id)
                   for r in t.changelog(None).collect())
    assert got == want               # union of epochs IS the changelog
    net = (Counter(k for k, c, _ in got.elements() if c == "insert")
           - Counter(k for k, c, _ in got.elements() if c == "delete"))
    assert net == Counter(r.k for r in t.read().collect())
    assert sorted(net.elements()) == sorted(live)


def test_changelog_stream_epochs_retractions_exactly_once(
        spark, tmp_path, monkeypatch):
    """verdict-r12 #3: changelog-mode streaming — append / equality-
    delete / position-delete / INSERT OVERWRITE land upstream; the
    checkpointed consumer delivers each window once with a
    deterministic token, and a crash BETWEEN delivery and the offset
    commit re-delivers the SAME window under the SAME token after
    restart, so an idempotent-by-token sink nets exactly-once —
    including the retraction rows."""
    from pyspark.sql import functions as F

    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream

    loc = str(tmp_path / "clstream")
    ckpt = str(tmp_path / "clstream_ckpt")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)

    sink: dict[int, list] = {}   # token -> rows (idempotent by token)
    calls: list[int] = []

    def fn(batch_df, token):
        rows = sorted((r.k, r._change_type, r._commit_snapshot_id)
                      for r in batch_df.collect())
        calls.append(token)
        sink[token] = rows

    cs = IcebergChangelogStream(t, ckpt, max_snapshots_per_batch=2)
    assert cs.process_available(fn) == 0      # empty table: no epochs
    assert cs.last_committed() is None

    t.append_dataframe(df.coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]
    assert cs.process_available(fn) == 1
    assert cs.last_committed() == s1
    assert sink[s1] == [(1, "insert", s1), (2, "insert", s1),
                        (3, "insert", s1), (4, "insert", s1)]

    # delete-carrying history + a genuine overwrite
    t.delete_equality(spark.createDataFrame([(2,)], "k long"))
    s2 = t.metadata()["current-snapshot-id"]
    pos = (t.read(apply_deletes=False)
           .select(F.col("_metadata.file_path").alias("file_path"),
                   F.col("_metadata.row_index").alias("pos"), "k")
           .filter(F.col("k") == 3).drop("k"))
    t.delete_positions(pos)
    s3 = t.metadata()["current-snapshot-id"]
    sub = str(tmp_path / "clstream_new")
    spark.createDataFrame([(10, "x")], "k long, s string").coalesce(1) \
        .write.mode("overwrite").parquet(sub)
    s4 = t._commit_files(t._list_committed_files(sub), content=0,
                         equality_ids=None, operation="overwrite",
                         carry_prior=False)

    # CRASH between delivery and offset commit on the retraction epoch
    real_commit = IcebergChangelogStream._commit_offset
    def torn(self, snapshot_id, epoch, *a):
        raise OSError("simulated crash before offset commit")
    monkeypatch.setattr(IcebergChangelogStream, "_commit_offset", torn)
    crashed = IcebergChangelogStream(t, ckpt, max_snapshots_per_batch=2)
    with pytest.raises(OSError, match="simulated crash"):
        crashed.process_available(fn)
    assert calls[-1] == s3           # the (s1, s3] window DID deliver
    first_delivery = sink[s3]
    monkeypatch.setattr(IcebergChangelogStream, "_commit_offset",
                        real_commit)

    # RESTART: fresh instance re-delivers the SAME window, SAME token,
    # byte-identical rows — then drains the overwrite epoch
    restarted = IcebergChangelogStream(t, ckpt, max_snapshots_per_batch=2)
    assert restarted.process_available(fn) == 2
    assert calls.count(s3) == 2      # delivered twice (at-least-once)...
    assert sink[s3] == first_delivery   # ...but idempotent by token
    assert sink[s3] == [(2, "delete", s2), (3, "delete", s3)]
    assert sink[s4] == [(1, "delete", s4), (4, "delete", s4),
                        (10, "insert", s4)]
    assert restarted.last_committed() == s4

    # exactly-once net effect: the sink's union IS the full changelog
    want = sorted((r.k, r._change_type, r._commit_snapshot_id)
                  for r in t.changelog(None).collect())
    got = sorted(r for rows in sink.values() for r in rows)
    assert got == want

    # nothing pending; a no-op drain delivers zero epochs
    assert restarted.process_available(fn) == 0

    # review r13: crash between delivery and offset commit, then NEW
    # upstream commits land BEFORE the restart — the restarted consumer
    # must replay the SAME planned window under the SAME token (the
    # WAL-ed intent), not re-slice (s4, s6] and re-deliver s5's rows
    # under a never-seen token
    t.append_dataframe(spark.createDataFrame([(20, "p")],
                                             "k long, s string"))
    s5 = t.metadata()["current-snapshot-id"]
    monkeypatch.setattr(IcebergChangelogStream, "_commit_offset", torn)
    crashed2 = IcebergChangelogStream(t, ckpt)
    with pytest.raises(OSError, match="simulated crash"):
        crashed2.process_available(fn)
    assert calls[-1] == s5
    monkeypatch.setattr(IcebergChangelogStream, "_commit_offset",
                        real_commit)
    t.append_dataframe(spark.createDataFrame([(21, "q")],
                                             "k long, s string"))
    s6 = t.metadata()["current-snapshot-id"]
    restarted2 = IcebergChangelogStream(t, ckpt)
    assert restarted2.process_available(fn) == 2
    assert calls[-2:] == [s5, s6]        # intact token s5, THEN s6
    assert sink[s5] == [(20, "insert", s5)]
    assert sink[s6] == [(21, "insert", s6)]
    want2 = sorted((r.k, r._change_type, r._commit_snapshot_id)
                   for r in t.changelog(None).collect())
    got2 = sorted(r for rows in sink.values() for r in rows)
    assert got2 == want2


def test_changelog_stream_intent_head_rollback_raises(spark, tmp_path,
                                                      monkeypatch):
    """review r13 pass 2: a delivered-but-uncommitted intent whose
    head left the pending set (upstream rollback_to past it during
    the outage) must RAISE on restart, not silently re-slice — the
    sink may already hold the vanished window's rows under the old
    token, and a re-sliced window would re-deliver them under a
    never-seen one."""
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream

    loc = str(tmp_path / "clsintroll")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    t.append_dataframe(df.coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]
    ckpt = str(tmp_path / "clsintroll_ckpt")
    cs = IcebergChangelogStream(t, ckpt)
    assert cs.process_available(lambda d, tok: d.count()) == 1

    t.append_dataframe(spark.createDataFrame([(2, "b")],
                                             "k long, s string"))
    s2 = t.metadata()["current-snapshot-id"]
    # crash after delivery, before the offset commit
    monkeypatch.setattr(
        IcebergChangelogStream, "_commit_offset",
        lambda self, sid, ep, *a: (_ for _ in ()).throw(
            OSError("crash")))
    with pytest.raises(OSError, match="crash"):
        IcebergChangelogStream(t, ckpt).process_available(
            lambda d, tok: d.count())
    monkeypatch.undo()
    # upstream rolls back past the planned head and moves on
    t.rollback_to(s1)
    t.append_dataframe(spark.createDataFrame([(3, "c")],
                                             "k long, s string"))
    with pytest.raises(RuntimeError, match="planned window head"):
        IcebergChangelogStream(t, ckpt).process_available(
            lambda d, tok: None)


def test_changelog_stream_checkpoint_pruned(spark, tmp_path):
    """review r13 pass 2 (floors since pass 5): the checkpoint ledgers
    must prune (one file lands per commit — same unbounded-listing bug
    class audit r8 fixed in the runner), and pruning is by SEQUENCE
    FLOOR derived from the epoch's own commit, so it can never delete
    committed state (model check: 'count_prune')."""
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream
    from gobblin_spark.streaming import changelog_stream as CS

    loc = str(tmp_path / "clsprune")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    ckpt = str(tmp_path / "clsprune_ckpt")
    cs = IcebergChangelogStream(t, ckpt, max_snapshots_per_batch=1)
    for i in range(4):
        t.append_dataframe(spark.createDataFrame(
            [(i, "x")], "k long, s string"))
    pruned = []
    real_prune = cs.store.prune_below
    cs.store.prune_below = lambda ds, floor: (
        pruned.append(ds), real_prune(ds, floor))[1]
    assert cs.process_available(lambda d, tok: None) == 4
    # the loop prunes BOTH ledgers every epoch
    assert pruned.count(CS._DATASET) == 4
    assert pruned.count(CS._INTENT) == 4
    cs.store.prune_below = real_prune
    # intents strictly below each epoch's own WAL record are history:
    # after 4 epochs exactly the newest intent survives; the offset
    # keeps its 200-commit rollback window (4 here)
    assert len(cs.store._entries(CS._INTENT)) == 1
    assert len(cs.store._entries(CS._DATASET)) == 4
    # a tight floor genuinely removes files and keeps the commit
    cs.store.prune_below(CS._DATASET, 4)
    assert len(cs.store._entries(CS._DATASET)) == 1
    assert cs.last_committed() is not None  # still readable after prune


def test_changelog_stream_rollback_breaks_continuity_loudly(
        spark, tmp_path):
    """An upstream rollback_to that rewrites history past the
    consumer's offset must raise at the consumer, not silently
    re-emit or skip."""
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream

    loc = str(tmp_path / "clsroll")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    t.append_dataframe(df.coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]
    t.append_dataframe(spark.createDataFrame([(2, "b")],
                                             "k long, s string"))

    cs = IcebergChangelogStream(t, str(tmp_path / "clsroll_ckpt"))
    seen = []
    assert cs.process_available(
        lambda d, tok: seen.append((tok, d.count()))) == 1

    t.rollback_to(s1)
    t.append_dataframe(spark.createDataFrame([(3, "c")],
                                             "k long, s string"))
    with pytest.raises(RuntimeError, match="rollback_to"):
        cs.process_available(lambda d, tok: None)


def test_changelog_stream_second_consumer_fenced(spark, tmp_path):
    """review r13 pass 3 (round-14 queue #2): the checkpoint directory
    admits exactly ONE live consumer. A second consumer whose ledger
    reads went stale while a rival completed epochs would — without
    fencing — plan a FRESH window from the old base and deliver
    already-applied rows under a never-seen token, which an
    idempotent-by-token sink cannot dedup (double-apply). Every ledger
    access is fenced on the store's atomic-create sequence, so the
    stale consumer dies with ConcurrentWriterError BEFORE delivering
    on the conflicting paths, and on the offset commit in the
    token-shared (harmless) replay path."""
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.state import ConcurrentWriterError
    from gobblin_spark.streaming import IcebergChangelogStream

    loc = str(tmp_path / "cls2c")
    ckpt = str(tmp_path / "cls2c_ckpt")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    t.append_dataframe(df.coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]

    # consumer B captures its ledger state BEFORE A makes progress —
    # the widest possible staleness window of the live race
    b = IcebergChangelogStream(t, ckpt)
    stale_off = b._offset_record()          # (None, fence 0)
    stale_int = b._find_intent(None, 0)     # (no intent, fence 0)

    a = IcebergChangelogStream(t, ckpt)
    assert a.process_available(lambda d, tok: None) == 1
    t.append_dataframe(spark.createDataFrame([(2, "b")],
                                             "k long, s string"))
    s2 = t.metadata()["current-snapshot-id"]
    assert a.process_available(lambda d, tok: None) == 1
    assert a.last_committed() == s2

    delivered: list[int] = []

    def fn(batch_df, token):
        delivered.append(token)

    # 1) both reads stale (intent history for the base PRUNED away on
    #    a long-stale straggler): B plans from base None while A's
    #    intents advanced that ledger — the FENCED intent write
    #    collides and B dies with NOTHING delivered (pre-fix: B
    #    delivered the whole table under token s2 with a window A
    #    never planned)
    b._offset_record = lambda: stale_off
    b._find_intent = lambda frm, lo: stale_int
    with pytest.raises(ConcurrentWriterError):
        b.process_available(fn)
    assert delivered == []

    # 2) stale offset, intent-for-base pruned but ledger top LIVE: B
    #    plans fresh and its intent write lands — the offset-fence
    #    RECHECK catches the rival's committed epochs before delivery
    b2 = IcebergChangelogStream(t, ckpt)
    b2._offset_record = lambda: stale_off
    live_int_fence = b2.store.fence("iceberg_changelog_intent")
    b2._find_intent = lambda frm, lo: (None, None, live_int_fence)
    with pytest.raises(ConcurrentWriterError):
        b2.process_available(fn)
    assert delivered == []

    # 3) stale offset on the REPLAY path: B's base (None) matches a
    #    retained intent — including scenario 2's junk (None -> s2),
    #    which is NEWER than A's live first intent. The recheck covers
    #    this path too: junk only exists because its writer was fenced
    #    out, i.e. offsets had advanced, so every later same-base
    #    reader dies here BEFORE delivering the conflicting window
    #    (pre-fix: B delivered (None, s2] under token s2 — a token the
    #    live consumer used for the (s1, s2] window)
    b3 = IcebergChangelogStream(t, ckpt)
    b3._offset_record = lambda: stale_off
    with pytest.raises(ConcurrentWriterError):
        b3.process_available(fn)
    assert delivered == []
    # offset did NOT regress (fresh reader — b3's reads are stale)
    assert IcebergChangelogStream(t, ckpt).last_committed() == s2

    # the surviving consumer continues unharmed past the junk intent
    # scenario 2 appended (its base matches no committed offset)
    t.append_dataframe(spark.createDataFrame([(3, "c")],
                                             "k long, s string"))
    s3 = t.metadata()["current-snapshot-id"]
    assert a.process_available(fn) == 1
    assert delivered[-1] == s3 and a.last_committed() == s3


def test_changelog_stream_junk_intent_does_not_bury_live(
        spark, tmp_path, monkeypatch):
    """review r13 pass 3 (the one interleaving the first fencing cut
    missed): a fenced-out straggler lands ONE junk intent — planned
    from ITS stale base — above a crashed consumer's live
    delivered-but-uncommitted intent before the offset recheck kills
    it. The restarting consumer must still replay ITS OWN intent
    (matched by base, newest-first), not take the junk top record,
    re-slice a wider window, and re-deliver applied rows under a
    never-seen token. Offsets only advance, so junk bases can never
    collide with a live base."""
    import json as _json

    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream
    from gobblin_spark.streaming import changelog_stream as CS

    loc = str(tmp_path / "clsjunk")
    ckpt = str(tmp_path / "clsjunk_ckpt")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    t.append_dataframe(df.coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]

    sink: dict[int, list] = {}
    calls: list[int] = []

    def fn(batch_df, token):
        calls.append(token)
        sink.setdefault(token, sorted(
            (r.k, r._change_type) for r in batch_df.collect()))

    a = IcebergChangelogStream(t, ckpt)
    assert a.process_available(fn) == 1      # offset at s1

    # A delivers (s1, s2] under token s2, crashes before the commit
    t.append_dataframe(spark.createDataFrame([(2, "b")],
                                             "k long, s string"))
    s2 = t.metadata()["current-snapshot-id"]
    real_commit = IcebergChangelogStream._commit_offset
    monkeypatch.setattr(
        IcebergChangelogStream, "_commit_offset",
        lambda self, sid, ep, *a: (_ for _ in ()).throw(
            OSError("crash")))
    with pytest.raises(OSError, match="crash"):
        IcebergChangelogStream(t, ckpt).process_available(fn)
    assert calls[-1] == s2
    monkeypatch.setattr(IcebergChangelogStream, "_commit_offset",
                        real_commit)

    # the straggler's junk record lands ABOVE the live intent (its
    # base — a long-expired offset — matches nothing current)
    a.store.commit(CS._INTENT, _json.dumps(
        {"from": -424242, "to": -424242, "epoch": 0}))

    # new upstream commits make re-slicing tempting: a top-record
    # reader would plan (s1, s3] and re-deliver s2's rows under the
    # never-seen token s3
    t.append_dataframe(spark.createDataFrame([(3, "c")],
                                             "k long, s string"))
    s3 = t.metadata()["current-snapshot-id"]

    restarted = IcebergChangelogStream(t, ckpt)
    assert restarted.process_available(fn) == 2
    assert calls[-2:] == [s2, s3]            # own intent FIRST, intact
    assert sink[s2] == [(2, "insert")]       # byte-identical replay
    assert sink[s3] == [(3, "insert")]       # junk never delivered
    assert restarted.last_committed() == s3


def test_changelog_stream_junk_head_coinciding_with_base(
        spark, tmp_path, monkeypatch):
    """The model checker's counterexample to the first junk fix
    (tests/test_changelog_stream_model.py, 'content_break'): junk
    whose HEAD merely coincides with the current base — here
    (None -> s1) landing above the live (s1 -> s2) intent while s1 is
    the committed offset. A content-bounded scan (break at to == frm)
    misses the live intent below the junk and re-slices; the
    seq-bounded scan (floor = the intent that committed s1, recorded
    in the offset payload) skips the junk by base and replays the
    live intent's token."""
    import json as _json

    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream
    from gobblin_spark.streaming import changelog_stream as CS

    loc = str(tmp_path / "clsjunk2")
    ckpt = str(tmp_path / "clsjunk2_ckpt")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    t.append_dataframe(df.coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]

    sink: dict[int, list] = {}
    calls: list[int] = []

    def fn(batch_df, token):
        calls.append(token)
        sink.setdefault(token, sorted(
            (r.k, r._change_type) for r in batch_df.collect()))

    a = IcebergChangelogStream(t, ckpt)
    assert a.process_available(fn) == 1      # offset s1, intent (None->s1)

    t.append_dataframe(spark.createDataFrame([(2, "b")],
                                             "k long, s string"))
    s2 = t.metadata()["current-snapshot-id"]
    real_commit = IcebergChangelogStream._commit_offset
    monkeypatch.setattr(
        IcebergChangelogStream, "_commit_offset",
        lambda self, sid, ep, *rest: (_ for _ in ()).throw(
            OSError("crash")))
    with pytest.raises(OSError, match="crash"):
        IcebergChangelogStream(t, ckpt).process_available(fn)
    assert calls[-1] == s2                   # (s1,s2] delivered, no commit
    monkeypatch.setattr(IcebergChangelogStream, "_commit_offset",
                        real_commit)

    # straggler junk: a (None -> s1) record above the live (s1 -> s2)
    # intent — its head IS the committed base
    a.store.commit(CS._INTENT, _json.dumps(
        {"from": None, "to": s1, "epoch": 0}))
    t.append_dataframe(spark.createDataFrame([(3, "c")],
                                             "k long, s string"))
    s3 = t.metadata()["current-snapshot-id"]

    restarted = IcebergChangelogStream(t, ckpt)
    assert restarted.process_available(fn) == 2
    assert calls[-2:] == [s2, s3]            # live intent replayed intact
    assert sink[s2] == [(2, "insert")]
    assert sink[s3] == [(3, "insert")]
    assert restarted.last_committed() == s3


def test_changelog_stream_steady_state_ledger_reads_bounded(
        spark, tmp_path):
    """review r13 pass 4: the steady-state epoch must NOT scan every
    retained intent file (prune keeps 20; a 10s-trigger consumer would
    pay ~170k extra remote reads/day). _find_intent's scan floor is
    the SEQUENCE of the intent that committed this base (recorded in
    the offset payload) — the ledger top IS that floor in steady
    state, so a fresh-plan epoch reads ZERO intent files: the whole
    epoch costs the two offset reads (the epoch's own + the final
    no-work check)."""
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.state import WatermarkStore
    from gobblin_spark.streaming import IcebergChangelogStream

    loc = str(tmp_path / "clsreads")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    ckpt = str(tmp_path / "clsreads_ckpt")
    cs = IcebergChangelogStream(t, ckpt, max_snapshots_per_batch=1)
    for i in range(6):   # build up retained intent history
        t.append_dataframe(spark.createDataFrame(
            [(i, "x")], "k long, s string"))
    assert cs.process_available(lambda d, tok: None) == 6
    # floor-pruned each epoch: exactly the newest intent survives
    assert len(cs.store._entries("iceberg_changelog_intent")) == 1

    reads = []
    real = WatermarkStore._read_json
    cs.store._read_json = lambda path: (reads.append(path),
                                        real(cs.store, path))[1]
    t.append_dataframe(spark.createDataFrame([(99, "z")],
                                             "k long, s string"))
    assert cs.process_available(lambda d, tok: None) == 1
    # exactly the 2 offset reads (epoch + final no-work check);
    # ZERO intent reads — the scan floor equals the ledger top
    assert len(reads) <= 2, reads
    assert not [p for p in reads if "intent" in p], reads


def test_epoch_stats_bounded_on_replay_too(spark, tmp_path, monkeypatch):
    """audit r13: the replay branch appended EpochStats WITHOUT the
    retention bound the main path applies — a long-lived stream that
    keeps replaying (e.g. a stuck upstream re-delivering one epoch)
    would grow driver memory without limit. Both paths share
    STATS_CAP now."""
    from gobblin_spark.state import WatermarkStore
    from gobblin_spark.streaming import runner as R

    monkeypatch.setattr(R, "STATS_CAP", 5)
    spec = R.IngestSpec(final_dir=str(tmp_path / "o"), ts_col="ts")
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    token = "tok"
    # pre-commit a marker claiming epoch 100 is done: every call below
    # is a replay
    import json as _json
    store.commit(R._epoch_marker(spec, token),
                 _json.dumps({"epoch": 100, "frontier": None}))
    fn = R._epoch_fn(spec, store, token)
    df = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1))], "k long, ts timestamp")
    for i in range(12):
        fn(df, 7)   # epoch 7 <= marker 100 -> replay branch
    assert all(s.replayed for s in spec.stats)
    assert len(spec.stats) == 5  # bounded, not 12


def test_changelog_stream_survives_torn_commit_plus_prune(
        spark, tmp_path):
    """review r13 pass 5 (model check 'count_prune' counterexample,
    pinned against the real code): a rival's TORN offset commit lands
    above the live consumer's parseable record; the live consumer's
    next epoch prunes. A keep-newest-K-files prune (K small or torn
    records plentiful) would delete the parseable record, silently
    resetting the stream to base None and re-delivering everything
    under reused tokens. The floor prune keeps committed state; the
    consumer continues from its true base."""
    from gobblin_spark.sinks.iceberg import IcebergTable
    from gobblin_spark.streaming import IcebergChangelogStream
    from gobblin_spark.streaming import changelog_stream as CS

    loc = str(tmp_path / "clstorn")
    ckpt = str(tmp_path / "clstorn_ckpt")
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = IcebergTable.create(spark, loc, df.schema)
    t.append_dataframe(df.coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]

    calls: list[tuple] = []

    def fn(batch_df, token):
        calls.append((token, sorted(r.k for r in batch_df.collect())))

    cs = IcebergChangelogStream(t, ckpt)
    assert cs.process_available(fn) == 1     # offset s1 committed
    assert calls == [(s1, [1])]

    # a crashed rival's torn offset commit above the parseable record
    fs, jvm = cs.store._fs()
    top = cs.store.fence(CS._DATASET)
    fs.create(jvm.org.apache.hadoop.fs.Path(
        f"{cs.store.root}/{CS._DATASET}/wm-{top + 1:010d}.json"),
        False).close()

    # next epoch: the fresh consumer must read base s1 (NOT reset to
    # None), deliver only the delta, and its prune must keep s1's
    # committed record
    t.append_dataframe(spark.createDataFrame([(2, "b")],
                                             "k long, s string"))
    s2 = t.metadata()["current-snapshot-id"]
    cs2 = IcebergChangelogStream(t, ckpt)
    assert cs2.process_available(fn) == 1
    assert calls[-1] == (s2, [2])            # delta only — no reset
    assert cs2.last_committed() == s2
    # the parseable history survived the prune (floor = own seq - 200)
    seqs = [s for s, _ in cs2.store._entries(CS._DATASET)]
    assert top in seqs and top + 2 in seqs
