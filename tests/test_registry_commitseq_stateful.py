"""Schema registry, schema evolution, commit sequences, metadata
sidecar, stateful streaming operators."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark import schema as S
from gobblin_spark.sources.registry import FileSchemaRegistry, schema_id


V1 = {"type": "record", "name": "E", "fields": [
    {"name": "id", "type": "long"},
    {"name": "v", "type": "int"},
]}
V2 = {"type": "record", "name": "E", "fields": [
    {"name": "id", "type": "long"},
    {"name": "v", "type": "long"},                      # promoted
    {"name": "tag", "type": ["null", "string"]},         # added nullable
]}
BAD = {"type": "record", "name": "E", "fields": [
    {"name": "id", "type": "string"},                   # long -> string: no
]}


def test_registry_register_lookup(tmp_path):
    reg = FileSchemaRegistry(str(tmp_path))
    sid1 = reg.register("events", V1)
    assert sid1 == schema_id(V1)
    assert reg.register("events", V1) == sid1       # idempotent
    assert len(reg.history("events")) == 1
    sid2 = reg.register("events", V2)               # backward-compatible
    assert reg.latest("events") == V2
    assert reg.by_id(sid1) == V1 and reg.by_id(sid2) == V2
    with pytest.raises(ValueError):
        reg.register("events", BAD)                 # incompatible rejected
    assert isinstance(reg.latest_struct("events"), T.StructType)


def test_registry_version_race_single_winner(tmp_path):
    """audit r12: two concurrent registrations both computed latest+1
    and left TWO files claiming one version number — latest() then
    depended on path sort order. r13 (ADVICE): the list-after-write
    tiebreak was itself check-then-act — the claim is now an atomic
    os.link onto a canonical per-version name. A pre-existing claim at
    our target version simply moves us to the next one."""
    reg = FileSchemaRegistry(str(tmp_path))
    reg.register("events", V1)
    # plant a rival claim at version 2 (legacy-style suffixed name)
    rival = {"type": "record", "name": "E", "fields": [
        {"name": "id", "type": "long"},
        {"name": "v", "type": "int"},
        {"name": "r", "type": ["null", "string"]}]}
    rid = schema_id(rival)
    os.makedirs(os.path.join(str(tmp_path), "events"), exist_ok=True)
    with open(os.path.join(str(tmp_path), "events",
                           "v000002-00000000.json"), "w") as f:
        json.dump({"id": rid, "version": 2, "subject": "events",
                   "schema": rival}, f)
    # our registration must land cleanly at v3
    sid2 = reg.register("events", V2, check_compat=False)
    hist = reg.history("events")
    assert len(hist) == 3 and hist[-1] == V2
    versions = [v for v, _ in reg._versions("events")]
    assert versions == [1, 2, 3]  # no duplicate version numbers
    assert reg.by_id(sid2) == V2
    # no temp claim files left behind
    assert not [n for n in os.listdir(os.path.join(str(tmp_path), "events"))
                if n.endswith(".tmp")]


def test_registry_legacy_tied_versions_collapse(tmp_path):
    """r13 (ADVICE): a legacy registry can hold TWO files at one version
    (the pre-atomic race's residue). The declared winner was the
    lexicographically SMALLEST path, but latest()/history()/by_id()
    read the sorted list's LAST entry — the largest path. All readers
    now collapse ties to the smallest-path winner."""
    reg = FileSchemaRegistry(str(tmp_path))
    winner = V1
    loser = {"type": "record", "name": "E", "fields": [
        {"name": "id", "type": "string"}]}
    d = os.path.join(str(tmp_path), "events")
    os.makedirs(d)
    with open(os.path.join(d, "v000001-00000000.json"), "w") as f:
        json.dump({"id": schema_id(winner), "version": 1,
                   "subject": "events", "schema": winner}, f)
    with open(os.path.join(d, "v000001-ffffffff.json"), "w") as f:
        json.dump({"id": schema_id(loser), "version": 1,
                   "subject": "events", "schema": loser}, f)
    assert reg.latest("events") == winner
    assert reg.history("events") == [winner]
    assert reg.by_id(schema_id(winner)) == winner
    # the loser was never registered under single-winner semantics
    assert reg.by_id(schema_id(loser)) is None
    # and a fresh registration of the loser's schema gets a NEW version
    # (the idempotent fast path must not match the loser's residue)
    sid = reg.register("events", loser, check_compat=False)
    assert reg.latest("events") == loser
    assert [v for v, _ in reg._versions("events")] == [1, 2]
    assert reg.by_id(sid) == loser


def test_registry_link_unsupported_fallback(tmp_path, monkeypatch):
    """review r13: os.link is unsupported on object-store FUSE mounts
    (a deployment the module docstring explicitly supports) — register
    must fall back to an O_EXCL create, stay single-winner, and every
    reader must tolerate the fallback's one risk: a torn payload from
    a writer that crashed mid-write (the burned version number keeps
    allocation moving)."""
    import errno

    from gobblin_spark.sources import registry as reg_mod

    def no_link(src, dst):
        raise OSError(errno.ENOTSUP, "Operation not supported")

    monkeypatch.setattr(reg_mod.os, "link", no_link)
    reg = FileSchemaRegistry(str(tmp_path))
    sid1 = reg.register("events", V1)
    assert reg.by_id(sid1) == V1 and reg.latest("events") == V1
    assert reg.register("events", V1) == sid1          # idempotent
    sid2 = reg.register("events", V2)
    assert reg.latest("events") == V2
    assert [v for v, _ in reg._versions("events")] == [1, 2]
    monkeypatch.undo()

    # torn payload at the top version: readers skip it, register burns
    # past it
    d = os.path.join(str(tmp_path), "events")
    with open(os.path.join(d, "v000003.json"), "w") as f:
        f.write('{"id": "tor')   # crashed mid-write
    assert reg.latest("events") == V2
    assert reg.history("events") == [V1, V2]
    assert reg.by_id(sid2) == V2
    rival = {"type": "record", "name": "E", "fields": [
        {"name": "id", "type": "long"},
        {"name": "v", "type": "long"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "x", "type": ["null", "long"]}]}
    sid3 = reg.register("events", rival)
    assert reg.latest("events") == rival
    assert [v for v, _ in reg._versions("events")] == [1, 2, 3, 4]
    assert reg.by_id(sid3) == rival


def test_registry_torn_canonical_does_not_shadow_legacy(tmp_path):
    """review r13 pass 2: a TORN canonical file (crashed O_EXCL-
    fallback writer) must not win a same-version tie over an intact
    legacy record — the legacy registration already returned success
    and must stay readable."""
    reg = FileSchemaRegistry(str(tmp_path))
    reg.register("events", V1)
    d = os.path.join(str(tmp_path), "events")
    # intact legacy record at v2...
    with open(os.path.join(d, "v000002-cccccccc.json"), "w") as f:
        json.dump({"id": schema_id(V2), "version": 2,
                   "subject": "events", "schema": V2}, f)
    # ...and a torn canonical claim at the same version
    with open(os.path.join(d, "v000002.json"), "w") as f:
        f.write('{"id": "to')
    assert reg.latest("events") == V2
    assert reg.by_id(schema_id(V2)) == V2
    assert reg.history("events") == [V1, V2]


def test_registry_load_propagates_real_io_errors(tmp_path, monkeypatch):
    """review r13 pass 2: _load must not mask EACCES / network-FS
    faults as 'schema never registered' — that fails decodes with the
    wrong error and silently skips the backward-compat gate."""
    import builtins

    reg = FileSchemaRegistry(str(tmp_path))
    sid1 = reg.register("events", V1)
    real_open = builtins.open

    def denied(path, *a, **kw):
        if str(path).endswith(".json") and "events" in str(path):
            raise PermissionError(13, "Permission denied", str(path))
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", denied)
    with pytest.raises(PermissionError):
        reg.by_id(sid1)
    with pytest.raises(PermissionError):
        reg.latest("events")
    with pytest.raises(PermissionError):
        reg.register("events", BAD)   # compat gate must not be skipped


def test_registry_rolling_upgrade_tie_prefers_atomic_claim(tmp_path):
    """review r13: during a mixed old/new rolling upgrade a legacy
    writer can land v000002-cccc.json while a new writer links
    v000002.json — '-' sorts before '.', so the old smallest-path
    collapse would declare the LEGACY file the winner after the new
    register() already returned success (by_id of the returned sid
    would find nothing). The atomic-claim canonical name now wins
    same-version ties outright."""
    reg = FileSchemaRegistry(str(tmp_path))
    reg.register("events", V1)
    sid2 = reg.register("events", V2)      # claims v000002.json
    # a legacy racer writes its suffixed claim at the same version
    rival = {"type": "record", "name": "E", "fields": [
        {"name": "id", "type": "long"}]}
    d = os.path.join(str(tmp_path), "events")
    with open(os.path.join(d, "v000002-cccccccc.json"), "w") as f:
        json.dump({"id": schema_id(rival), "version": 2,
                   "subject": "events", "schema": rival}, f)
    assert reg.latest("events") == V2          # not the legacy racer
    assert reg.by_id(sid2) == V2               # the returned sid resolves
    assert reg.history("events") == [V1, V2]
    assert reg.by_id(schema_id(rival)) is None


def _register_worker(root, subject, schema, barrier, no_link=False):
    if no_link:
        import errno

        def _no_link(src, dst):
            raise OSError(errno.ENOTSUP, "Operation not supported")
        from gobblin_spark.sources import registry as reg_mod
        reg_mod.os.link = _no_link   # process-local (forked child)
    reg = FileSchemaRegistry(root)
    barrier.wait(timeout=30)
    return reg.register(subject, schema, check_compat=False)


import pytest as _pytest


@_pytest.mark.parametrize("no_link", [False, True],
                          ids=["link", "o_excl_fallback"])
def test_registry_concurrent_register_stress(tmp_path, no_link):
    """verdict-r12 #1: stress the single-winner claim MULTI-PROCESS,
    not just with a planted rival. 8 processes register concurrently —
    6 distinct schemas + 2 duplicating one of them — released by a
    barrier so the latest+1 computations genuinely collide. Versions
    must come out unique and contiguous, each distinct schema exactly
    once, and the duplicate registrations must dedup to one id.
    Parametrized over BOTH claim paths: link(2) and the O_EXCL
    fallback for filesystems without hard links (review r13)."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    schemas = [{"type": "record", "name": f"S{i}", "fields": [
        {"name": "id", "type": "long"},
        {"name": f"f{i}", "type": "string"}]} for i in range(6)]
    jobs = schemas + [schemas[0], schemas[0]]  # two racing duplicates
    manager = ctx.Manager()
    barrier = manager.Barrier(len(jobs))
    with ctx.Pool(len(jobs)) as pool:
        results = [pool.apply_async(
            _register_worker,
            (str(tmp_path), "events", s, barrier, no_link))
            for s in jobs]
        sids = [r.get(timeout=60) for r in results]
    reg = FileSchemaRegistry(str(tmp_path))
    versions = reg._versions("events")
    # contiguous, duplicate-free version chain — one per DISTINCT schema
    assert [v for v, _ in versions] == list(range(1, len(schemas) + 1))
    recs = [json.load(open(p)) for _, p in versions]
    assert sorted(r["id"] for r in recs) == sorted(schema_id(s) for s in schemas)
    # each claimed version number matches its payload's version stamp
    assert all(r["version"] == v for (v, _), r in zip(versions, recs))
    # the duplicate registrations returned the same id
    assert sids.count(schema_id(schemas[0])) == 3
    # every registered schema resolves by id
    for s in schemas:
        assert reg.by_id(schema_id(s)) == s
    # no torn temp files
    assert not [n for n in os.listdir(os.path.join(str(tmp_path), "events"))
                if n.endswith(".tmp")]


def test_conform_to_and_evolve_union(spark):
    old = spark.createDataFrame([(1, 10)], "id LONG, v INT")
    new_t = S.avro_to_struct(V2)
    conformed = S.conform_to(old, new_t)
    assert dict(conformed.dtypes) == {"id": "bigint", "v": "bigint", "tag": "string"}
    assert conformed.first().tag is None

    newer = spark.createDataFrame([(2, 20, "x")], "id LONG, v LONG, tag STRING")
    merged = S.evolve_union([old, newer])
    assert merged.count() == 2
    assert dict(merged.dtypes)["v"] == "bigint"
    with pytest.raises(ValueError):
        S.conform_to(spark.createDataFrame([("a",)], "id STRING"), new_t)


def test_commit_sequence_exec_and_replay(spark, sf_dir, tmp_path):
    from gobblin_spark.sinks import publish as P
    from gobblin_spark.sinks.commit_sequence import (
        CommitSequenceStore, Sequence, marker_step, publish_step, watermark_step,
    )
    from gobblin_spark.sources import files
    from gobblin_spark.state import WatermarkStore

    ev = files.load_table(spark, sf_dir, "events").limit(100)
    final = str(tmp_path / "out")
    staged = P.stage(ev, final)
    wm_root = str(tmp_path / "wm")
    seq = Sequence("job1", [
        publish_step(staged.staging_dir, final),
        watermark_step(wm_root, "events",
                       {"kind": "timestamp", "value": "2024-02-01T00:00:00"}),
        marker_step(str(tmp_path / "done.marker")),
    ])
    store = CommitSequenceStore(spark, str(tmp_path / "seqs"))

    # simulate crash: persist, execute only step 1 manually, "crash"
    store.persist(seq)
    store._run_step(seq.steps[0])
    seq.steps[0].done = True
    store.persist(seq)

    # recovery: pending sequence found, replay finishes remaining steps;
    # step 1 replay is a no-op (staging gone, final published)
    assert [s.job_id for s in store.pending()] == ["job1"]
    done = store.recover()
    assert done == ["job1"] and store.pending() == []
    assert P.is_published(spark, final)
    assert WatermarkStore(spark, wm_root).get("events") == dt.datetime(2024, 2, 1)
    assert os.path.exists(str(tmp_path / "done.marker"))

    # full replay of an already-completed sequence is harmless
    for s in seq.steps:
        s.done = False
    store.execute(seq)
    assert WatermarkStore(spark, wm_root).history("events") == [dt.datetime(2024, 2, 1)]


def test_commit_sequence_torn_journal_falls_back(spark, tmp_path):
    """Audit-r7: the journal is versioned on the Hadoop FS — a torn
    newest version (crash mid-write; Hadoop rename has no os.replace
    atomicity to lean on) must fall back to the previous parseable
    version instead of losing the pending sequence."""
    from gobblin_spark.sinks.commit_sequence import (
        CommitSequenceStore, Sequence, marker_step,
    )

    store = CommitSequenceStore(spark, str(tmp_path / "seqs"))
    seq = Sequence("jobT", [marker_step(str(tmp_path / "m1"))])
    store.persist(seq)
    seq.steps[0].done = True
    store.persist(seq)  # v2 prunes v1
    names = sorted(os.listdir(tmp_path / "seqs"))
    assert [n for n in names if n.endswith(".json")] == ["seq-jobT.v2.json"]
    # torn next version: unparseable partial write at v3
    (tmp_path / "seqs" / "seq-jobT.v3.json").write_text('{"job_id": "jo')
    got = store.pending()
    assert len(got) == 1 and got[0].steps[0].done  # v2 state recovered
    store.delete("jobT")
    assert store.pending() == []
    assert not [n for n in os.listdir(tmp_path / "seqs")
                if n.endswith(".json")]


def test_publish_metadata_sidecar(spark, sf_dir, tmp_path):
    from gobblin_spark.operators import quality
    from gobblin_spark.sinks import publish as P
    from gobblin_spark.sources import files

    ev = files.load_table(spark, sf_dir, "events").limit(50)
    final = str(tmp_path / "out")
    staged = P.stage(ev, final)
    P.audit(staged, spark, [lambda d: quality.row_count_policy(50, d.count())])
    P.commit([staged], spark)
    path = P.write_publish_metadata(staged, spark, extra={"job": "j1"})
    meta = json.load(open(path.replace("file:", "")))
    assert meta["files"] >= 1 and meta["audits"][0]["passed"] and meta["job"] == "j1"


def test_stateful_dedup_stream(spark, tmp_path):
    """Keys repeated across epochs are emitted exactly once."""
    from gobblin_spark.streaming.stateful import stateful_dedup_stream

    sch = "k STRING, v INT"
    indir = tmp_path / "in"
    spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], sch) \
        .coalesce(1).write.parquet(str(indir / "b1"))
    spark.createDataFrame([("b", 4), ("c", 5)], sch) \
        .coalesce(1).write.parquet(str(indir / "b2"))

    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1") \
        .parquet(str(indir / "*"))
    out = stateful_dedup_stream(stream, "k")
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("dedup_out").collect()
    assert sorted(r.key for r in rows) == ["a", "b", "c"]  # each key once


def test_sessionize_stream(spark, tmp_path):
    from gobblin_spark.streaming.stateful import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    sch = "u STRING, ts TIMESTAMP"
    rows1 = [("u1", t0), ("u1", t0 + dt.timedelta(seconds=10))]
    rows2 = [("u1", t0 + dt.timedelta(hours=2)),  # closes session 1
             ("u1", t0 + dt.timedelta(hours=2, seconds=5))]
    indir = tmp_path / "in"
    spark.createDataFrame(rows1, sch).coalesce(1).write.parquet(str(indir / "b1"))
    spark.createDataFrame(rows2, sch).coalesce(1).write.parquet(str(indir / "b2"))

    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1") \
        .parquet(str(indir / "*"))
    out = sessionize_stream(stream, "u", "ts", gap_seconds=600)
    q = (out.writeStream.format("memory").queryName("sess_out")
         .outputMode("append").option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("sess_out").collect()
    assert len(rows) == 1  # first session closed by the hour-2 event
    r = rows[0]
    assert r.n_events == 2 and r.session_start == t0
    assert r.session_end == t0 + dt.timedelta(seconds=10)


def test_sessionize_late_events_widen_start_and_nat_dropped(spark, tmp_path):
    """Audit r9: (1) a LATE event earlier than the open session's
    start must widen session_start — the batch twin (native
    session_window) reports the earliest event; the old code kept the
    stale start. (2) NaT timestamps are not events: their int64
    sentinel silently inflated n_events."""
    from gobblin_spark.streaming.stateful import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 1, 0, 0)
    sch = "u STRING, ts TIMESTAMP"
    indir = tmp_path / "in"
    # batch 1 opens a session at t0; includes a NaT row (not an event)
    spark.createDataFrame(
        [("u1", t0), ("u1", None)], sch
    ).coalesce(1).write.parquet(str(indir / "b1"))
    # batch 2: a LATE event 2 min BEFORE t0 (inside the gap) widens
    # the open session backward
    spark.createDataFrame(
        [("u1", t0 - dt.timedelta(seconds=120))], sch
    ).coalesce(1).write.parquet(str(indir / "b2"))
    # batch 3 closes the session
    spark.createDataFrame(
        [("u1", t0 + dt.timedelta(hours=3))], sch
    ).coalesce(1).write.parquet(str(indir / "b3"))

    stream = spark.readStream.schema(sch) \
        .option("maxFilesPerTrigger", "1").parquet(str(indir / "*"))
    out = sessionize_stream(stream, "u", "ts", gap_seconds=600)
    q = (out.writeStream.format("memory").queryName("sess_late")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "cklate"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("sess_late").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_events == 2  # t0 + the late event; NaT did not count
    assert r.session_start == t0 - dt.timedelta(seconds=120)
    assert r.session_end == t0


def test_sessionize_timeout_flushes_idle_key(spark, tmp_path):
    """An idle key's open session is emitted by the processing-time
    timeout once later batches run without touching it."""
    import datetime as dt
    import time

    from gobblin_spark.streaming.stateful import (
        sessionize_stream_with_timeout)

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(seconds=30))],
        "user_id long, ts timestamp_ntz").write.parquet(src)
    sdf = (spark.readStream.schema("user_id long, ts timestamp_ntz")
           .parquet(src).withColumn("ts", F.col("ts").cast("timestamp")))
    out = sessionize_stream_with_timeout(
        sdf, "user_id", "ts", gap_seconds=300, idle_timeout_ms=3000)
    q = (out.writeStream.format("memory").queryName("sess_to")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        # key 1 goes idle; push other keys so later batches keep firing
        fired = False
        while time.time() < deadline:
            if spark.table("sess_to").filter("key = 1").count() == 1:
                fired = True
                break
            spark.createDataFrame(
                [(99, dt.datetime(2024, 1, 2))],
                "user_id long, ts timestamp_ntz"
            ).write.mode("append").parquet(src)
            time.sleep(2)
        assert fired, "idle session never flushed"
        row = spark.table("sess_to").filter("key = 1").first()
        assert row.n_events == 2
        assert (row.session_end - row.session_start).total_seconds() == 30
    finally:
        q.stop()
        q.awaitTermination(60)


def test_recover_isolates_poisoned_sequence(spark, tmp_path):
    """Audit r10: one poisoned pending sequence must not strand the
    others — recovery drains every recoverable sequence first, then
    raises naming the failures and the survivors."""
    import os

    import pytest

    from gobblin_spark.sinks import publish as P
    from gobblin_spark.sinks.commit_sequence import (
        CommitSequenceStore, Sequence, marker_step, publish_step,
    )
    from gobblin_spark.sources import files

    store = CommitSequenceStore(spark, str(tmp_path / "seqs"))
    # poisoned: staging dir never existed AND final never published
    bad = Sequence("bad_job", [
        publish_step(str(tmp_path / "ghost_staging"),
                     str(tmp_path / "ghost_final")),
    ])
    store.persist(bad)
    # healthy: a real staged dataset + marker
    ev = files.load_table(spark, "/root/testdata/sf0.001", "events").limit(10)
    final = str(tmp_path / "ok_out")
    staged = P.stage(ev, final)
    good = Sequence("ok_job", [
        publish_step(staged.staging_dir, final),
        marker_step(str(tmp_path / "ok.marker")),
    ])
    store.persist(good)

    with pytest.raises(RuntimeError, match="'bad_job'.*recovered.*ok_job"):
        store.recover()
    # the healthy sequence completed and its journal is gone
    assert P.is_published(spark, final)
    assert os.path.exists(str(tmp_path / "ok.marker"))
    assert [s.job_id for s in store.pending()] == ["bad_job"]


def test_registry_young_torn_claims_get_grace(tmp_path, monkeypatch):
    """review r13 passes 5-6: a TORN version file may be an O_EXCL-
    fallback racer INSIDE its create->write window, not a crashed
    claim. Treating it as never-happened immediately would skip the
    compat gate against (or duplicate the sid of) a registration that
    completes an instant later. A torn file younger than
    TORN_GRACE_SEC gets graced with a rescan — by mtime WALL TIME
    (independent of scan speed) and at ANY version (a newer claim may
    land above a still-mid-write racer) — while an aged (crashed)
    claim is passed without stalling progress. Grace rescans do not
    consume the 16 claim attempts."""
    import time as _time

    real_versions = FileSchemaRegistry._versions

    # A) racer completes between the scans: the grace rescan sees its
    #    payload and the compat gate RUNS (pre-fix: a single scan
    #    treated it as dead and claimed v2 with no compat check)
    sub = tmp_path / "events"
    sub.mkdir()
    v1 = sub / "v000001.json"
    v1.write_text("")                       # racer mid-write (torn)
    racer_payload = json.dumps({"id": schema_id(V1), "version": 1,
                                "subject": "events", "schema": V1})
    scans = []

    def spy(self, subject):
        scans.append(1)
        if len(scans) == 2 and v1.read_text() == "":
            v1.write_text(racer_payload)    # racer's write lands
        return real_versions(self, subject)

    monkeypatch.setattr(FileSchemaRegistry, "_versions", spy)
    reg = FileSchemaRegistry(str(tmp_path))
    with pytest.raises(ValueError, match="not backward-compatible"):
        reg.register("events", BAD)
    assert len(scans) == 2                  # one grace rescan sufficed
    monkeypatch.undo()

    # B) racer registering OUR schema, and its torn claim is NOT the
    #    top (an intact claim landed above it): grace must still fire
    #    — the top-only heuristic left this shape a duplicate-sid hole
    sub2 = tmp_path / "dup"
    sub2.mkdir()
    d1 = sub2 / "v000001.json"
    d1.write_text("")                       # racer mid-write at v1
    d2_payload = {"id": schema_id(V2), "version": 2, "subject": "dup",
                  "schema": V2}
    (sub2 / "v000002.json").write_text(json.dumps(d2_payload))
    scans2 = []

    def spy2(self, subject):
        scans2.append(1)
        if len(scans2) == 2 and d1.read_text() == "":
            d1.write_text(json.dumps({"id": schema_id(V1), "version": 1,
                                      "subject": "dup", "schema": V1}))
        return real_versions(self, subject)

    monkeypatch.setattr(FileSchemaRegistry, "_versions", spy2)
    assert FileSchemaRegistry(str(tmp_path)).register("dup", V1) \
        == schema_id(V1)                    # idempotent — no v3 claim
    assert sorted(p.name for p in sub2.iterdir()) == \
        ["v000001.json", "v000002.json"]
    monkeypatch.undo()

    # C) a genuinely CRASHED claim (aged past the grace) is passed
    #    immediately: burned version, progress holds, no stall
    sub3 = tmp_path / "crashed"
    sub3.mkdir()
    c1 = sub3 / "v000001.json"
    c1.write_text("")
    past = _time.time() - 10
    os.utime(c1, (past, past))              # aged: crashed, not racing
    t0 = _time.time()
    reg3 = FileSchemaRegistry(str(tmp_path))
    assert reg3.register("crashed", V1) == schema_id(V1)
    assert _time.time() - t0 < FileSchemaRegistry.TORN_GRACE_SEC
    assert (sub3 / "v000002.json").exists()
    assert reg3.latest("crashed") == V1


def test_stateful_dedup_rejects_unimplemented_timeout():
    """Audit r13: the timeout parameter was accepted and silently
    ignored — a caller asking for a TTL'd seen-set got exact-dedup
    results instead. Unsupported values now raise by name."""
    import pytest as _pt

    from gobblin_spark.streaming.stateful import stateful_dedup_stream

    with _pt.raises(NotImplementedError, match="NoTimeout"):
        stateful_dedup_stream(None, "k", timeout="ProcessingTime")
