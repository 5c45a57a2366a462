"""Metrics: context tree, context-aware propagation, events,
reporters, and the Observation-based data-plane counters
(MetricContextTest.java / OutputStreamReporterTest.java analogs)."""

import json

from pyspark.sql import functions as F

from gobblin_spark import metrics as M


def test_context_aware_counter_propagates():
    root = M.MetricContext("root")
    job = root.child("job", job_id="j1")
    task = job.child("task", task_id="t1")
    task.counter("rows").inc(5)
    job.counter("rows").inc(2)
    assert task.counter("rows").count == 5
    assert job.counter("rows").count == 7  # own 2 + child 5
    assert root.counter("rows").count == 7
    assert task.tags == {"job_id": "j1", "task_id": "t1"}


def test_timer_and_histogram_snapshot():
    root = M.MetricContext("root")
    h = root.histogram("lat")
    for v in [1.0, 2.0, 3.0, 4.0, 100.0]:
        h.update(v)
    snap = root._get("histogram", "lat").snapshot()
    assert snap["count"] == 5 and snap["min"] == 1.0 and snap["max"] == 100.0
    t = root.timer("dur")
    with t.time():
        pass
    assert root._get("timer", "dur").meter.count == 1


def test_event_submitter_and_jsonl_sink(tmp_path):
    root = M.MetricContext("root")
    sub = M.EventSubmitter("gobblin.test", context=root, cluster="local")
    path = str(tmp_path / "events.jsonl")
    sub.add_sink(M.jsonl_event_sink(path))
    ev = sub.submit("JobCommit", job_id="j1")
    assert ev.namespace == "gobblin.test"
    assert ev.metadata["cluster"] == "local" and ev.metadata["job_id"] == "j1"
    rec = json.loads(open(path).read().strip())
    assert rec["name"] == "JobCommit"
    assert root.counter("rows").count == 0  # meters, not counters
    assert root._get("meter", "events.JobCommit").count == 1


def test_output_stream_reporter_formats():
    import io

    root = M.MetricContext("root")
    root.child("task").counter("rows").inc(3)
    text = M.OutputStreamReporter(root, stream=io.StringIO()).report()
    assert "== root" in text and "== task" in text and "counter:rows: count=3" in text


def test_output_stream_reporter_stop_race():
    """audit r12: stop() during an in-flight tick must win — the old
    re-arm path created a fresh timer AFTER stop() had cancelled the
    one it knew about, so the daemon reported forever. Deterministic
    replay: drive tick() directly with stop() landing mid-report."""
    import io
    import time

    def wait_for(cond, timeout=5.0):
        # poll instead of a fixed sleep — a loaded machine can delay
        # the timer thread well past small wall-clock waits (r12
        # review #5)
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if cond():
                return True
            time.sleep(0.002)
        return False

    root = M.MetricContext("root")
    stream = io.StringIO()
    rep = M.OutputStreamReporter(root, stream=stream)
    rep.start(0.005)
    assert wait_for(lambda: stream.getvalue())  # at least one tick ran
    rep.stop()
    assert rep._stopped
    # deterministic mid-report stop: report() itself calls stop(),
    # simulating the race where stop lands while tick is executing —
    # the tail re-check must refuse to re-arm
    rep2 = M.OutputStreamReporter(root, stream=io.StringIO())
    orig_report = rep2.report
    ticked = []

    def report_and_stop():
        orig_report()
        rep2.stop()
        ticked.append(1)

    rep2.report = report_and_stop
    rep2.start(0.005)
    assert wait_for(lambda: ticked)  # the first tick fired + stopped
    assert rep2._stopped
    assert rep2._timer is None  # no zombie re-arm survived the stop
    # r12 review #3: a stop()+start() pair must not revive a stale
    # tick into a second chain — restart with a clean report() and
    # assert only ONE chain ticks (the generation fences the old one)
    rep2.report = orig_report
    gen_before = rep2._gen
    rep2.start(0.005)
    assert rep2._gen == gen_before + 1
    rep2.stop()
    assert rep2._gen == gen_before + 2  # stop invalidates in-flight


def test_json_file_reporter(tmp_path):
    root = M.MetricContext("root")
    root.counter("files").inc(2)
    path = str(tmp_path / "metrics.jsonl")
    M.JsonFileReporter(root, path).report()
    snap = json.loads(open(path).read())
    assert snap["metrics"]["counter:files"]["count"] == 2


def test_observe_in_plan_counts(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    inst, obs = M.observe(
        df, "m",
        F.count(F.lit(1)).alias("rows"),
        F.sum("v").cast("double").alias("v_sum"),
    )
    out = inst.filter(F.col("id") >= 0)
    assert out.count() == 100  # the action that evaluates the observation
    ctx = M.MetricContext("job")
    vals = M.harvest(obs, ctx)
    assert vals["rows"] == 100
    assert ctx.counter("rows").count == 100
    assert ctx._get("histogram", "v_sum").snapshot()["max"] == 9900.0


def test_accumulator_counter_in_udf(spark):
    acc = M.accumulator_counter(spark)

    def f(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    df = spark.range(50).repartition(4)
    assert df.mapInPandas(f, df.schema).count() == 50
    assert acc.value == 50


def test_pipeline_run_is_instrumented(spark, tmp_path):
    """Every plans.run emits metrics + a lineage JobCommit event."""
    from gobblin_spark import plans
    from gobblin_spark.sources.files import load_table

    out = str(tmp_path / "final")
    pl = plans.Pipeline(
        source=lambda s: load_table(s, "/root/testdata/sf0.001", "region"),
        branches=[plans.Branch("regions", final_dir=out)],
        job_id="metrics-e2e",
    )
    res = plans.run(pl, spark)
    assert res.metrics is not None
    assert res.metrics.counter("records_written").count == 5
    assert res.metrics.counter("files_written").count >= 1
    assert res.metrics._get("timer", "job_duration").meter.count == 1
    [ev] = res.events
    assert ev.name == "JobCommit" and ev.metadata["dest.regions"] == out
    assert ev.metadata["rows.regions"] == "5"


def test_concurrent_metric_registration_loses_nothing(monkeypatch):
    """Audit r13: concurrent flow threads fanning updates up to the
    SAME root context raced _get's get-then-set — two threads each
    constructed the metric, one object became unreachable, and its
    updates were silently lost. The constructor is slowed to widen
    the race window deterministically; with the double-checked lock
    every increment lands in ONE shared counter."""
    import threading
    import time

    from gobblin_spark import metrics as M

    real_init = M.Counter.__init__

    def slow_init(self):
        real_init(self)
        time.sleep(0.002)       # widen the construct window

    monkeypatch.setattr(M.Counter, "__init__", slow_init)
    root = M.MetricContext("race-root")
    rounds, workers = 25, 8
    for r in range(rounds):
        barrier = threading.Barrier(workers)

        def work():
            barrier.wait(timeout=10)
            child = root.child(f"t{threading.get_ident()}")
            child.counter(f"m{r}").inc()    # fans up to root

        ts = [threading.Thread(target=work) for _ in range(workers)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        got = root.counter(f"m{r}").count
        assert got == workers, f"round {r}: lost {workers - got} increments"


def test_snapshot_survives_concurrent_registration():
    """Audit r13: a reporter tick snapshotting the root while flow
    threads register new metrics/children used to die on 'dict
    changed size during iteration'."""
    import threading

    from gobblin_spark import metrics as M

    root = M.MetricContext("snap-root")
    done = threading.Event()
    errs = []

    def register():
        try:
            for i in range(1500):
                c = root.child(f"c{i}")
                c.counter(f"n{i}").inc()
        finally:
            done.set()

    def snap():
        try:
            while not done.is_set():
                root.snapshot(recursive=False)  # the root metric dict
                root.snapshot()                 # and the child list
        except Exception as ex:  # pragma: no cover - the failure mode
            errs.append(ex)
            done.set()

    ts = [threading.Thread(target=register),
          threading.Thread(target=snap)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs


def test_child_is_get_or_create():
    """Review r13 pass 7: a second child() under the same name used to
    construct a REPLACEMENT context, silently orphaning the first
    child's whole metric subtree from snapshots — the same lost-object
    shape as the _get race, one level up. child() now returns the
    existing context with tags merged."""
    from gobblin_spark import metrics as M

    root = M.MetricContext("goc-root")
    a = root.child("job", run="r1")
    a.counter("rows").inc(5)
    b = root.child("job", attempt="2")
    assert b is a
    assert b.tags["run"] == "r1" and b.tags["attempt"] == "2"
    b.counter("rows").inc(2)
    snap = root.snapshot()
    assert len(snap["children"]) == 1
    assert snap["children"][0]["metrics"]["counter:rows"]["count"] == 7
    # root aggregate saw every increment exactly once
    assert root.counter("rows").count == 7
