"""DagProcessingEngine semantics vs the reference's orchestration
procs (DagActionStore.java:38-45 vocabulary; Reevaluate/Kill/Resume/
EnforceDeadline DagProcs). Pure control-plane — no SparkSession."""

import threading
import time

import pytest

from gobblin_spark.plans import dag_engine as E


def _spec(dag_id, jobs, **kw):
    return E.DagSpec(dag_id=dag_id, jobs=jobs, **kw)


def test_linear_dag_runs_in_order(tmp_path):
    order = []
    jobs = [
        E.DagJob("a", lambda c: order.append("a")),
        E.DagJob("b", lambda c: order.append("b"), depends_on=("a",)),
        E.DagJob("c", lambda c: order.append("c"), depends_on=("b",)),
    ]
    eng = E.DagProcessingEngine(E.FSDagStateStore(str(tmp_path)))
    eng.launch(_spec("d1", jobs))
    eng.run_until_idle(30)
    assert order == ["a", "b", "c"]
    assert eng.dag_status("d1") == "COMPLETE"
    eng.shutdown()


def test_failure_cancels_downstream_but_drains_siblings(tmp_path):
    ran = []

    def boom(c):
        raise RuntimeError("boom")

    jobs = [
        E.DagJob("ok", lambda c: ran.append("ok")),
        E.DagJob("bad", boom),
        E.DagJob("after_bad", lambda c: ran.append("after_bad"),
                 depends_on=("bad",)),
        E.DagJob("after_ok", lambda c: ran.append("after_ok"),
                 depends_on=("ok",)),
    ]
    eng = E.DagProcessingEngine()
    eng.launch(_spec("d2", jobs))
    eng.run_until_idle(30)
    st = eng.node_status("d2")
    assert st["bad"] is E.NodeStatus.FAILED
    assert st["after_bad"] is E.NodeStatus.CANCELLED
    assert st["after_ok"] is E.NodeStatus.COMPLETE
    assert eng.dag_status("d2") == "FAILED" and "after_bad" not in ran
    eng.shutdown()


def test_retry_until_max_attempts(tmp_path):
    calls = []

    def flaky(c):
        calls.append(c.attempt)
        if c.attempt < 3:
            raise RuntimeError("transient")

    eng = E.DagProcessingEngine()
    eng.launch(_spec("d3", [E.DagJob("f", flaky, max_attempts=3)]))
    eng.run_until_idle(30)
    assert calls == [1, 2, 3]
    assert eng.dag_status("d3") == "COMPLETE"
    # and a job that never recovers fails after its budget
    calls2 = []

    def dies(c):
        calls2.append(c.attempt)
        raise RuntimeError("always")

    eng.launch(_spec("d3b", [E.DagJob("g", dies, max_attempts=2)]))
    eng.run_until_idle(30)
    assert calls2 == [1, 2] and eng.dag_status("d3b") == "FAILED"
    eng.shutdown()


def test_kill_cancels_running_and_pending(tmp_path):
    started = threading.Event()

    def slow(c):
        started.set()
        while not c.cancelled.is_set():  # cooperative cancel contract
            time.sleep(0.01)

    jobs = [E.DagJob("slow", slow),
            E.DagJob("later", lambda c: None, depends_on=("slow",))]
    eng = E.DagProcessingEngine()
    eng.launch(_spec("d4", jobs))
    t = threading.Thread(target=lambda: (started.wait(10), eng.kill("d4")))
    t.start()
    eng.run_until_idle(30)
    t.join()
    st = eng.node_status("d4")
    assert st["slow"] is E.NodeStatus.CANCELLED
    assert st["later"] is E.NodeStatus.CANCELLED
    assert eng.dag_status("d4") == "CANCELLED"
    eng.shutdown()


def test_kill_single_job_only(tmp_path):
    jobs = [E.DagJob("a", lambda c: None),
            E.DagJob("b", lambda c: time.sleep(0.05))]
    eng = E.DagProcessingEngine()
    eng.launch(_spec("d5", jobs))
    eng.kill("d5", job_name="a")  # queued before the launch drains
    eng.run_until_idle(30)
    st = eng.node_status("d5")
    # a was killed pre-start; b ran to completion (KillDagProc with a
    # job name touches only that node)
    assert st["b"] is E.NodeStatus.COMPLETE
    eng.shutdown()


def test_resume_reruns_only_non_complete(tmp_path):
    ran = []
    fail_once = {"on": True}

    def maybe(c):
        ran.append("maybe")
        if fail_once["on"]:
            raise RuntimeError("first time fails")

    jobs = [E.DagJob("pre", lambda c: ran.append("pre")),
            E.DagJob("maybe", maybe, depends_on=("pre",)),
            E.DagJob("post", lambda c: ran.append("post"),
                     depends_on=("maybe",))]
    eng = E.DagProcessingEngine(E.FSDagStateStore(str(tmp_path)))
    eng.launch(_spec("d6", jobs))
    eng.run_until_idle(30)
    assert eng.dag_status("d6") == "FAILED"
    fail_once["on"] = False
    eng.resume("d6")
    eng.run_until_idle(30)
    assert eng.dag_status("d6") == "COMPLETE"
    assert ran == ["pre", "maybe", "maybe", "post"]  # pre NOT rerun
    eng.shutdown()


def test_flow_finish_deadline_kills(tmp_path):
    def hang(c):
        while not c.cancelled.is_set():
            time.sleep(0.01)

    eng = E.DagProcessingEngine()
    eng.launch(_spec("d7", [E.DagJob("h", hang)],
                     flow_finish_deadline_s=0.2))
    eng.run_until_idle(30)
    assert eng.dag_status("d7") == "CANCELLED"
    assert "finish deadline" in eng._dags["d7"].message
    eng.shutdown()


def test_job_start_deadline_kills_only_stuck_job(tmp_path):
    def slow(c):
        time.sleep(0.4)

    jobs = [E.DagJob("first", slow),
            # never becomes ready before its start deadline
            E.DagJob("stuck", lambda c: None, depends_on=("first",),
                     job_start_deadline_s=0.1)]
    eng = E.DagProcessingEngine()
    eng.launch(_spec("d8", jobs))
    eng.run_until_idle(30)
    st = eng.node_status("d8")
    assert st["first"] is E.NodeStatus.COMPLETE
    assert st["stuck"] is E.NodeStatus.CANCELLED
    eng.shutdown()


def test_crash_recovery_from_state_store(tmp_path):
    store = E.FSDagStateStore(str(tmp_path))
    ran = []
    jobs = [E.DagJob("a", lambda c: ran.append("a")),
            E.DagJob("b", lambda c: ran.append("b"), depends_on=("a",))]
    eng = E.DagProcessingEngine(store)
    eng.launch(_spec("d9", jobs))
    eng.run_until_idle(30)
    assert store.load("d9")["nodes"]["b"]["status"] == "COMPLETE"

    # simulate a crash mid-b: persist a checkpoint with b RUNNING
    doc = store.load("d9")
    doc["nodes"]["b"]["status"] = "RUNNING"
    import json as _j
    with open(store._path("d9"), "w") as f:
        _j.dump(doc, f)

    eng2 = E.DagProcessingEngine(store)
    assert eng2.register_recovered(_spec("d9", jobs))
    eng2.run_until_idle(30)
    # a (COMPLETE in the checkpoint) did not rerun; b did
    assert ran == ["a", "b", "b"]
    assert eng2.dag_status("d9") == "COMPLETE"
    eng2.clean_up("d9")
    assert store.load("d9") is None
    eng2.shutdown()


def test_unknown_dag_action_is_noop(tmp_path):
    eng = E.DagProcessingEngine()
    eng.kill("ghost")
    eng.run_until_idle(5)  # must not raise (KillDagProc.java:63)
    eng.shutdown()


def test_resume_restarts_deadline_clock(tmp_path):
    eng = E.DagProcessingEngine()
    eng.launch(_spec("d10", [E.DagJob("x", lambda c: None)],
                     flow_finish_deadline_s=30.0))
    eng.run_until_idle(30)
    before = eng._dags["d10"].launched_at
    time.sleep(0.02)
    eng.resume("d10")
    eng.run_until_idle(30)
    assert eng._dags["d10"].launched_at >= before
    eng.shutdown()


def test_state_store_checkpoints_attempts(tmp_path):
    store = E.FSDagStateStore(str(tmp_path))

    def flaky(c):
        if c.attempt == 1:
            raise RuntimeError("once")

    eng = E.DagProcessingEngine(store)
    eng.launch(_spec("d11", [E.DagJob("f", flaky, max_attempts=2)]))
    eng.run_until_idle(30)
    assert store.load("d11")["nodes"]["f"]["attempts"] == 2
    eng.shutdown()


def test_from_flow_spec_runs_real_pipeline(spark, sf_dir, tmp_path):
    """The bridge promotes a .pull-configured FlowSpec into the engine:
    the same jobconf compile path run_flow uses, now with retry/kill/
    resume semantics on top."""
    from gobblin_spark.plans import flow as FL

    pull = f"""
    job.name=EngineOrders
    source.class=table
    source.data.directory={sf_dir}
    source.table.name=orders
    converter.classes=pick_fields
    converter.fields.to.pick=o_orderkey,o_totalprice
    writer.builder.class=parquet
    data.publisher.final.dir={tmp_path}/out
    """
    fs = FL.FlowSpec(name="engine_flow",
                     jobs=[FL.FlowJob("ingest", pull)])
    eng = E.DagProcessingEngine()
    eng.launch(E.from_flow_spec(fs, spark))
    eng.run_until_idle(120)
    assert eng.dag_status("engine_flow") == "COMPLETE"
    out = spark.read.parquet(f"{tmp_path}/out")
    assert out.count() > 0 and set(out.columns) == {"o_orderkey", "o_totalprice"}
    eng.shutdown()
