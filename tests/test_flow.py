"""Flow DAG: validation, topological order, template overlay,
multi-job execution with dataset handoff, and failure cancellation
(Dag.java / DagManager semantics)."""

import os

import pytest

from gobblin_spark.plans import flow as FL, jobconf as J


def test_validation_rejects_cycles_and_unknowns():
    with pytest.raises(ValueError, match="unknown"):
        FL._validate(FL.FlowSpec("f", [FL.FlowJob("a", "x", depends_on=["ghost"])]))
    with pytest.raises(ValueError, match="cycle"):
        FL._validate(
            FL.FlowSpec(
                "f",
                [
                    FL.FlowJob("a", "x", depends_on=["b"]),
                    FL.FlowJob("b", "x", depends_on=["a"]),
                ],
            )
        )


def test_validation_rejects_unknown_template():
    """audit r12: an unknown template name is a SPEC error and fails
    validation up front — deferred, it KeyErrored inside the worker,
    marked the job FAILED, and cancelled downstreams as if a real job
    had crashed."""
    with pytest.raises(ValueError, match="unknown template"):
        FL._validate(FL.FlowSpec(
            "f", [FL.FlowJob("a", "x", template="ghost")]))
    # a declared template still validates
    FL._validate(FL.FlowSpec(
        "f", [FL.FlowJob("a", "x", template="base")],
        templates={"base": "k=v"}))


def test_topological_order_deterministic():
    spec = FL.FlowSpec(
        "f",
        [
            FL.FlowJob("z", "x"),
            FL.FlowJob("m", "x", depends_on=["z"]),
            FL.FlowJob("a", "x"),
            FL.FlowJob("end", "x", depends_on=["m", "a"]),
        ],
    )
    assert FL.topological_order(spec) == ["a", "z", "m", "end"]


def test_template_overlay_last_key_wins():
    merged = J.parse_properties(
        FL.apply_template("a=1\nb=base\n", "b=override\nc=3\n")
    )
    assert merged == {"a": "1", "b": "override", "c": "3"}


TEMPLATE = """
source.class=table
source.data.directory=/root/testdata/sf0.001
job.commit.policy=full
"""


def test_run_flow_dataset_handoff(spark, tmp_path):
    """Job A publishes a filtered orders extract; job B (depends on A)
    reads A's published dir — the reference's dataset-handoff model."""
    a_out = str(tmp_path / "a_out")
    b_out = str(tmp_path / "b_out")
    job_a = f"""
    job.name=extract
    source.table.name=orders
    converter.classes=pick_fields
    converter.fields.to.pick=o_orderkey,o_totalprice,o_orderstatus
    data.publisher.final.dir={a_out}
    """
    job_b = f"""
    job.name=refine
    source.class=parquet
    source.filebased.data.directory={a_out}
    converter.classes=filter_equals
    converter.filter.field=o_orderstatus
    converter.filter.value=F
    data.publisher.final.dir={b_out}
    """
    spec = FL.FlowSpec(
        "orders_flow",
        [
            FL.FlowJob("extract", job_a, template="base"),
            FL.FlowJob("refine", job_b, depends_on=["extract"], template="base"),
        ],
        templates={"base": TEMPLATE},
    )
    res = FL.run_flow(spec, spark)
    assert res.succeeded, res.errors
    assert os.path.exists(os.path.join(b_out, "_SUCCESS"))
    total = spark.read.parquet(a_out).count()
    f_rows = spark.read.parquet(b_out).count()
    assert 0 < f_rows < total
    assert f_rows == spark.read.parquet(a_out).filter("o_orderstatus='F'").count()


def test_failure_cancels_downstream_but_flow_drains(spark, tmp_path):
    ok_out = str(tmp_path / "ok")
    ok_job = f"""
    job.name=ok
    source.table.name=region
    data.publisher.final.dir={ok_out}
    """
    bad_job = "job.name=bad\nsource.class=com.example.Missing\n"
    spec = FL.FlowSpec(
        "partial",
        [
            FL.FlowJob("bad", bad_job),
            FL.FlowJob("child_of_bad", ok_job, depends_on=["bad"]),
            FL.FlowJob("independent", ok_job, template="base"),
        ],
        templates={"base": TEMPLATE},
    )
    res = FL.run_flow(spec, spark)
    assert res.status["bad"] is FL.JobStatus.FAILED
    assert res.status["child_of_bad"] is FL.JobStatus.CANCELLED
    assert res.status["independent"] is FL.JobStatus.COMPLETE
    assert not res.succeeded and "bad" in res.errors


def test_parallel_independent_jobs(spark, tmp_path):
    jobs = []
    for t in ["region", "nation"]:
        jobs.append(
            FL.FlowJob(
                t,
                f"job.name={t}\nsource.table.name={t}\n"
                f"data.publisher.final.dir={tmp_path}/{t}\n",
                template="base",
            )
        )
    res = FL.run_flow(FL.FlowSpec("par", jobs, templates={"base": TEMPLATE}), spark)
    assert res.succeeded
    assert spark.read.parquet(f"{tmp_path}/region").count() == 5
    assert spark.read.parquet(f"{tmp_path}/nation").count() == 25
