"""Flow orchestration: multi-job flows as dependency DAGs — the
gobblin-service (GaaS) FlowSpec → Dag compile-and-execute path.

Reference mapping (all relative to /root/reference/):
- FlowSpec (gobblin-runtime/src/main/java/org/apache/gobblin/runtime/
  api/FlowSpec.java): a named flow holding job configs.
- Dag (gobblin-service/src/main/java/org/apache/gobblin/service/
  modules/flowgraph/Dag.java:48): generic DAG of JobExecutionPlans,
  parent/child links, start/end node queries.
- DagManager semantics: launch jobs whose dependencies finished,
  fail downstream jobs when a parent fails, flow-level status.
- JobTemplate (gobblin-runtime/.../api/JobTemplate.java): base
  config a job spec inherits, with required-attribute validation.

Spark-first design: each node runs a jobconf-compiled Pipeline (one
lazy Catalyst plan per job); the DAG layer is pure driver-side
sequencing. Independent ready jobs run in a thread pool — on one
SparkSession the FAIR-capable scheduler interleaves their stages, and
on a cluster each job's plan parallelizes across executors
independently, so flow-level concurrency costs nothing extra. State
between jobs travels through published datasets (a child reads the
parent's `data.publisher.final.dir`), exactly the reference's
dataset-handoff model.
"""

from __future__ import annotations

import threading
from collections.abc import Callable, Mapping, Sequence
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass, field as dc_field
from enum import Enum

from pyspark.sql import SparkSession

from gobblin_spark.plans import jobconf as J, pipeline as PL


class JobStatus(Enum):
    PENDING = "PENDING"
    RUNNING = "RUNNING"
    COMPLETE = "COMPLETE"
    FAILED = "FAILED"
    CANCELLED = "CANCELLED"  # an upstream dependency failed


@dataclass
class FlowJob:
    """One DAG node: a job config (inline .pull text, a path, or a
    pre-built Pipeline) plus its upstream dependencies."""

    name: str
    config: str | PL.Pipeline | Callable[[SparkSession], PL.PipelineResult]
    depends_on: Sequence[str] = ()
    template: str | None = None  # base .properties the config overlays


@dataclass
class FlowSpec:
    name: str
    jobs: Sequence[FlowJob]
    templates: Mapping[str, str] = dc_field(default_factory=dict)
    max_parallel: int = 4


@dataclass
class FlowResult:
    status: dict[str, JobStatus]
    results: dict[str, PL.PipelineResult]
    errors: dict[str, str]

    @property
    def succeeded(self) -> bool:
        return all(s is JobStatus.COMPLETE for s in self.status.values())


def apply_template(template_text: str, overlay_text: str) -> str:
    """JobTemplate.java semantics: the job spec overlays the template's
    defaults (later keys win). Implemented as concatenation — the
    properties parser takes the last assignment per key."""
    return template_text + "\n" + overlay_text


def _validate(spec: FlowSpec) -> dict[str, set[str]]:
    names = {j.name for j in spec.jobs}
    if len(names) != len(spec.jobs):
        raise ValueError("duplicate job names in flow")
    deps: dict[str, set[str]] = {}
    for j in spec.jobs:
        missing = set(j.depends_on) - names
        if missing:
            raise ValueError(f"job {j.name!r} depends on unknown jobs {sorted(missing)}")
        if j.template is not None and j.template not in spec.templates:
            # a spec error, caught at validation like unknown deps —
            # deferred, it KeyErrored inside the worker thread, marked
            # the job FAILED, and cancelled its downstreams as if a
            # real job had crashed (audit r12; JobTemplate.java
            # validates required attributes up front)
            raise ValueError(
                f"job {j.name!r} references unknown template "
                f"{j.template!r}")
        deps[j.name] = set(j.depends_on)
    # cycle check: Kahn's
    remaining = dict(deps)
    while remaining:
        ready = [n for n, d in remaining.items() if not d & set(remaining)]
        if not ready:
            raise ValueError(f"dependency cycle among {sorted(remaining)}")
        for n in ready:
            remaining.pop(n)
    return deps


def topological_order(spec: FlowSpec) -> list[str]:
    """Deterministic Kahn ordering (Dag.java start-node expansion)."""
    deps = _validate(spec)
    out: list[str] = []
    done: set[str] = set()
    while len(out) < len(deps):
        ready = sorted(n for n, d in deps.items() if n not in done and d <= done)
        out.extend(ready)
        done.update(ready)
    return out


def run_flow(spec: FlowSpec, spark: SparkSession) -> FlowResult:
    """Execute the DAG: a job launches when every dependency is
    COMPLETE; a failure CANCELLEDs all transitive downstreams and the
    rest of the flow still drains (DagManager failure semantics).
    Independent ready jobs run concurrently up to ``max_parallel``."""
    deps = _validate(spec)
    jobs = {j.name: j for j in spec.jobs}
    status = {n: JobStatus.PENDING for n in deps}
    results: dict[str, PL.PipelineResult] = {}
    errors: dict[str, str] = {}
    lock = threading.Lock()

    def run_one(name: str) -> None:
        job = jobs[name]
        cfg = job.config
        if callable(cfg) and not isinstance(cfg, PL.Pipeline):
            results[name] = cfg(spark)
        elif isinstance(cfg, PL.Pipeline):
            results[name] = PL.run(cfg, spark)
        else:
            text = cfg
            if job.template is not None:
                text = apply_template(spec.templates[job.template], text)
            results[name] = J.run_job(spark, text)

    def cancel_downstream(failed: str) -> None:
        changed = True
        while changed:
            changed = False
            for n, d in deps.items():
                if status[n] is JobStatus.PENDING and any(
                    status[p] in (JobStatus.FAILED, JobStatus.CANCELLED) for p in d
                ):
                    status[n] = JobStatus.CANCELLED
                    changed = True

    with ThreadPoolExecutor(max_workers=max(1, spec.max_parallel)) as pool:
        inflight: dict[Future, str] = {}
        while True:
            with lock:
                ready = [
                    n
                    for n, d in deps.items()
                    if status[n] is JobStatus.PENDING
                    and all(status[p] is JobStatus.COMPLETE for p in d)
                ]
                for n in ready:
                    status[n] = JobStatus.RUNNING
            for n in ready:
                inflight[pool.submit(run_one, n)] = n
            if not inflight:
                break
            finished, _ = wait(list(inflight), return_when=FIRST_COMPLETED)
            for fut in finished:
                n = inflight.pop(fut)
                with lock:
                    err = fut.exception()
                    if err is None:
                        status[n] = JobStatus.COMPLETE
                    else:
                        status[n] = JobStatus.FAILED
                        errors[n] = repr(err)
                        cancel_downstream(n)

    return FlowResult(status=status, results=results, errors=errors)
