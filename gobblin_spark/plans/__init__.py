"""Pipeline spec layer: the declarative Constructs chain."""

from gobblin_spark.plans.pipeline import (
    Branch,
    Pipeline,
    PipelineResult,
    branch_frames,
    compose,
    run,
    run_streaming,
)

__all__ = [
    "Branch",
    "Pipeline",
    "PipelineResult",
    "branch_frames",
    "compose",
    "run",
    "run_streaming",
]
