"""Commit sequences: durable, replayable multi-step commits for
exactly-once publish semantics.

Reference mapping (all relative to /root/reference/):
- CommitSequence + CommitStep (gobblin-api/.../commit/CommitSequence.java,
  CommitStep.java): an ordered list of idempotent steps (rename dirs,
  commit watermarks, register tables) persisted BEFORE execution; a
  crash mid-sequence is recovered by re-executing the sequence — each
  step checks ``is_completed`` first, so replays are no-ops.
- CommitSequenceStore (gobblin-runtime/.../FsCommitSequenceStore.java):
  filesystem persistence of pending sequences, deleted on completion.
- SafeDatasetCommit builds one sequence per dataset when exactly-once
  delivery is enabled (gobblin-runtime/.../SafeDatasetCommit.java:67).

Execution model: the steps are driver-side METADATA operations (rename,
tiny JSON writes) — the data itself was already staged in a fully
parallel write. Exactly-once comes from idempotence + ordering, not
from distributed transactions: rename-to-final is atomic per dataset,
watermark-commit happens strictly after, and both are safe to replay.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from gobblin_spark.sinks import publish as P
from gobblin_spark.state import WatermarkStore


@dataclass
class Step:
    kind: str  # "publish" | "watermark" | "marker"
    params: dict
    done: bool = False


@dataclass
class Sequence:
    job_id: str
    steps: list[Step] = field(default_factory=list)


def publish_step(staging_dir: str, final_dir: str) -> Step:
    """Atomic dataset publish (idempotent: a vanished staging dir with a
    published final means the rename already happened)."""
    return Step("publish", {"staging_dir": staging_dir, "final_dir": final_dir})


def watermark_step(store_root: str, dataset: str, value_json: dict) -> Step:
    """Watermark commit AFTER publish (idempotent: skip if the current
    watermark already reached this value)."""
    return Step("watermark", {"root": store_root, "dataset": dataset,
                              "value": value_json})


def marker_step(path: str) -> Step:
    """Touch a completion marker file (idempotent by existence)."""
    return Step("marker", {"path": path})


class CommitSequenceStore:
    """FsCommitSequenceStore: persist → execute → delete. Pending
    sequences found at startup are crash leftovers — re-execute them."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, job_id: str) -> str:
        return os.path.join(self.root, f"seq-{job_id}.json")

    def persist(self, seq: Sequence) -> None:
        payload = {
            "job_id": seq.job_id,
            "steps": [{"kind": s.kind, "params": s.params, "done": s.done}
                      for s in seq.steps],
        }
        tmp = self._path(seq.job_id) + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._path(seq.job_id))

    def pending(self) -> list[Sequence]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if name.startswith("seq-") and name.endswith(".json"):
                rec = json.load(open(os.path.join(self.root, name)))
                out.append(Sequence(
                    rec["job_id"],
                    [Step(s["kind"], s["params"], s.get("done", False))
                     for s in rec["steps"]],
                ))
        return out

    def delete(self, job_id: str) -> None:
        try:
            os.remove(self._path(job_id))
        except FileNotFoundError:
            pass

    # -- step execution (each idempotent) -----------------------------
    def _run_step(self, step: Step) -> None:
        if step.kind == "publish":
            staged = P.StagedDataset(
                step.params["final_dir"], step.params["staging_dir"],
                step.params["final_dir"],
            )
            fs, src, _ = P._fs(self.spark, step.params["staging_dir"])
            if fs.exists(src):
                P.publish_staged(staged, self.spark)
            elif not P.is_published(self.spark, step.params["final_dir"]):
                raise IOError(
                    f"staging gone but final unpublished: {step.params}"
                )
            # else: already published on a previous attempt — no-op
        elif step.kind == "watermark":
            store = WatermarkStore(self.spark, step.params["root"])
            import datetime as _dt

            v = step.params["value"]
            value = (_dt.datetime.fromisoformat(v["value"])
                     if v.get("kind") == "timestamp" else v["value"])
            current = store.get(step.params["dataset"])
            if current is None or current < value:
                store.commit(step.params["dataset"], value)
            # else: already at/past this watermark — replay no-op
        elif step.kind == "marker":
            open(step.params["path"], "a").close()
        else:
            raise ValueError(f"unknown step kind {step.kind}")

    def execute(self, seq: Sequence) -> Sequence:
        """Run remaining steps in order, persisting progress after each
        (CommitSequence.execute). Completed sequences are deleted."""
        self.persist(seq)
        for step in seq.steps:
            if step.done:
                continue
            self._run_step(step)
            step.done = True
            self.persist(seq)
        self.delete(seq.job_id)
        return seq

    def recover(self) -> list[str]:
        """Re-execute every pending sequence (crash recovery at job
        start — AbstractJobLauncher's commit-sequence replay)."""
        done = []
        for seq in self.pending():
            self.execute(seq)
            done.append(seq.job_id)
        return done
