"""Dump .explain("formatted") for headline queries to plans/<round>/.

Usage: python scripts/dump_plans.py <suffix> [name ...]
(round dir defaults to r14; override with $SPARK_GRAFT_PLANS_DIR)

Writes plans/<round>/<query>_<suffix>.txt for each query (default: every
HEADLINE entry). Runs at the bench SF (sf0.1) so the plans match what
bench.py executes. Queries with in-query fixture builds execute their
builds; only the RETURNED DataFrame's plan is recorded (that is the
timed noop-write plan minus the fixture side effects).
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, ".")

from gobblin_spark.session import PLAN_HEAVY_CONF, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "..", "plans", "r14"))


def main() -> int:
    from gobblin_spark.queries import HEADLINE, QUERIES

    suffix = sys.argv[1]
    names = sys.argv[2:] or list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    # same session conf as bench.py so dumped plans match the timed ones
    spark = get_spark("gobblin-plan-dump", extra_conf=PLAN_HEAVY_CONF)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = (df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        except Exception:
            plan = "PLAN FAILED\n" + traceback.format_exc()
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
