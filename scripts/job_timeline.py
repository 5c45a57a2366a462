"""Per-query Spark job timeline: job walls + driver gaps between jobs.

Runs each named query once (after an sf0.001 codegen warm) in a
UI-enabled session, then reads /api/v1/.../jobs to print each job's
submission/completion and the GAP since the previous job finished —
gaps are driver-side work (planning, py4j, python planner rounds,
metadata IO), the part invisible to stage metrics.
Usage: python scripts/job_timeline.py <query> [query ...]
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from gobblin_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def parse_ts(s):
    return dt.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main():
    names = sys.argv[1:]
    from gobblin_spark.queries import HEADLINE, QUERIES, TELEMETRY_ONLY

    if not names:
        names = list(HEADLINE)
    spark = get_spark("job-timeline", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4058",
                                  "spark.ui.showConsoleProgress": "false"})
    base = (f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
            f"{spark.sparkContext.applicationId}")

    def jobs():
        with urllib.request.urlopen(f"{base}/jobs?status=succeeded",
                                    timeout=5) as r:
            return json.loads(r.read())

    for n in names:
        fn = QUERIES.get(n) or TELEMETRY_ONLY.get(n)
        try:
            fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite").format("noop").save()
        except Exception:
            pass
        seen = {j["jobId"] for j in jobs()}
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        fresh = sorted((j for j in jobs() if j["jobId"] not in seen),
                       key=lambda j: j["jobId"])
        print(f"== {n}: wall {wall:.3f}s, {len(fresh)} jobs")
        prev_end = None
        tot_job = tot_gap = 0.0
        for j in fresh:
            sub = parse_ts(j["submissionTime"])
            end = parse_ts(j["completionTime"])
            gap = (sub - prev_end) if prev_end is not None else 0.0
            tot_job += end - sub
            tot_gap += max(gap, 0.0)
            print(f"   job {j['jobId']:>4} {end-sub:7.3f}s"
                  f"  gap-before {gap:7.3f}s  stages={len(j['stageIds'])}"
                  f"  tasks={j['numTasks']}")
            prev_end = end
        print(f"   sum(job)={tot_job:.3f}s sum(gaps)={tot_gap:.3f}s"
              f"  pre/post+overhead={wall - tot_job - tot_gap:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
