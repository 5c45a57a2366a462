"""Time individual queries with the bench methodology (noop sink,
warm-up at sf0.001, min-of-N at sf0.1). Usage:
    python scripts/time_query.py [-n RUNS] name [name ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gobblin_spark.queries import QUERIES, TELEMETRY_ONLY  # noqa: E402
from gobblin_spark.session import PLAN_HEAVY_CONF, get_spark  # noqa: E402


def main(argv):
    runs = 3
    if argv and argv[0] == "-n":
        runs = int(argv[1])
        argv = argv[2:]
    names = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("gobblin-spark-timeq", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "false", **PLAN_HEAVY_CONF})
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        fn = QUERIES.get(name) or TELEMETRY_ONLY[name]
        try:
            fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
        print(f"{name}: min={min(walls):.3f} runs="
              f"{[round(w, 3) for w in walls]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
